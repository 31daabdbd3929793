"""Python extension slots: scalar pandas_udf + grouped applyInPandas.

The reference's entire API is user-function slots (Mapper/Reducer/Partitioner,
``src/mapreduce.h:11-14``). The DataFrame engine's equivalents are:

- scalar ``@pandas_udf``: vectorized per-row transform (Arrow batches, not
  row-at-a-time) — the Mapper slot for record-wise logic;
- ``applyInPandas`` over a groupBy: the Reducer slot — the user function sees
  one group's rows exactly like the reference's Reducer sees one key's value
  iterator (``src/mapreduce.c:215-238``).

Both queries here compute something ALSO expressible with built-ins, on
purpose: the DuckDB oracle (and the built-in twin it encodes) proves the
Python slot produces bit-identical results. Production guidance stands: use
built-ins when they exist (docstring of each query names the built-in twin);
these slots are for logic Spark genuinely lacks.

Scale posture: pandas_udf/applyInPandas move Arrow record batches across the
Python boundary (~10-100x the throughput of row pickling); applyInPandas
shuffles once on the group key and holds ONE group per invocation in memory —
fine for per-language groups, would need salting for a pathological mega-group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views


def _vowel_ratio_kernel(text: pd.Series) -> pd.Series:
    """Vectorized scalar slot: vowels / characters (built-in twin: a
    regexp_count/length expression)."""
    n_vowels = text.str.count("[aeiou]")
    n_chars = text.str.len()
    return (n_vowels / n_chars.where(n_chars > 0)).astype("float64")


def vowel_ratio_udf():
    # Built lazily: pandas_udf parses its DDL return type against the active
    # session, so decorating at import time would require a SparkContext
    # before any session exists.
    return pandas_udf(_vowel_ratio_kernel, "double")


@query(
    "pandas_udf_vowel_ratio",
    oracle="""
    SELECT doc_id,
           ROUND(len(regexp_extract_all(text, '[aeiou]')) * 1.0
                 / NULLIF(strlen(text), 0), 4) AS vratio
    FROM documents
    """,
)
def pandas_udf_vowel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(vowel_ratio_udf()(F.col("text")), 4).alias("vratio")
    )


ZSCORE_SCHEMA = "doc_id bigint, lang string, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reducer-slot kernel: one language's docs arrive as one DataFrame."""
    mu = pdf["n_chars"].mean()
    sd = pdf["n_chars"].std(ddof=1)  # sample stddev = Spark stddev_samp
    z = (pdf["n_chars"] - mu) / sd if sd and sd > 0 else pdf["n_chars"] * 0.0
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "zscore": z.round(4)}
    )


@query(
    "pandas_grouped_zscore",
    oracle="""
    SELECT doc_id, lang,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                 / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4) AS zscore
    FROM documents
    """,
)
def pandas_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via the grouped-UDAF slot.

    Built-in twin (what production code should use, and what the oracle
    encodes): AVG/STDDEV window over lang. The Python detour exists to pin
    the applyInPandas contract against an exact oracle.
    """
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(_zscore_group, schema=ZSCORE_SCHEMA)
