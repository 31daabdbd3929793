"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 is registered here as a named query —
a callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with the
ANSI-SQL oracle string DuckDB runs on the same Parquet tables. The driver's
correctness gate (``__spark_entry__.py``) is generated from this registry.

Rules enforced by convention (and by tests/test_oracle_parity.py):
- every computed column is aliased identically in the Spark plan and the SQL;
- float aggregates are rounded (ROUND(x, 4)) on BOTH sides so engine-order
  summation differences can't flip the value hash;
- counts are BIGINT on both sides (DuckDB's SUM(int)->HUGEINT is always cast);
- timestamps cross the comparison as epoch seconds or formatted strings,
  never raw timestamp objects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> driver does a rows-only check
    headline: bool = False  # included in bench.py's per-round benchmark


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


# The external verification driver value-checks the first ~50 entries of
# ``queries()`` per round (round 1's CORRECTNESS file covers exactly the
# first 50 registered names). This list front-loads the queries that do not
# yet have a driver correctness row — round 1's unchecked tail (relational/
# TPC-H analogues, windows, set ops, time-series, skew, streaming) plus the
# queries added since — so each round's checked window lands on fresh
# surface. Names not listed follow in registration order, so the full map
# always contains every query regardless of this list's contents.
#
# ROUND-3 WINDOW: r01+r02 rows cover 100 names; this list is the first
# 50 of the then-unrowed queries (registration order) — the round-2
# additions: text-analysis tail, fuzzy/triangles, training-mix pipeline,
# UDTF/Arrow slots, embedding analytics + SQ ANN, the trainprep family,
# events funnel/retention/SCD2/transitions/anomalies, sketch twins, ALL-form
# set ops, pricing analytics, CDC/merge, winsorize. Every OTHER unrowed
# query — the round-2 tail (18 queries: quality features, PMI, k-NN, PCA,
# pack stats, debounce/top-k/ECDF, percent_rank, Pareto, HHI, forward
# as-of...), the 14 round-2 leftovers (q2/q11/q21 shapes, round-trips,
# bucketed join, streaming registrations), and everything added in round 3
# (k-means, PageRank, recursive CTE, stream left-outer join, trainprep/
# analytics batch, ORC/pruning, grouped-agg UDAF) — is placed immediately
# after this window by the self-maintaining unrowed-first block in
# ``_ordered_names``, in registration order, and forms the round-4+
# windows without further edits to this list.
DRIVER_PRIORITY: list[str] = [
    # text-analysis tail
    "zipf_slope",
    "source_token_kl",
    "corpus_column_profile",
    "doc_length_outliers",
    "shingle_novelty",
    "source_vocab_overlap",
    # fuzzy matching + graph
    "fuzzy_name_pairs",
    "name_graph_triangles",
    # capstone pipeline (round-2)
    "pipeline_training_mix",
    # Python-surface slots
    "udtf_split_sentences",
    "arrow_doc_lengths",
    # embedding analytics + quantized ANN
    "source_centroids",
    "source_embedding_dispersion",
    "ann_sq_topk",
    "embedding_dim_stats",
    # training-prep family
    "repetition_bigram_ratio",
    "seq_pack_contiguous",
    "contamination_shingle_overlap",
    "pii_redact",
    "vocab_min_count",
    "embedding_quantize",
    "domain_rebalance",
    "unigram_logprob_score",
    "boilerplate_shingle_coverage",
    "incremental_dedup_ingest",
    "train_shard_manifest",
    "tokens_to_ids",
    "decontam_exact_substring",
    "chunk_documents",
    "write_partitioned_by_lang",
    # event analytics (funnel/retention/SCD2/transitions)
    "events_session_funnel",
    "events_scd2_intervals",
    "events_hourly_merge_incremental",
    "events_type_transitions",
    "events_weekly_retention",
    "events_hourly_anomalies",
    "events_dow_hod_profile",
    "events_funnel_steps",
    # sketches (rows-only by design) + ALL-form set ops
    "approx_distinct_parts",
    "set_intersect_all",
    "set_except_all",
    "price_percentiles_approx",
    # relational/pricing tail
    "right_join_order_returns",
    "unpivot_pricing_metrics",
    "price_qty_correlation",
    "price_decile_distribution",
    "monthly_revenue_growth",
    "user_erasure_audit",
    "winsorize_order_prices",
    "orders_merge_upsert",
]


def _driver_rowed_names() -> set[str]:
    """Query names with a recorded driver correctness row in ANY prior
    round (union of CORRECTNESS_r*.json at the repo root). Missing or
    unreadable files contribute nothing — a fresh checkout still orders
    deterministically."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rowed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rowed |= set(json.load(fh))
        except (OSError, ValueError):
            continue
    return rowed


def _ordered_names() -> list[str]:
    """DRIVER_PRIORITY first (the explicit window for this round's check),
    then — self-maintaining rotation — every query with NO driver row from
    any prior round, then the already-rowed tail; registration order within
    each block. If the driver ever checks more than the priority window,
    the extra slots land on fresh surface automatically."""
    _load_all()
    pri = [n for n in DRIVER_PRIORITY if n in QUERIES]
    listed = set(pri)
    rowed = _driver_rowed_names()
    rest = [n for n in QUERIES if n not in listed]
    return (
        pri
        + [n for n in rest if n not in rowed]
        + [n for n in rest if n in rowed]
    )


def query_map() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_map() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle
    }


def headline_names() -> list[str]:
    _load_all()
    return [name for name, spec in QUERIES.items() if spec.headline]


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import parallel_mapreduce_spark.functions.dedup  # noqa: F401
    import parallel_mapreduce_spark.functions.multimodal  # noqa: F401
    import parallel_mapreduce_spark.functions.pipeline  # noqa: F401
    import parallel_mapreduce_spark.functions.python_slots  # noqa: F401
    import parallel_mapreduce_spark.functions.similarity  # noqa: F401
    import parallel_mapreduce_spark.functions.text  # noqa: F401
    import parallel_mapreduce_spark.functions.trainprep  # noqa: F401
    import parallel_mapreduce_spark.mr  # noqa: F401
    import parallel_mapreduce_spark.operators.events  # noqa: F401
    import parallel_mapreduce_spark.operators.relational  # noqa: F401
    import parallel_mapreduce_spark.operators.skew  # noqa: F401
    import parallel_mapreduce_spark.operators.tpch_gaps  # noqa: F401
    import parallel_mapreduce_spark.operators.timeseries  # noqa: F401
    import parallel_mapreduce_spark.sources.roundtrip  # noqa: F401
    import parallel_mapreduce_spark.streaming.dedup_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.events_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.joins_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.stateful  # noqa: F401

    _LOADED = True
