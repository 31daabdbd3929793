"""End-to-end training-data cleaning pipeline (the capstone composition).

Chains the engine's LLM-pipeline operators the way a real corpus-prep job
does — quality gate -> exact dedup -> near-dup clustering with keep-one —
and stays fully oracle-checked: every stage has an exact SQL twin, so the
composed pipeline does too (recursive CTE for the clustering fixpoint).

Stage order matters and is part of the contract: the quality gate runs first
(cheapest, narrow), exact dedup second (one shuffle on the content digest), near-dup
clustering last over the smallest surviving set (the expensive inverted-index
join). At 100 TB this ordering is the difference between shingling the whole
corpus and shingling what survives the cheap gates.

Shuffle census for the whole pipeline: 1 (exact dedup groupBy) + 1 (survivor
join) + 2 (shingle index join + pair agg) + O(diameter) label-propagation
rounds over the pair graph (orders of magnitude smaller than the corpus) +
1 (keep-one anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_mapreduce_spark.functions.dedup import (
    JACCARD_THRESHOLD,
    connected_components,
    jaccard_pairs,
    shingles3,
)
from parallel_mapreduce_spark.functions.portable import phash60_sql
from parallel_mapreduce_spark.functions.text import quality_expr, tokens
from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views

PIPELINE_QUALITY_MIN = 0.5

# SQL fragments kept in lockstep with the Spark expressions.
_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOP = "['the', 'a', 'of', 'and']"
_QUALITY = (
    "0.6 * least(len(toks) / 100.0, 1.0) "
    f"+ 0.4 * (1.0 - len(list_filter(toks, x -> list_contains({_STOP}, x)))"
    " * 1.0 / len(toks))"
)
_SHINGLES = (
    "list_distinct(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
)


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents),
    q AS (SELECT * FROM t WHERE {_QUALITY} >= {PIPELINE_QUALITY_MIN}),
    keep_e AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
    s AS (SELECT q.* FROM q JOIN keep_e USING (doc_id)),
    sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s
           FROM s WHERE len(toks) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT doc_a, doc_b FROM cand
      JOIN sz sa ON doc_a = sa.doc_id
      JOIN sz sb ON doc_b = sb.doc_id
      WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM jp
      UNION ALL SELECT doc_b, doc_a FROM jp
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    clus AS (SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id),
    dropped AS (SELECT doc_id FROM clus WHERE cluster_id <> doc_id)
    SELECT s.doc_id, s.lang, CAST(len(s.toks) AS BIGINT) AS n_tokens
    FROM s LEFT JOIN dropped d USING (doc_id)
    WHERE d.doc_id IS NULL
    """,
    headline=True,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept documents (doc_id, lang, n_tokens) after the full cleaning chain."""
    from parallel_mapreduce_spark.session import ensure_checkpoint_dir

    register_views(spark, sf_dir)
    ensure_checkpoint_dir(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # Stage 0: tokenize once; every later stage reuses the array column.
    t = docs.repartition(n_parts, "doc_id").select(
        "doc_id", "lang", "text", tokens("text").alias("toks")
    )
    # Stage 1: quality gate (narrow).
    q = t.filter(quality_expr(F.col("toks")) >= PIPELINE_QUALITY_MIN)
    # Stage 2: exact dedup — smallest doc_id survives per identical text.
    # Keyed by the md5+length content digest, not the text itself, so the
    # dedup shuffle moves ~24 bytes/doc instead of the corpus (same shape as
    # functions/dedup.py:_digest_groups).
    keep_e = q.groupBy(
        F.md5("text").alias("_k"), F.length("text").alias("_l")
    ).agg(F.min("doc_id").alias("doc_id"))
    # Survivors feed TWO consumers — the shingle index and the final
    # keep-one join — and the clustering loop's edge checkpoint would
    # otherwise re-derive the gate+dedup chain a third time. One reliable
    # checkpoint materializes them once (measured 4.2s -> 2.6s warm at
    # sf0.1); at cluster scale this is the standard write-once-intermediate
    # for a multi-consumer stage, and it doubles as the recovery point for
    # the iterative phase that follows.
    s = q.join(keep_e.select("doc_id"), "doc_id").checkpoint(eager=True)
    # Stage 3: near-dup clustering over survivors; keep cluster representatives.
    shingled = s.select("doc_id", shingles3(F.col("toks")).alias("sh"))
    pairs = jaccard_pairs(shingled).select("doc_a", "doc_b")
    dropped = (
        connected_components(pairs)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    kept = s.join(dropped, "doc_id", "left_anti")
    return kept.select(
        "doc_id", "lang", F.size("toks").cast("long").alias("n_tokens")
    )


MIX_Q = 0.4  # keep docs at or above their language's 40th score percentile
MIX_DENOM2 = 1_000_000
PACK_CAP = 512


# --------------------------------------------------------------------------
# Second capstone composition — the TRAINING-MIX pipeline: quality score ->
# per-language percentile gate -> uniform domain rebalance -> contiguous
# pack assignment. Where pipeline_clean_corpus is the dedup chain, this is
# the curation/mixing chain a pretraining run feeds from. Stage economics:
# the score is a narrow map; the percentile gate is one GROUP-sized
# aggregate broadcast back; the rebalance thresholds are integer-exact and
# content-hash Bernoulli (deterministic under retries/partitioning); the
# packer windows per LANGUAGE (never a global order). One corpus scan, two
# tiny broadcast joins, one window shuffle.
# --------------------------------------------------------------------------
@query(
    "pipeline_training_mix",
    headline=True,
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
             {_QUALITY} AS score
      FROM t WHERE len(toks) > 0
    ), thr AS (
      SELECT lang, quantile_cont(score, {MIX_Q}) AS q FROM scored GROUP BY lang
    ), gated AS (
      SELECT doc_id, scored.lang, n_tokens
      FROM scored JOIN thr ON scored.lang = thr.lang
      WHERE score >= q
    ), c AS (SELECT lang, COUNT(*) AS cnt FROM gated GROUP BY lang),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_src FROM c),
    rates AS (
      SELECT lang,
             LEAST({MIX_DENOM2},
                   (total * {MIX_DENOM2}) // (n_src * cnt)) AS keep_thr
      FROM c, tot
    ), sampled AS (
      SELECT doc_id, gated.lang, n_tokens
      FROM gated JOIN rates ON gated.lang = rates.lang
      WHERE {phash60_sql("'mix2:' || doc_id::VARCHAR")} % {MIX_DENOM2} < keep_thr
    )
    SELECT doc_id, lang, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {PACK_CAP} AS pack_id
    FROM sampled
    """,
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_tokens, pack_id) of the curated, rebalanced,
    packed training mix."""
    from pyspark.sql import Window as W

    from parallel_mapreduce_spark.functions.portable import phash60

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    t = docs.repartition(n_parts, "doc_id").select(
        "doc_id", "lang", tokens("text").alias("toks")
    )
    scored = t.filter(F.size("toks") > 0).select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_tokens"),
        quality_expr(F.col("toks")).alias("score"),
    )
    thr = scored.groupBy("lang").agg(
        F.percentile("score", F.lit(MIX_Q)).alias("q")
    )
    gated = (
        scored.join(F.broadcast(thr), "lang")
        .filter(F.col("score") >= F.col("q"))
        .select("doc_id", "lang", "n_tokens")
    )
    c = gated.groupBy("lang").agg(F.count("*").alias("cnt"))
    tot = c.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_src"),
    )
    rates = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(MIX_DENOM2).cast("long"),
            F.expr(f"(total * {MIX_DENOM2}) div (n_src * cnt)"),
        ).alias("keep_thr"),
    )
    bucket = phash60(
        F.concat(F.lit("mix2:"), F.col("doc_id").cast("string"))
    ) % MIX_DENOM2
    sampled = (
        gated.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("keep_thr"))
        .select("doc_id", "lang", "n_tokens")
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return sampled.select(
        "doc_id",
        "lang",
        "n_tokens",
        (before / F.lit(PACK_CAP)).cast("long").alias("pack_id"),
    )
