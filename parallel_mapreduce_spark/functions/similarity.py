"""Similarity search over the `embeddings` table (array<float> vectors).

LLM-pipeline operator mandated by the north star (SURVEY.md §2.3). Two paths:

- ``cosine_topk``: brute-force cosine top-k for a small query set — the
  correctness baseline, fully oracle-checked against DuckDB. The query side is
  broadcast, so the candidate side streams with no shuffle; all vector math is
  JVM-side higher-order functions (zip_with/aggregate), no Python UDFs.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH buckets, cosine
  ranked only within a bucket. At 1000 executors this turns the O(Q x N)
  cross-product into O(Q x N / 2^planes) with one shuffle on bucket id.
  Rows-only check; recall vs brute force asserted in tests/test_similarity.py.

Ranking determinism across engines: scores are rounded to 6 decimals before
rank (sum-order float noise is ~1e-15), ties broken by candidate id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views

N_QUERY_VECS = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 8


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --------------------------------------------------------------------------
# Brute-force cosine top-k (oracle-checked baseline).
# --------------------------------------------------------------------------
@query(
    "cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}
    ), c AS (
      SELECT vec_id AS c_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings
    ), s AS (
      SELECT q_id, c_id,
             ROUND(list_cosine_similarity(qv, cv), 6) AS sim6
      FROM q CROSS JOIN c WHERE q_id <> c_id
    )
    SELECT q_id, c_id, ROUND(sim6, 4) AS cosine
    FROM (SELECT q_id, c_id, sim6,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY sim6 DESC, c_id) AS rk
          FROM s)
    WHERE rk <= {TOP_K}
    """,
    headline=True,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    # Norms are computed ONCE per vector (narrow pass), not per pair — at N
    # candidates x Q queries that's the difference between O(N+Q) and O(NQ)
    # norm work. The candidate side is repartitioned: a small parquet file
    # scans as one split, and the per-pair dot products are the CPU-heavy
    # part worth spreading across all cores.
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"),
        as_double("embedding").alias("qv"),
        l2_norm(as_double("embedding")).alias("qn"),
    )
    c = emb.repartition(n_parts).select(
        F.col("vec_id").alias("c_id"),
        as_double("embedding").alias("cv"),
        l2_norm(as_double("embedding")).alias("cn"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim6"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim6").desc(), F.col("c_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", F.round("sim6", 4).alias("cosine"))
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN (scale path, rows-only).
# Deterministic pseudo-random hyperplanes: plane p, dim i ->
# ((i * 1103515245 + p * 12345 + 12345) mod 2048) / 1024 - 1  in [-1, 1).
# --------------------------------------------------------------------------
def _plane(p: int, dim: int) -> list[float]:
    return [((i * 1103515245 + p * 12345 + 12345) % 2048) / 1024.0 - 1.0 for i in range(dim)]


def lsh_bucket(vec: Column, dim: int) -> Column:
    """Bucket id = concatenated sign bits of dot(vec, plane_p), p < N_PLANES."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(v) for v in _plane(p, dim)])
        bit = F.when(dot(vec, plane) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


@query("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per query vector among candidates sharing its LSH bucket."""
    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    vecs = emb.select(
        "vec_id",
        as_double("embedding").alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), dim))
    q = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = vecs.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "bucket")
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim6")
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim6").desc(), F.col("c_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", F.round("sim6", 4).alias("cosine"))
    )


# --------------------------------------------------------------------------
# Per-label embedding stats (oracle-checked vector math sanity).
# --------------------------------------------------------------------------
@query(
    "embedding_stats",
    oracle="""
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(l2_norm(as_double(F.col("embedding")))), 4).alias("avg_norm"),
    )
