"""Skew mitigation: salted equi-join.

The reference's analogue of key skew is its per-partition mutex: every mapper
emitting a hot key serializes on one lock (``src/mapreduce.c:122-124``), and a
hot reduce partition runs on one thread (``src/mapreduce.c:259-285``). In
Spark the first line of defense is AQE's skew-join splitting (enabled in
session.py); salting is the explicit fallback for when one side must be
replicated — e.g. a shuffle join where a handful of keys dominate and the
other side is small enough to replicate but too large (or too dynamic) to
broadcast outright.

Mechanics: the skewed (big) side scatters each row to one of ``salt`` salt
buckets; the small side is replicated into ALL ``salt`` buckets (explode over
``sequence(0, salt-1)``); the join key becomes (key, salt_bucket). A hot key's
rows now land in ``salt`` different shuffle partitions instead of one. The
scatter uses ``rand()`` — any bucket is correct, so non-determinism is safe —
and costs a ``salt``-fold replication of the small side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table, register_views

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` (skewed) with `small` (replicable), spreading each hot
    key across `salt` shuffle partitions. Result equals ``big.join(small, on,
    how)`` for row-preserving join types (inner/left)."""
    big_salted = big.withColumn(
        "_salt", F.floor(F.rand(seed=0) * salt).cast("int")
    )
    small_salted = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt - 1).cast("int"))),
    )
    return big_salted.join(small_salted, [on, "_salt"], how).drop("_salt")


# --------------------------------------------------------------------------
# Oracle-checked instance: events (user_id is the potential hot key — one
# bot-like user can dominate an event stream) joined to a per-user dimension
# through the salted path. The oracle is the PLAIN join: the query proves the
# salted rewrite is result-identical.
# --------------------------------------------------------------------------
@query(
    "salted_join_user_tiers",
    oracle="""
    WITH tiers AS (
      SELECT user_id, CASE WHEN user_id % 3 = 0 THEN 'gold'
                           WHEN user_id % 3 = 1 THEN 'silver'
                           ELSE 'bronze' END AS tier
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT tier, event_type, COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sum_value
    FROM events JOIN tiers USING (user_id)
    GROUP BY tier, event_type
    """,
)
def salted_join_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    tiers = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "tier",
            F.when(F.col("user_id") % 3 == 0, "gold")
            .when(F.col("user_id") % 3 == 1, "silver")
            .otherwise("bronze"),
        )
    )
    joined = salted_join(ev, tiers, on="user_id", salt=DEFAULT_SALT)
    return joined.groupBy("tier", "event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )


# --------------------------------------------------------------------------
# Join-key skew census: the diagnostic that decides WHICH mitigation a
# join needs (plain shuffle vs broadcast vs salting vs AQE skew-split).
# One hash aggregate produces the per-key counts; the distribution stats
# reduce that keyspace-sized frame to a single row. percentile() uses the
# standard linear-interpolation definition — identical to DuckDB's
# quantile_cont — so the quantiles are value-checkable, unlike the
# approx_percentile sketch. At 100 TB the per-key count frame is |keys|
# rows (already the shuffle the candidate join would pay); the census adds
# one tiny reduction on top.
# --------------------------------------------------------------------------
@query(
    "join_key_skew_census",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_key_share,
           ROUND(AVG(cnt), 4) AS mean_cnt,
           ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
           ROUND(quantile_cont(cnt, 0.9), 4) AS p90_cnt,
           ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           ROUND(quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5), 4)
             AS p99_over_p50
    FROM c
    """,
)
def join_key_skew_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    pct = lambda p: F.percentile(F.col("cnt"), F.lit(p))  # noqa: E731
    return c.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_key_share"),
        F.round(F.avg("cnt"), 4).alias("mean_cnt"),
        F.round(pct(0.5), 4).alias("p50_cnt"),
        F.round(pct(0.9), 4).alias("p90_cnt"),
        F.round(pct(0.99), 4).alias("p99_cnt"),
        F.round(pct(0.99) / pct(0.5), 4).alias("p99_over_p50"),
    )
