"""operators/rank.global_row_number: exact global ROW_NUMBER, hierarchically.

Pins the contract the vocab/zipf rank queries (and any future global-rank
caller) rely on: the hierarchical value is IDENTICAL to the naive
unpartitioned window for every total order, including under heavy key skew
and descending/mixed sort directions, and the physical plan never contains
a single-partition exchange.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parallel_mapreduce_spark.operators.rank import global_row_number


def _naive(df, order):
    return df.withColumn("rank", F.row_number().over(W.orderBy(*order)))


def _assert_matches_naive(df, order):
    got = {
        r["k"]: r["rank"]
        for r in global_row_number(df, order, out="rank").collect()
    }
    want = {r["k"]: r["rank"] for r in _naive(df, order).collect()}
    assert got == want


def test_matches_naive_window_unique_keys(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 37 % 101).alias("v")
    )
    _assert_matches_naive(df, [F.asc("v"), F.asc("k")])


def test_matches_naive_window_desc_and_skew(spark):
    # 90% of rows share one v value (vocab-count-style skew): range
    # partitioning splits the tied run by volume across shards, and the
    # unique tie-breaker k keeps the rank total.
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("v"),
    )
    _assert_matches_naive(df, [F.desc("v"), F.asc("k")])


def test_rank_is_dense_one_based(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    ranks = sorted(
        r["rank"]
        for r in global_row_number(df, [F.asc("k")], out="rank").collect()
    )
    assert ranks == list(range(1, 101))


def test_plan_has_no_single_partition_exchange(spark):
    import contextlib
    import io

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    ranked = global_row_number(df, [F.asc("k")], out="rank")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ranked.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning(k" in plan


def test_property_matches_naive_on_random_frames(spark):
    """Property sweep without per-example Spark jobs being too slow: a few
    seeded random frames with duplicate-heavy keys and mixed directions."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = rng.randint(50, 300)
        rows = [
            (i, rng.randint(0, 5), rng.choice("abc"))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "k long, v long, s string")
        order = [F.desc("v"), F.asc("s"), F.asc("k")]
        _assert_matches_naive(df, order)


def test_prefix_sum_matches_naive_window(spark):
    from parallel_mapreduce_spark.operators.rank import global_prefix_sum

    df = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") * 31 % 17).alias("v"),
        ((F.col("id") * 7) % 23 + 1).alias("w"),
    )
    order = [F.asc("v"), F.asc("k")]
    got = {
        r["k"]: r["cum"]
        for r in global_prefix_sum(df, order, "w", out="cum").collect()
    }
    w_naive = W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(w_naive)).collect()
    }
    assert got == want
    # Inclusive running sum: the global maximum equals the total weight.
    assert max(got.values()) == df.agg(F.sum("w")).collect()[0][0]
