"""Pin the session boundary rule on an explicit gap == SESSION_GAP_S
fixture (the generated testdata never exercises it).

Measured on Spark 4.1: the native ``session_window`` operator MERGES an
event arriving exactly SESSION_GAP_S after the previous one (merge
condition is ``ts <= session end``), which is the same convention as the
lag-based ``events_sessionize`` (``gap > SESSION_GAP_S`` splits). Both
queries' oracles therefore use ``>``; this test exists so a future change
in the native operator's boundary rule shows up as a test failure instead
of a silent oracle drift.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from parallel_mapreduce_spark.operators.events import SESSION_GAP_S

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _fixture(spark):
    rows = [
        (1, 1, T0),
        (1, 2, T0 + dt.timedelta(seconds=SESSION_GAP_S)),  # exactly the gap
        (1, 3, T0 + dt.timedelta(seconds=SESSION_GAP_S + 10)),
        (2, 4, T0),
        (2, 5, T0 + dt.timedelta(seconds=SESSION_GAP_S - 1)),  # just under
        (2, 6, T0 + dt.timedelta(seconds=2 * SESSION_GAP_S)),  # just over
    ]
    return spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")


def _native_sessions(ev):
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w")
        )
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )


def _lag_sessions(ev):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    is_new = F.when(
        F.lag(sec).over(w).isNull() | ((sec - F.lag(sec).over(w)) > SESSION_GAP_S),
        1,
    ).otherwise(0)
    return (
        ev.withColumn(
            "sid",
            F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id")
        .agg(F.countDistinct("sid").alias("n_sessions"))
    )


def test_native_and_lag_conventions_agree_on_exact_gap(spark):
    ev = _fixture(spark)
    native = {r.user_id: r.n_sessions for r in _native_sessions(ev).collect()}
    lag = {r.user_id: r.n_sessions for r in _lag_sessions(ev).collect()}
    # user 1: the exact-gap event MERGES under both conventions -> 1 session.
    # user 2: under-gap merges, over-gap splits -> 2 sessions.
    assert native == {1: 1, 2: 2}
    assert lag == {1: 1, 2: 2}


def test_clamped_balance_recursion_semantics(spark, sf_dir):
    """Pin the recursive clamp semantics on handcrafted ledgers (the
    sf-scaled oracle can't isolate them): the floor is applied at EVERY
    step, so a drawdown below zero is forgiven, which no window/prefix
    sum can express.
    - u1: +10, -15, +5  -> balances 10, 0, 5 (plain running sum: 0).
    - u2: -5, +3        -> balances 0, 3   (plain running sum: -2).
    Restores the real events view afterwards (register_views caches per
    session+sf_dir, so it would NOT re-register on the next call)."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.operators.events import _BALANCE_SQL
    from parallel_mapreduce_spark.sources import load_table

    rows = [
        (1, "2024-01-01", "view", 10.0),
        (1, "2024-01-02", "purchase", 15.0),
        (1, "2024-01-03", "view", 5.0),
        (2, "2024-01-01", "purchase", 5.0),
        (2, "2024-01-02", "view", 3.0),
    ]
    fake = spark.createDataFrame(
        rows, "user_id bigint, day string, event_type string, value double"
    ).select("user_id", F.col("day").cast("timestamp").alias("ts"),
             "event_type", "value")
    try:
        fake.createOrReplaceTempView("events")
        got = {r["user_id"]: r for r in spark.sql(_BALANCE_SQL).collect()}
        assert got[1]["final_bal_cents"] == 500
        assert got[1]["peak_bal_cents"] == 1000
        assert got[1]["n_floored_days"] == 1
        assert got[1]["n_days"] == 3
        assert got[2]["final_bal_cents"] == 300
        assert got[2]["n_floored_days"] == 1
    finally:
        load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
