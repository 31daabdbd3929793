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
