"""As-of join semantics on a hand-built timeline (the sf-scale parity is
covered by tests/test_oracle_parity.py via the registered query's oracle)."""

from __future__ import annotations

import datetime as dt


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_picks_latest_at_or_before(spark):
    from parallel_mapreduce_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (2, _ts(5), 200)],
        "user_id long, ts timestamp, l_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 900), (1, _ts(15), 901), (2, _ts(6), 902)],
        "user_id long, ts timestamp, r_id long",
    )
    out = {
        r.l_id: (r.asof_r_id, r.asof_ts)
        for r in asof_join(
            left, right, on="user_id", ts="ts", right_payload=("r_id",)
        ).collect()
    }
    # Equal timestamps match (inclusive <=).
    assert out[100] == (900, _ts(10))
    # Latest preceding, not just any preceding.
    assert out[101] == (901, _ts(15))
    # No right row at-or-before -> nulls, left row still present.
    assert out[200] == (None, None)


def test_asof_join_left_rows_preserved(spark, sf_dir):
    from parallel_mapreduce_spark.operators.timeseries import (
        asof_purchase_attribution,
    )
    from parallel_mapreduce_spark.sources import load_table
    from pyspark.sql import functions as F

    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    rows = asof_purchase_attribution(spark, sf_dir).collect()
    assert len(rows) == n_purchases
    for r in rows:
        if r.gap_s is not None:
            assert r.gap_s >= 0
