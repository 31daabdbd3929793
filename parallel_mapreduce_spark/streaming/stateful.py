"""Custom stateful streaming operator via applyInPandasWithState.

The reference's Reducer slot is "arbitrary user state per key" (SURVEY.md
P6/P7); the streaming twin of that contract is Structured Streaming's
arbitrary-stateful-processing API. This module keeps per-user running
aggregates (event count, value sum, last-seen epoch) in explicit GroupState —
the plumbing a production pipeline uses for sessionization, rate limiting, or
online feature aggregation.

Scale shape: state is keyed by user_id (hash-partitioned across executors by
the streaming state store), each key's state is O(1), and every micro-batch
touches only the keys present in it. Arrow batches cross the Python boundary,
never single rows.

Batch-checkable contract: with a one-shot availableNow run over the events
file, each user emits exactly one final row whose totals equal the batch
``groupBy(user_id).agg(count, sum)`` — asserted in tests/test_streaming.py and
exposed as the rows-only query ``stream_user_totals``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.session import apply_runtime_conf
from parallel_mapreduce_spark.streaming.events_stream import EVENTS_SCHEMA

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen_epoch bigint"
STATE_SCHEMA = "n bigint, total double, last_epoch bigint"


def update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch of one user's events into the running state and
    emit the updated snapshot (update-mode semantics)."""
    n, total, last_epoch = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # ts arrives as nanos-since-epoch int64 (see EVENTS_SCHEMA).
        last_epoch = max(last_epoch, int(pdf["ts"].max() // 1_000_000_000))
    state.update((n, total, last_epoch))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_seen_epoch": [last_epoch],
        }
    )


def user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running totals with explicit GroupState."""
    apply_runtime_conf(spark)
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .select("user_id", "ts", "value")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RUN_SEQ = 0


@query("stream_user_totals")
def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot (availableNow) run of the stateful stream into a memory sink;
    the returned frame is each user's final totals. Rows-only check — the
    streaming state machinery has no SQL twin — but the values equal the
    batch aggregate, which tests/test_streaming.py asserts."""
    global _RUN_SEQ
    _RUN_SEQ += 1
    name = f"stream_user_totals_{_RUN_SEQ}"
    q = (
        user_totals_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # With a single micro-batch each user emits exactly one snapshot; the
    # round trip through a sorted select keeps the output deterministic.
    return spark.table(name).orderBy("user_id")
