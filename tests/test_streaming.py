"""Streaming twin must agree with the oracle-checked batch plan."""

from __future__ import annotations


def test_streaming_hourly_matches_batch(spark, sf_dir):
    from parallel_mapreduce_spark.operators.events import events_hourly
    from parallel_mapreduce_spark.streaming import run_hourly_stream_to_memory

    batch = {
        (r.hour_epoch, r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in events_hourly(spark, sf_dir).collect()
    }
    streamed = {
        (r.hour_epoch, r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in run_hourly_stream_to_memory(spark, sf_dir, "t_hourly").collect()
    }
    assert streamed == batch


def test_stream_is_streaming_df(spark, sf_dir):
    from parallel_mapreduce_spark.streaming import hourly_events_stream

    df = hourly_events_stream(spark, sf_dir)
    assert df.isStreaming
