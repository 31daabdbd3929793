from parallel_mapreduce_spark.streaming.events_stream import (  # noqa: F401
    hourly_events_stream,
    run_hourly_stream_to_memory,
    segment_share_stream,
)

__all__ = [
    "hourly_events_stream",
    "run_hourly_stream_to_memory",
    "segment_share_stream",
]
