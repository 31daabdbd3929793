"""Spark 4 Python DataSource API: a custom partitioned source in pure Python.

The reference's only source is a pthread file scan (src/mapreduce.c:214-257:
one thread per file region). Spark 4's `pyspark.sql.datasource` API is the
modern extension point for the same idea — a user-defined source that
declares its schema and its PARTITIONS, and the engine schedules one task
per partition. This module registers a deterministic synthetic generator
(`pmr_synth`) proving the full surface: schema declaration, option plumbing,
partition planning, and per-partition iteration, with the row content a
closed-form function of the row id so DuckDB can recompute it exactly —
a full value oracle for a source that has no file behind it.

Scale posture: the source yields per-partition iterators (no driver-side
materialization); partition count is an option, so a real implementation
(reading a queue, an API, a proprietary format) splits the same way a
parquet scan does. Arithmetic stays in range: row_id < 2^49 keeps
row_id * 1103515245 under 2^63.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from parallel_mapreduce_spark.registry import query

SYNTH_ROWS = 100_000
SYNTH_PARTS = 8
SYNTH_BUCKETS = 16
SYNTH_A = 1103515245
SYNTH_C = 12345
SYNTH_M = 1_000_003


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", SYNTH_ROWS))
        self.parts = int(options.get("partitions", SYNTH_PARTS))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.parts))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, i % SYNTH_BUCKETS, (i * SYNTH_A + SYNTH_C) % SYNTH_M)


class SynthDataSource(DataSource):
    """``spark.read.format("pmr_synth")`` — deterministic LCG row stream."""

    @classmethod
    def name(cls) -> str:
        return "pmr_synth"

    def schema(self) -> str:
        return "row_id bigint, bucket int, value bigint"

    def reader(self, schema) -> DataSourceReader:
        return SynthReader(self.options)


_REGISTERED: set[tuple[int, str]] = set()


def register_synth_source(spark: SparkSession) -> None:
    from parallel_mapreduce_spark.session import session_key

    key = session_key(spark)
    if key in _REGISTERED:
        return
    _REGISTERED.add(key)
    spark.dataSource.register(SynthDataSource)


@query(
    "python_datasource_scan",
    oracle=f"""
    SELECT CAST(i % {SYNTH_BUCKETS} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM((i * {SYNTH_A} + {SYNTH_C}) % {SYNTH_M}) AS BIGINT)
             AS sum_value,
           CAST(MAX((i * {SYNTH_A} + {SYNTH_C}) % {SYNTH_M}) AS BIGINT)
             AS max_value
    FROM range(0, {SYNTH_ROWS}) t(i)
    GROUP BY 1
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python source: proves the partition-planned
    scan end to end (sf_dir unused — the source is synthetic by design)."""
    from parallel_mapreduce_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    register_synth_source(spark)
    df = (
        spark.read.format("pmr_synth")
        .option("rows", SYNTH_ROWS)
        .option("partitions", SYNTH_PARTS)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
