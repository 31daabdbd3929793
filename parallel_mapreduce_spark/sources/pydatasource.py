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


class SynthPushdownReader(SynthReader):
    """Filter-pushdown-capable variant (``pushFilters``, Spark 4.1): range
    predicates on ``row_id`` narrow the generated id range BEFORE partition
    planning (the Python-source analogue of parquet row-group pruning —
    pruned partitions are never scheduled), and ``bucket = k`` equality is
    applied inside the generator. Handled filters are applied EXACTLY
    (integer range arithmetic, modulo equality) and therefore consumed;
    anything else is returned as residual for Spark to evaluate post-scan.
    """

    def __init__(self, options: dict):
        super().__init__(options)
        self.lo = 0
        self.hi = self.n
        self.bucket: int | None = None
        self.pushed: list[str] = []  # repr of consumed filters (test hook)

    def pushFilters(self, filters):  # noqa: N802 (API name)
        # Eager, not a generator: the lo/hi/bucket narrowing must be
        # complete before partitions() runs, regardless of when (or
        # whether) the engine drains the residual iterable.
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        residual = []
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("row_id",) and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif col == ("row_id",) and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif col == ("row_id",) and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif col == ("row_id",) and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif col == ("bucket",) and isinstance(f, EqualTo):
                self.bucket = int(f.value)
            else:
                residual.append(f)  # unsupported: Spark re-evaluates it
                continue
            self.pushed.append(repr(f))
        return residual

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        step = max(1, -(-(hi - lo) // self.parts))
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            b = i % SYNTH_BUCKETS
            if self.bucket is not None and b != self.bucket:
                continue
            yield (i, b, (i * SYNTH_A + SYNTH_C) % SYNTH_M)


class SynthPushdownDataSource(DataSource):
    """``spark.read.format("pmr_synth_pd")`` — same LCG stream, with
    reader-side filter pushdown."""

    @classmethod
    def name(cls) -> str:
        return "pmr_synth_pd"

    def schema(self) -> str:
        return "row_id bigint, bucket int, value bigint"

    def reader(self, schema) -> DataSourceReader:
        return SynthPushdownReader(self.options)


_REGISTERED: set[tuple[int, str]] = set()


def register_synth_source(spark: SparkSession) -> None:
    from parallel_mapreduce_spark.session import session_key

    key = session_key(spark)
    if key in _REGISTERED:
        return
    _REGISTERED.add(key)
    spark.dataSource.register(SynthDataSource)
    spark.dataSource.register(SynthPushdownDataSource)


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


PD_LO = 20_000  # row_id range pushed into the reader (partition pruning)
PD_HI = 60_000
PD_BUCKET = 5  # bucket equality pushed into the generator


@query(
    "python_datasource_pushdown_scan",
    oracle=f"""
    SELECT CAST((i * {SYNTH_A} + {SYNTH_C}) % {SYNTH_M} % 3 AS BIGINT)
             AS value_mod3,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM((i * {SYNTH_A} + {SYNTH_C}) % {SYNTH_M}) AS BIGINT)
             AS sum_value,
           CAST(MIN(i) AS BIGINT) AS min_row,
           CAST(MAX(i) AS BIGINT) AS max_row
    FROM range(0, {SYNTH_ROWS}) t(i)
    WHERE i >= {PD_LO} AND i < {PD_HI} AND i % {SYNTH_BUCKETS} = {PD_BUCKET}
      AND (i * {SYNTH_A} + {SYNTH_C}) % {SYNTH_M} % 7 <> 0
    GROUP BY 1
    """,
)
def python_datasource_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan over the pushdown-capable Python source: the row_id
    range and bucket equality are consumed by the reader (pushFilters),
    so only rows {PD_LO}..{PD_HI} of bucket {PD_BUCKET} are ever GENERATED
    — partition pruning inside a user source, the behavior a queue/API/
    proprietary-format reader needs at 100 TB. The value%7 predicate is
    deliberately non-pushable (arithmetic on a generated column) and rides
    as Spark's residual filter; the oracle recomputes everything from the
    closed form, so over- OR under-pushing either filter class fails the
    value check. Reader-level semantics (residual set, narrowed partition
    ranges, bucket skip) are unit-pinned in tests/test_sources.py."""
    from parallel_mapreduce_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    register_synth_source(spark)
    df = (
        spark.read.format("pmr_synth_pd")
        .option("rows", SYNTH_ROWS)
        .option("partitions", SYNTH_PARTS)
        .load()
        .filter(
            (F.col("row_id") >= PD_LO)
            & (F.col("row_id") < PD_HI)
            & (F.col("bucket") == PD_BUCKET)
            & (F.col("value") % 7 != 0)
        )
    )
    return df.groupBy((F.col("value") % 3).alias("value_mod3")).agg(
        F.count("*").alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.min("row_id").alias("min_row"),
        F.max("row_id").alias("max_row"),
    )
