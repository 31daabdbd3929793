"""Sources: the engine's scan layer.

The reference's only source is "text files, one map task per file" (reference
``src/main.c:11``, wave scheduler ``src/mapreduce.c:181-212``). Here the scan
layer is Spark's: columnar Parquet with predicate pushdown + column pruning
(checked in tests via the physical plan), plus ``spark.read.text`` for the
raw-line surface the reference consumed. Spark's task scheduler replaces the
reference's thread-wave logic (SURVEY.md P1).

At 100 TB the same code holds: Parquet scans split by row-group, filters and
projections reach the reader, and AQE sizes post-shuffle partitions — none of
that is hand-scheduled here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_mapreduce_spark.session import apply_runtime_conf, session_key

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# session_key(spark) + sf_dir pairs whose views are already registered.
_REGISTERED: set[tuple[int, str, str]] = set()

# Scan plans are immutable once built, so they are shared across queries in
# a session: spark.read.parquet lists files and reads footers eagerly at
# plan-build time, and repeating that per query dominated plan construction
# (~60% of driver-side build for multi-table joins). The cache holds the
# unresolved plan only — no data, ~10 entries/session. (Files are
# snapshotted at first read; the test tables are static.)
_SCANS: dict[tuple[int, str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one test table (schema comes from the Parquet footer).

    `events.ts` is Parquet TIMESTAMP(NANOS), which Spark 4 refuses outright;
    we read nanos as int64 (legacy conf, set in apply_runtime_conf) and
    convert to TimestampType (microseconds) in the scan layer. Integer `div`
    keeps full precision — float division would lose it at ns-epoch scale.
    """
    apply_runtime_conf(spark)
    key = (*session_key(spark), sf_dir.rstrip("/"), name)
    cached = _SCANS.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _SCANS[key] = df
    return df


# Deferred cache cleanup: a query whose contract requires a SQL cache to
# outlive its own function call (cached_table_reuse — the driver executes
# the returned plan later, and cache substitution happens at action-plan
# time) registers its cached view name here; the NEXT query's
# register_views() drops it. That bounds columnar-cache residency to one
# registry slot instead of the remainder of a 300-query run, without
# needing a cleanup hook in the external driver. Dropping early is safe:
# an uncached plan falls back to the ordinary scan, it never breaks.
PENDING_UNCACHE: set[str] = set()


def _drain_pending_uncache(spark: SparkSession) -> None:
    for view in list(PENDING_UNCACHE):
        try:
            spark.catalog.uncacheTable(view)
        except Exception:
            pass  # already dropped, or the view no longer exists
        PENDING_UNCACHE.discard(view)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view named by its file stem.

    Idempotent per (session, sf_dir); re-registering for a different sf_dir
    repoints the views. Also pins the runtime conf (UTC session timezone)
    that the oracle comparison depends on.
    """
    apply_runtime_conf(spark)
    _drain_pending_uncache(spark)
    skey = session_key(spark)
    key = (*skey, sf_dir)
    if key in _REGISTERED:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    # Any previously registered sf_dir for this session is now stale.
    _REGISTERED.difference_update({k for k in _REGISTERED if k[:2] == skey})
    _REGISTERED.add(key)


def read_csv(
    spark: SparkSession, paths: list[str] | str, schema: str | None = None
) -> DataFrame:
    """CSV scan. An explicit schema string skips the inference pass (which
    reads the data twice) — at 100 TB always pass one."""
    apply_runtime_conf(spark)
    reader = spark.read.option("header", "true")
    reader = reader.schema(schema) if schema else reader.option("inferSchema", "true")
    return reader.csv(paths)


def read_json(
    spark: SparkSession, paths: list[str] | str, schema: str | None = None
) -> DataFrame:
    """JSON-lines scan; same explicit-schema rule as read_csv."""
    apply_runtime_conf(spark)
    reader = spark.read
    reader = reader.schema(schema) if schema else reader
    return reader.json(paths)


# Gate for executor-pinned (localCheckpoint) materialization of
# corpus-derived intermediates, in ON-DISK source-table bytes. Below it a
# multi-consumer frame is cheap to pin on executors; above it the frame is
# corpus-scale, where executor-pinned blocks are storage pressure plus a
# fault cliff (a lost executor kills the job instead of recomputing), so
# the cut goes through the reliable checkpoint directory instead. NOTE the
# in-memory expansion multiple: decompressed row data runs ~4-8x the
# parquet bytes, so 192 MiB on disk is of order 1 GiB pinned.
def _local_cut_max_bytes() -> int:
    import os

    return int(
        os.environ.get("SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES", str(192 << 20))
    )


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of one source table (single file or directory of part
    files). Unknown (non-local path, listing error) => huge, so size gates
    fail toward the durable / shuffle plan, never toward pinning."""
    import os

    p = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
            )
        return os.path.getsize(p)
    except OSError:
        return 1 << 62


def corpus_cut(df: DataFrame, sf_dir: str, table: str = "documents") -> DataFrame:
    """Materialize a corpus-derived frame ONCE for its multiple consumers
    (guide §5: cache/cut when a frame is reused and recompute is expensive)
    with the lineage-cut flavor picked by corpus size:

    - below the gate: ``localCheckpoint`` — no parquet round-trip, blocks
      pinned on executors (tiny here by the gate's definition; a lost
      executor merely fails a re-runnable query);
    - above it: reliable ``checkpoint`` — one write+read instead of N
      recomputes of a corpus-scale chain, recoverable on executor loss,
      and no corpus-scale block pinned in executor storage.

    Values are identical either way; only materialization strategy moves.
    """
    if table_bytes(sf_dir, table) <= _local_cut_max_bytes():
        # Lazy: consumers share ONE RDD, so upstream shuffle stages dedup
        # by shuffle id inside the first action (no per-consumer replans)
        # and the blocks cache for everything after — without the eager
        # form's extra sequential materialization job per cut.
        return df.localCheckpoint(eager=False)
    from parallel_mapreduce_spark.session import ensure_checkpoint_dir

    ensure_checkpoint_dir(df.sparkSession)
    return df.checkpoint(eager=True)


_SINK_ROOT: str | None = None


def sink_dir(kind: str) -> str:
    """Deterministic per-process scratch directory for sink round-trip
    queries (csv/json/partitioned/bucketed/stream snapshots).

    One mkdtemp root per process — no cross-process collisions — with one
    subdirectory per sink kind REUSED across invocations: every writer here
    runs in overwrite mode, so bench's adaptive best-of-N overwrites one
    copy in place instead of accumulating dozens of full table copies. The
    whole root is removed at interpreter exit."""
    global _SINK_ROOT
    if _SINK_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _SINK_ROOT = tempfile.mkdtemp(prefix="pmr_sinks_")
        atexit.register(shutil.rmtree, _SINK_ROOT, ignore_errors=True)
    import os

    path = os.path.join(_SINK_ROOT, kind)
    os.makedirs(path, exist_ok=True)
    return path


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Sink: write a result as parquet/csv/json, optionally hive-partitioned.

    Partitioning by a low-cardinality column gives downstream readers
    partition pruning for free; at 100 TB that plus parquet row-group stats
    is the difference between a full scan and a pruned one.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Sink a table bucketed + sorted by `key` (hash(key) % buckets files per
    partition, rows sorted within each bucket file).

    This is the co-located-join primitive: two tables bucketed by the same
    key with the same bucket count join with NO exchange and NO sort — the
    scan itself provides the distribution Spark's sort-merge join needs. At
    100 TB, bucketing the fact tables on their join key once at ingest
    removes the dominant shuffle from every subsequent join
    (tests/test_sources.py pins the exchange-free plan).
    """
    (
        df.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def read_text_lines(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """The reference's source surface: text files as one `value: string` column.

    Multi-file union semantics (SURVEY.md D7): all paths feed one keyspace,
    exactly like the reference's argv loop (``src/mapreduce.c:186-208``) but
    scheduled by Spark with one partition per file split.
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(paths)
