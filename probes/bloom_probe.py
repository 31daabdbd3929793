"""Runtime bloom-filter join-pruning probe (round 6).

The session enables Spark's runtime bloom filter
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, session.py) with the
production thresholds (10 MB creation side / 10 GB application side) —
inert on test data, active at 100 TB. tests/test_plans.py pins that the
rewrite ENGAGES under lowered thresholds; this probe measures what the
plan pin can't: the wall-time and shuffle-volume effect at a scale where
the filter has something to prune.

Workload: 10M-row incompressible synthetic fact, 200k-key dimension
filtered to ~0.5% of keys on a NON-key attribute (the selective-dim
star-join shape; a key-expressible filter would be statically propagated
to the fact scan and needs no runtime filter — see DIM_ATTR_MAX note). Broadcast
is disabled to force the shuffle-join regime (at real scale the UNfiltered
dim is not broadcastable and the optimizer cannot know the filter's
selectivity up front): without the bloom filter every fact row crosses the
exchange and dies in the join; with it, the filtered dim builds a bloom
filter that `might_contain`-prunes the fact side BEFORE its shuffle write.

Reported per plan: wall time (best of N), per-run shuffle-write bytes
(UI REST API, drained per plan so warmup/inspection stages are never
attributed to a measured plan), the executed-plan `might_contain`
marker, and the result signature — the two plans' signatures must be
identical.

Usage:  python probes/bloom_probe.py
Writes probes/results/bloom_probe.json; rerunnable.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_mapreduce_spark.session import scoped_conf

FACT = "/tmp/pmr_bloom_probe/fact.parquet"
DIM = "/tmp/pmr_bloom_probe/dim.parquet"
N_ROWS = 10_000_000
N_KEYS = 200_000
DIM_ATTR_MAX = 5  # dim filter: attr < 5 keeps ~0.5% of keys. The filter
# MUST be on a non-key column: a key-expressible predicate (a first probe
# version used key % 199 = 0) is propagated to the fact scan by Catalyst's
# join-constraint inference and prunes everything at plan time — no
# runtime filter needed or built. Only a key-opaque predicate creates the
# selectivity the optimizer cannot see statically.
RUNS = 3


def probe_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("bloom_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .getOrCreate()
    )


def build(spark: SparkSession) -> None:
    if os.path.exists(FACT + "/_SUCCESS") and os.path.exists(DIM + "/_SUCCESS"):
        return
    rid = F.col("id")
    # Hash-derived values: incompressible, so shuffle bytes track row counts.
    spark.range(0, N_ROWS, numPartitions=32).select(
        F.pmod(F.xxhash64(rid), N_KEYS).alias("key"),
        (F.pmod(F.xxhash64(rid, F.lit("v")), 1_000_000) / 1000.0).alias("value"),
    ).write.mode("overwrite").parquet(FACT)
    spark.range(0, N_KEYS).select(
        F.col("id").alias("key"),
        F.pmod(F.xxhash64("id", F.lit("a")), 1000).alias("attr"),
    ).coalesce(4).write.mode("overwrite").parquet(DIM)


def the_join(spark: SparkSession) -> DataFrame:
    fact = spark.read.parquet(FACT)
    dim = spark.read.parquet(DIM).filter(F.col("attr") < DIM_ATTR_MAX)
    return (
        fact.join(dim, "key")
        .groupBy("attr")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )


_SEEN_STAGES: set[int] = set()


def _shuffle_bytes(spark: SparkSession) -> int | None:
    """Total shuffle-write bytes of stages newly completed since the last
    call — the volume the bloom filter exists to cut. Best-effort."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.loads(r.read())
        fresh = [s for s in stages if s["stageId"] not in _SEEN_STAGES]
        _SEEN_STAGES.update(s["stageId"] for s in stages)
        return sum(s.get("shuffleWriteBytes", 0) for s in fresh)
    except Exception:
        return None


def measure(spark: SparkSession, label: str) -> dict:
    # Order matters: the plan-inspection collect() runs FIRST (it also
    # serves as the warm run) and its stages are drained from the
    # shuffle-byte counter BEFORE the timed runs — a first version
    # collected AFTER draining, leaking one full execution's shuffle into
    # the NEXT plan's number (the committed round-6 bloom figure read
    # -66% when the true cut is far larger).
    df = the_join(spark)
    sig = df.agg(
        F.sum("n").alias("n"), F.round(F.sum("v"), 2).alias("v")
    ).collect()[0]
    df.collect()  # finalize THIS DataFrame's adaptive plan for inspection
    plan = df._jdf.queryExecution().executedPlan().toString()
    _shuffle_bytes(spark)  # drain warmup/inspection stages, discard
    walls = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        the_join(spark).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    total = _shuffle_bytes(spark)
    return {
        "plan": label,
        "wall_s": walls,
        "wall_best": min(walls),
        "shuffle_write_bytes_per_run": (
            total // RUNS if total is not None else None
        ),
        "plan_shows_might_contain": "might_contain" in plan,
        "signature": [sig["n"], float(sig["v"])],
    }


def main() -> None:
    spark = probe_spark()
    build(spark)
    results = []
    with scoped_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        with scoped_conf(
            spark, "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        ):
            results.append(measure(spark, "no_bloom"))
        # Thresholds scaled to the probe (production gates are sized for
        # clusters: the 10GB applicationSideScanSizeThreshold alone keeps
        # the filter off for a 160MB local fact — same recipe as
        # tests/test_plans.py::test_runtime_bloom_filter_prunes_fact_side).
        with scoped_conf(
            spark,
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100GB",
        ), scoped_conf(
            spark,
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            "0",
        ):
            results.append(measure(spark, "bloom"))

    # Result identity: each plan's signature was computed under ITS confs
    # inside measure(); the comparison is the point (a runtime filter that
    # dropped or duplicated fact rows must fail here).
    payload = {
        "fact_rows": N_ROWS,
        "dim_keys": N_KEYS,
        "dim_filter_attr_max": DIM_ATTR_MAX,
        "runs_per_plan": RUNS,
        "load_1m_end": round(os.getloadavg()[0], 2),
        "plans": results,
        "identical_results": results[0]["signature"] == results[1]["signature"],
    }
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "bloom_probe.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    for r in results:
        print(r, flush=True)


if __name__ == "__main__":
    main()
