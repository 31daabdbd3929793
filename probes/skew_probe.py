"""Skew-robustness probe for the salted join (round-6 item #7).

``salted_join`` (operators/skew.py) is value-verified by its oracle; this
probe measures the thing the oracle can't: the WALL-TIME benefit under
real key skew, so the scale-posture claim ("salting spreads a hot key
across salt partitions") is a number, not an assertion.

Workload: 5M synthetic events with 50% of all rows keyed to ONE hot
user (the bot-traffic shape) and hash-derived, incompressible per-row
content — REPLICATED rows are useless here: 50 copies of sf0.1 events
LZ4-compress so well in the shuffle blocks that every partition lands
under AQE's byte thresholds and byte-based skew detection can never
fire (measured: 5M replicated rows -> <100 KB per shuffle partition).
The dimension side is the distinct-user tier table (too big to be
trivially broadcast at real scale, so the probe disables autoBroadcast
to force the shuffle-join regime the mitigation exists for). Three
plans over identical inputs:

- plain:  shuffle join, AQE skew-split OFF — the hot key lands in one
          shuffle partition; its single task dominates the stage.
- salted: the explicit ``salted_join`` rewrite, AQE skew-split OFF — the
          hot key spreads over 8 salt buckets.
- aqe:    plain join with AQE skew-split ON, thresholds scaled to the
          probe volume — shows the runtime mitigation reaching the same
          place; the plan string is checked for the ``isSkew=true``
          marker.

Reported per plan: wall time (best of N) and the max/median task-duration
ratio of the join stage, read from the Spark UI REST API — max-task ratio
is the direct signature of a straggler.

Usage:  python probes/skew_probe.py
Writes probes/results/skew_probe.json; rerunnable.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_mapreduce_spark.operators.skew import salted_join
from parallel_mapreduce_spark.session import scoped_conf

DEST = "/tmp/pmr_skew_probe/events.parquet"
DIM_DEST = "/tmp/pmr_skew_probe/users.parquet"
N_ROWS = 5_000_000
N_USERS = 20_000
HOT_SHARE = 0.50
HOT_USER = 424242
RUNS = 3


def probe_spark() -> SparkSession:
    """Own session, NOT session.get_spark: the probe needs the Spark UI's
    REST API (get_spark disables the UI) to read per-task durations, and a
    straggler only shows if AQE cannot coalesce it away mid-probe."""
    return (
        SparkSession.builder.master("local[32]")
        .appName("skew_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def build_skewed_events(spark: SparkSession) -> None:
    if os.path.exists(DEST + "/_SUCCESS"):
        return
    # Hash-derived columns: deterministic (identical skew across the three
    # plans) yet incompressible, so shuffle-block bytes reflect row counts.
    rid = F.col("id")
    big = spark.range(0, N_ROWS, numPartitions=32).select(
        rid.alias("event_id"),
        F.when(
            F.pmod(F.xxhash64(rid), 100) < int(HOT_SHARE * 100),
            F.lit(HOT_USER),
        )
        .otherwise(F.pmod(F.xxhash64(rid, F.lit("u")), N_USERS))
        .alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("scroll")),
            (F.pmod(F.xxhash64(rid, F.lit("t")), 4) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64(rid, F.lit("v")), 1_000_000) / 1000.0).alias("value"),
    )
    big.write.mode("overwrite").parquet(DEST)
    # Materialize the dimension: a real per-user table on disk, and a join
    # child shaped scan->shuffle->sort — an aggregate BETWEEN the shuffle
    # and the join (e.g. an inline distinct) breaks the
    # SMJ(Sort(Shuffle),Sort(Shuffle)) pattern OptimizeSkewedJoin matches,
    # silently disabling AQE's skew split (observed in this probe's first
    # version).
    spark.read.parquet(DEST).select("user_id").distinct().withColumn(
        "tier",
        F.when(F.col("user_id") % 3 == 0, "gold")
        .when(F.col("user_id") % 3 == 1, "silver")
        .otherwise("bronze"),
    ).coalesce(4).write.mode("overwrite").parquet(DIM_DEST)


def agg(joined: DataFrame) -> DataFrame:
    return joined.groupBy("tier", "event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )


_SEEN_STAGES: set[int] = set()


def _task_ratio(spark: SparkSession) -> float | None:
    """max/median task duration over the heaviest stage NEWLY completed
    since the previous call, via the UI REST API — scoped per measured
    plan. Best-effort: None if the UI is unreachable (probe numbers then
    rest on wall time alone)."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.loads(r.read())
        fresh = [s for s in stages if s["stageId"] not in _SEEN_STAGES]
        _SEEN_STAGES.update(s["stageId"] for s in stages)
        worst = None
        # Worst max/median across the plan's multi-task stages: the
        # straggler stage is not always the heaviest by total run time.
        for stage in fresh:
            if stage.get("numCompleteTasks", 0) < 8:
                continue
            sid, att = stage["stageId"], stage["attemptId"]
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages/{sid}/{att}"
                "/taskSummary?quantiles=0.5,1.0",
                timeout=10,
            ) as r:
                q = json.loads(r.read())
            p50, mx = q["duration"]
            ratio = round(mx / max(p50, 1.0), 2)
            worst = ratio if worst is None else max(worst, ratio)
        return worst
    except Exception:
        return None


def measure(spark: SparkSession, label: str, make) -> dict:
    walls = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        make().write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    return {
        "plan": label,
        "wall_s": walls,
        "wall_best": min(walls),
        "max_over_median_task": _task_ratio(spark),
    }


def main() -> None:
    spark = probe_spark()
    build_skewed_events(spark)
    # Drain the stage counter: on a fresh box the build's shuffle/distinct
    # stages just completed, and the first measured plan's task-ratio scan
    # must not attribute them to the join (they'd dominate the 'plain'
    # straggler number with build-stage ratios).
    _task_ratio(spark)
    ev = spark.read.parquet(DEST).select("user_id", "event_type", "value")
    dim = spark.read.parquet(DIM_DEST)

    results = []
    correctness = {}
    # Force the shuffle-join regime: at real scale the dim side is not
    # broadcastable, which is exactly when salting matters.
    with scoped_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        with scoped_conf(spark, "spark.sql.adaptive.skewJoin.enabled", "false"):
            results.append(
                measure(spark, "plain", lambda: agg(ev.join(dim, "user_id")))
            )
            results.append(
                measure(
                    spark,
                    "salted",
                    lambda: agg(salted_join(ev, dim, on="user_id", salt=8)),
                )
            )
        # AQE skew-split on, with thresholds scaled to the probe's data
        # volume (the defaults — 256 MB skewed-partition floor — are sized
        # for real clusters and would never trigger on a 5M-row local
        # probe where the hot COMPRESSED shuffle partition is ~10 MB; at
        # 100 TB the defaults fire on their own).
        with scoped_conf(
            spark, "spark.sql.adaptive.skewJoin.enabled", "true"
        ), scoped_conf(
            spark,
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4m",
        ), scoped_conf(
            spark, "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m"
        ), scoped_conf(
            spark, "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0"
        ):
            results.append(
                measure(spark, "aqe", lambda: agg(ev.join(dim, "user_id")))
            )
            aqe_df = agg(ev.join(dim, "user_id"))
            # collect(), not a noop write: the write path builds its OWN
            # QueryExecution, leaving aqe_df's adaptive plan unfinalized —
            # the marker only appears in the EXECUTED adaptive plan.
            aqe_df.collect()
            plan_str = aqe_df._jdf.queryExecution().executedPlan().toString()
            results[-1]["plan_shows_skew_split"] = (
                "skew=true" in plan_str and "AQEShuffleRead skewed" in plan_str
            )

        # Result identity across the three plans (counts + checksum).
        def _sig(df):
            row = df.agg(
                F.sum("cnt").alias("n"), F.round(F.sum("sum_value"), 2).alias("v")
            ).collect()[0]
            return (row["n"], float(row["v"]))

        correctness = {
            "plain": _sig(agg(ev.join(dim, "user_id"))),
            "salted": _sig(agg(salted_join(ev, dim, on="user_id", salt=8))),
        }

    payload = {
        "rows": N_ROWS,
        "hot_share": HOT_SHARE,
        "runs_per_plan": RUNS,
        "load_1m_end": round(os.getloadavg()[0], 2),
        "plans": results,
        "identical_results": correctness["plain"] == correctness["salted"],
        "signatures": {k: list(v) for k, v in correctness.items()},
    }
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "skew_probe.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    for r in results:
        print(r, flush=True)
    print("identical_results:", payload["identical_results"])


if __name__ == "__main__":
    main()
