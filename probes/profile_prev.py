"""A/B pagerank_event_types: committed lazy chain vs persisted edge frame
+ per-iteration localCheckpoint of the |types|-row rank frame."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())
from pyspark.sql import functions as F, Window as W  # noqa: E402

from parallel_mapreduce_spark.session import get_spark, bounded_persist  # noqa: E402
from parallel_mapreduce_spark.operators.events import (  # noqa: E402
    PR_DAMPING,
    PR_ITERS,
    pagerank_event_types,
)
from parallel_mapreduce_spark.sources import load_table, register_views  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark("profile-prev")


def variant(spark, sf_dir):
    register_views(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = seq.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = bounded_persist(edges.join(F.broadcast(outw), "src"))
    nodes = bounded_persist(
        ev.select(F.col("event_type").alias("node")).distinct()
    )
    nn = nodes.agg(F.count("*").alias("n_nodes"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 8).alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            e.join(F.broadcast(pr.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(
                F.sum(F.col("pr") * F.col("w") / F.col("out_w")).alias(
                    "mass"
                )
            )
        )
        pr = (
            nodes.join(
                F.broadcast(contrib.withColumnRenamed("dst", "node")),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.round(
                    F.lit(1 - PR_DAMPING) / F.col("n_nodes")
                    + F.lit(PR_DAMPING)
                    * F.coalesce(F.col("mass"), F.lit(0.0)),
                    8,
                ).alias("pr"),
            )
        )
    return pr.select(
        "node", (F.round("pr", 6) + F.lit(0.0)).alias("pagerank")
    )


a = pagerank_event_types(spark, SF).toPandas().sort_values("node")
b = variant(spark, SF).toPandas().sort_values("node")
assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
print("EQUAL", flush=True)

for tag, fn in (
    ("committed", pagerank_event_types),
    ("variant", variant),
    ("committed2", pagerank_event_types),
    ("variant2", variant),
):
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{min(ts):7.3f}s  {tag}", flush=True)
