"""Single-session interleaved A/B for pagerank_event_types: the committed
lazy form (edges/nodes re-derived from the events scan per iteration) vs a
variant that materializes the bounded corpus-derived frames once (edges+outw,
nodes) with an eager localCheckpoint before the iteration loop. Equality
asserted before timing."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from parallel_mapreduce_spark.operators import events as EV  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402
from parallel_mapreduce_spark.sources.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-pr-events")
spark.sparkContext.setLogLevel("ERROR")


def variant_cut(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = seq.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(F.broadcast(outw), "src").localCheckpoint(eager=True)
    nodes = (
        ev.select(F.col("event_type").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nn = nodes.agg(F.count("*").alias("n_nodes"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 8).alias("pr")
    )
    for _ in range(EV.PR_ITERS):
        contrib = (
            e.join(F.broadcast(pr.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("out_w")).alias("mass"))
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
                    F.lit(1 - EV.PR_DAMPING) / F.col("n_nodes")
                    + F.lit(EV.PR_DAMPING)
                    * F.coalesce(F.col("mass"), F.lit(0.0)),
                    8,
                ).alias("pr"),
            )
        )
    return pr.select("node", (F.round("pr", 6) + F.lit(0.0)).alias("pagerank"))


old_df = EV.pagerank_event_types(spark, SF)
new_df = variant_cut(spark, SF)
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
assert a == 0 and b == 0, (a, b)
print("equality OK", flush=True)


def run(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for fn in (EV.pagerank_event_types, variant_cut):
    run(fn)  # warm

res = {}
for rep in range(6):
    for tag, fn in (("old", EV.pagerank_event_types), ("new", variant_cut)):
        res.setdefault(tag, []).append(run(fn))
for k, v in sorted(res.items()):
    print(f"{k}  min={min(v):.3f}  " + " ".join(f"{x:.3f}" for x in v), flush=True)
