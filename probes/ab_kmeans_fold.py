"""Single-session interleaved A/B: kmeans_lloyd_2iter's second-iteration
aggregation folded into ONE pass. The committed form derives `sizes`
(count per cid) and `c2` (avg per cid,pos) from two separate consumers of
the a2 assignment and joins them back; since every vector contributes
exactly one row per pos to the posexploded frame, count per (cid, pos)
IS the cluster size, so both aggregates can come out of the single
(cid, pos) aggregation — one corpus pass and one shuffle fewer, no join.
Equality asserted before timing."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parallel_mapreduce_spark.functions import similarity as sim
from parallel_mapreduce_spark.functions.similarity import (
    _kmeans_assign,
    _kmeans_cents_row,
    as_double,
)
from parallel_mapreduce_spark.session import get_spark
from parallel_mapreduce_spark.sources import load_table, register_views

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-kmeans")
spark.sparkContext.setLogLevel("ERROR")


def folded(spark, sf_dir):
    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    vecs = emb.repartition(n_parts, "vec_id").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    init = (
        emb.orderBy("vec_id")
        .limit(sim.KMEANS_K)
        .select("vec_id", as_double(F.col("embedding")).alias("c"))
        .withColumn("cid", F.row_number().over(W.orderBy("vec_id")) - 1)
    )
    cents0 = init.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cid"), F.col("c")))).alias(
            "cents"
        )
    )
    a1 = _kmeans_assign(vecs, cents0)
    c1_long = (
        a1.select("cid", F.posexplode("e").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
    )
    a2 = _kmeans_assign(vecs, _kmeans_cents_row(c1_long))
    return (
        a2.select("cid", F.posexplode("e").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(
            (F.round(F.avg("val"), 4) + F.lit(0.0)).alias("center"),
            F.count("*").alias("n"),
        )
        .select("cid", "pos", "center", "n")
    )


old_df = sim.kmeans_lloyd_2iter(spark, SF)
new_df = folded(spark, SF)
assert old_df.schema == new_df.schema, (old_df.schema, new_df.schema)
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
assert a == 0 and b == 0, (a, b)
print("equality OK (rows + schema)", flush=True)


def run(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for fn in (sim.kmeans_lloyd_2iter, folded):
    run(fn)

res = {}
for rep in range(6):
    for tag, fn in (("old", sim.kmeans_lloyd_2iter), ("new", folded)):
        res.setdefault(tag, []).append(run(fn))
for tag, v in sorted(res.items()):
    print(
        f"kmeans_lloyd_2iter {tag}  min={min(v):.3f}  "
        + " ".join(f"{x:.3f}" for x in v),
        flush=True,
    )
