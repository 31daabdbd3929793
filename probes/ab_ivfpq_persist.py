"""Single-session interleaved A/B: bounded_persist on _ivfpq_ranked's
`assigned` frame (coarse assignment + residual). The chain above it (db
scan -> coarse argmin crossJoin -> residual zip_with) feeds the init
codebook, the Lloyd-refined codebook AND the final `codes` encoding; the
two codebook rows are already persisted, but each of the three still
recomputes `assigned`/`dbsub` from the scan. Variant toggled by a module
flag added for the probe via monkeypatch-free re-implementation: we call
the committed function for OLD and a copy with the persist for NEW.
Equality asserted before timing."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from parallel_mapreduce_spark.functions import similarity as sim
from parallel_mapreduce_spark.session import bounded_persist, get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-ivfpq")
spark.sparkContext.setLogLevel("ERROR")

# NEW: identical to similarity._ivfpq_ranked except bounded_persist on
# `assigned`. Implemented by temporarily swapping a hook the probe adds:
# simplest faithful copy is to run the committed code with a patched
# DataFrame.select on the assigned projection — too fragile; instead we
# exploit that _ivfpq_ranked takes `vecs` and rebuild the body here by
# importing its module-level helpers.
from parallel_mapreduce_spark.functions.similarity import (  # noqa: E402
    IVFPQ_NPROBE,
    N_QUERY_VECS,
    PQ_K,
    PQ_M,
    PQ_RANK_SALT,
    PQ_SUBDIM,
    PQ_TOPK,
    W,
    _ivfpq_assign,
    _ivfpq_cb_row,
    _ivfpq_cell_dists,
    _ivfpq_coarse_row,
    as_double,
)
from parallel_mapreduce_spark.sources import load_table, register_views  # noqa: E402


def ranked_persisted(spark, sf_dir, topk=PQ_TOPK):
    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("e"))
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    coarse_row = _ivfpq_coarse_row(vecs)
    db = vecs.filter(F.col("vec_id") >= N_QUERY_VECS).repartition(
        n_parts, "vec_id"
    )
    assigned = db.crossJoin(F.broadcast(coarse_row)).select(
        "vec_id",
        F.array_min(_ivfpq_cell_dists(F.col("e"))).alias("w"),
        "e",
    ).select(
        "vec_id",
        F.col("w.ccid").alias("ccid"),
        F.zip_with("e", "w.c", lambda a, b: a - b).alias("e_res"),
    )
    assigned = bounded_persist(assigned)  # <- the probe's one change
    res_slices = F.array(
        *[
            F.slice(F.col("e_res"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
            for s in range(PQ_M)
        ]
    )
    dbsub = assigned.select(
        "vec_id", "ccid", F.posexplode(res_slices).alias("s", "sub")
    )
    ids = assigned.select("vec_id", "ccid")
    seed_pool = ids.withColumn(
        "salt", F.col("vec_id") % PQ_RANK_SALT
    ).withColumn(
        "rn1",
        F.row_number().over(W.partitionBy("ccid", "salt").orderBy("vec_id")),
    ).filter(F.col("rn1") <= PQ_K)
    seeds = (
        seed_pool.withColumn(
            "cid",
            (
                F.row_number().over(W.partitionBy("ccid").orderBy("vec_id"))
                - 1
            ).cast("int"),
        )
        .filter(F.col("cid") < PQ_K)
        .select("vec_id", "cid")
    )
    init_long = dbsub.join(F.broadcast(seeds), "vec_id").select(
        "ccid", "cid", "s", F.posexplode("sub").alias("spos", "cval")
    )
    a0 = _ivfpq_assign(dbsub, _ivfpq_cb_row(init_long))
    c1_long = (
        a0.select(
            "ccid", "s", "cid", F.posexplode("sub").alias("spos", "val")
        )
        .groupBy("ccid", "s", "cid", "spos")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
    )
    cb1 = _ivfpq_cb_row(c1_long)
    codes = _ivfpq_assign(dbsub, cb1).select("vec_id", "ccid", "s", "cid")
    q = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), "e"
    )
    qcells = (
        q.crossJoin(F.broadcast(coarse_row))
        .select(
            "q_id",
            "e",
            F.posexplode(
                F.slice(
                    F.array_sort(_ivfpq_cell_dists(F.col("e"))),
                    1,
                    IVFPQ_NPROBE,
                )
            ).alias("_p", "w"),
        )
        .select(
            "q_id",
            F.col("w.ccid").alias("ccid"),
            F.zip_with("e", "w.c", lambda a, b: a - b).alias("e_res"),
        )
    )
    qsub = qcells.select(
        "q_id",
        "ccid",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("e_res"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for s in range(PQ_M)
                ]
            )
        ).alias("s", "sub"),
    )
    qtab = (
        qsub.crossJoin(F.broadcast(cb1))
        .select(
            "q_id",
            "ccid",
            "s",
            "sub",
            F.explode(
                F.filter(
                    F.col("cb"),
                    lambda x: (x.getField("s") == F.col("s"))
                    & (x.getField("ccid") == F.col("ccid")),
                )
            ).alias("ent"),
        )
        .select(
            "q_id",
            "ccid",
            "s",
            F.col("ent.cid").alias("cid"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("sub"),
                        F.col("ent.c"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                * 1e6
            )
            .cast("long")
            .alias("du"),
        )
    )
    ad = (
        codes.join(F.broadcast(qtab), ["ccid", "s", "cid"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("du").alias("approx_du"))
    )
    stage1 = ad.withColumn(
        "salt", F.col("vec_id") % PQ_RANK_SALT
    ).withColumn(
        "rn1",
        F.row_number().over(
            W.partitionBy("q_id", "salt").orderBy("approx_du", "vec_id")
        ),
    ).filter(F.col("rn1") <= topk)
    return (
        stage1.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("q_id").orderBy("approx_du", "vec_id")
            ),
        )
        .filter(F.col("rk") <= topk)
        .select(
            "q_id",
            F.col("rk").cast("long").alias("rk"),
            F.col("vec_id").alias("c_id"),
            "approx_du",
        )
    )


old_df = sim.ann_ivfpq_topk(spark, SF)
new_df = ranked_persisted(spark, SF)
assert old_df.schema == new_df.schema, (old_df.schema, new_df.schema)
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
assert a == 0 and b == 0, (a, b)
print("equality OK (rows + schema)", flush=True)


def run(fn):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for fn in (sim.ann_ivfpq_topk, ranked_persisted):
    run(fn)

res = {}
for rep in range(6):
    for tag, fn in (("old", sim.ann_ivfpq_topk), ("new", ranked_persisted)):
        res.setdefault(tag, []).append(run(fn))
for tag, v in sorted(res.items()):
    print(
        f"ann_ivfpq_topk {tag}  min={min(v):.3f}  "
        + " ".join(f"{x:.3f}" for x in v),
        flush=True,
    )
