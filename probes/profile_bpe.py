"""A/B: bpe_train_3merges committed (one lazy plan, ReusedExchange dedup)
vs per-round localCheckpoint of the merged symbol frame."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())
from pyspark.sql import functions as F  # noqa: E402

from parallel_mapreduce_spark.session import get_spark  # noqa: E402
from parallel_mapreduce_spark.functions.text import (  # noqa: E402
    BPE_ROUNDS,
    _BPE_MERGE_EXPR,
    token_df,
    bpe_train_3merges,
)

SF = "/root/testdata/sf0.1"
spark = get_spark("profile-bpe")


def variant(spark, sf_dir):
    wc = token_df(spark, sf_dir).groupBy("word").agg(
        F.count("*").alias("cnt")
    )
    syms = wc.select(
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("s"),
    ).localCheckpoint(eager=True)
    out = None
    for r in range(1, BPE_ROUNDS + 1):
        pairs = syms.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("s", 1, F.size("s") - 1),
                    F.slice("s", 2, F.size("s") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        ).filter(F.col("p.a") != F.col("p.b"))
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
        )
        syms = (
            syms.crossJoin(F.broadcast(top))
            .select("cnt", F.expr(_BPE_MERGE_EXPR).alias("s"))
            .localCheckpoint(eager=True)
        )
        stat = syms.agg(
            F.sum(F.col("cnt") * F.size("s")).cast("long").alias(
                "symbols_after"
            )
        )
        row = top.crossJoin(F.broadcast(stat)).select(
            F.lit(r).alias("round"),
            F.concat_ws(" ", "a", "b").alias("pair"),
            "pair_count",
            "symbols_after",
        )
        out = row if out is None else out.unionByName(row)
    return out


# equality first
a = bpe_train_3merges(spark, SF).toPandas().sort_values("round")
b = variant(spark, SF).toPandas().sort_values("round")
assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), (
    a,
    b,
)
print("EQUAL", flush=True)

for tag, fn in (
    ("committed", bpe_train_3merges),
    ("variant", variant),
    ("committed2", bpe_train_3merges),
    ("variant2", variant),
):
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{min(ts):7.3f}s  {tag}", flush=True)
