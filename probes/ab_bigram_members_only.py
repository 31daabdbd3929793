"""Refinement A/B for bigram_logprob_score: identity (old) vs cutting only
the THIN members frame (rep, doc_id — after the md5 digest-group chain) vs
cutting both members and the fat tokenized reps frame (measured slower)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from parallel_mapreduce_spark.functions import dedup, trainprep  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-bigram-members")
spark.sparkContext.setLogLevel("ERROR")

real_cut = dedup.corpus_cut


def ident(df, sf_dir, table="documents"):
    return df


def members_only(df, sf_dir, table="documents"):
    if set(df.columns) == {"rep", "doc_id"}:
        return real_cut(df, sf_dir, table)
    return df


VARIANTS = [("old", ident), ("members", members_only), ("both", real_cut)]

base = None
for tag, v in VARIANTS:
    trainprep.corpus_cut = v
    df = trainprep.bigram_logprob_score(spark, SF)
    if base is None:
        base = df
    else:
        assert base.exceptAll(df).count() == 0
        assert df.exceptAll(base).count() == 0
print("equality OK", flush=True)


def run():
    t0 = time.perf_counter()
    trainprep.bigram_logprob_score(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


for tag, v in VARIANTS:
    trainprep.corpus_cut = v
    run()  # warm

res = {}
for rep in range(6):
    for tag, v in VARIANTS:
        trainprep.corpus_cut = v
        res.setdefault(tag, []).append(run())
for k, v in res.items():
    print(f"{k:8s} min={min(v):.3f}  " + " ".join(f"{x:.3f}" for x in v), flush=True)
