"""Single-session interleaved A/B of the round-14 corpus_cut in
bigram_logprob_score (trainprep) and substring_run_removal (dedup):
variant toggled by monkeypatching the module-level corpus_cut to identity
(old plan) vs the real cut. Equality asserted before timing."""
import sys
import time

sys.path.insert(0, "/root/repo")

from parallel_mapreduce_spark.functions import dedup, trainprep  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-bigram-substr")
spark.sparkContext.setLogLevel("ERROR")

real_cut = dedup.corpus_cut


def ident(df, sf_dir, table="documents"):
    return df


QS = (
    (trainprep, trainprep.bigram_logprob_score),
    (dedup, dedup.substring_run_removal),
)


def set_variant(mod, fn):
    mod.corpus_cut = fn


def run(q):
    t0 = time.perf_counter()
    q(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for mod, q in QS:
    set_variant(mod, ident)
    old = q(spark, SF)
    set_variant(mod, real_cut)
    new = q(spark, SF)
    a = old.exceptAll(new).count()
    b = new.exceptAll(old).count()
    assert a == 0 and b == 0, (q.__name__, a, b)
    print(f"equality OK: {q.__name__}", flush=True)

for variant in (ident, real_cut):
    for mod, q in QS:
        set_variant(mod, variant)
        run(q)  # warm

res = {}
for rep in range(6):
    for tag, variant in (("old", ident), ("new", real_cut)):
        for mod, q in QS:
            set_variant(mod, variant)
            res.setdefault((q.__name__, tag), []).append(run(q))
for k, v in sorted(res.items()):
    print(
        f"{k[0]:28s} {k[1]}  min={min(v):.3f}  "
        + " ".join(f"{x:.3f}" for x in v),
        flush=True,
    )
