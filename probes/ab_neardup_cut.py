"""Single-session interleaved A/B of the round-14 corpus_cut in the
near-dup Jaccard family: variant toggled by monkeypatching dedup.corpus_cut
to identity (old plan) vs the real cut, so both run under identical JIT /
cache / load conditions. Equality asserted before timing."""
import sys
import time

sys.path.insert(0, "/root/repo")

from parallel_mapreduce_spark.functions import dedup  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-neardup")
spark.sparkContext.setLogLevel("ERROR")

real_cut = dedup.corpus_cut


def ident(df, sf_dir, table="documents"):
    return df


QS = (dedup.neardup_jaccard_pairs, dedup.neardup_jaccard_pairs_capped)


def run(q):
    t0 = time.perf_counter()
    q(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# Equality first: old exceptAll new == 0 both directions.
for q in QS:
    dedup.corpus_cut = ident
    old = q(spark, SF)
    dedup.corpus_cut = real_cut
    new = q(spark, SF)
    a = old.exceptAll(new).count()
    b = new.exceptAll(old).count()
    assert a == 0 and b == 0, (q.__name__, a, b)
    print(f"equality OK: {q.__name__}", flush=True)

# Warm both variants.
for variant in (ident, real_cut):
    dedup.corpus_cut = variant
    for q in QS:
        run(q)

res = {}
for rep in range(6):
    for tag, variant in (("old", ident), ("new", real_cut)):
        dedup.corpus_cut = variant
        for q in QS:
            res.setdefault((q.__name__, tag), []).append(run(q))
for k, v in sorted(res.items()):
    print(f"{k[0]:32s} {k[1]}  min={min(v):.3f}  " + " ".join(f"{x:.3f}" for x in v), flush=True)
