"""Split per-query wall into DataFrame-construction time (driver: plan
building + any eager jobs inside the query fn) vs noop-write execution.

Usage: python probes/profile_split.py <sf_dir> name...
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())
from parallel_mapreduce_spark.registry import QUERIES, _load_all  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402

SF = sys.argv[1]
names = sys.argv[2:]
_load_all()
spark = get_spark("profile-split")

for name in names:
    # codegen warm
    QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    best = (9e9, 9e9)
    for _ in range(3):
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, SF)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        if (t2 - t0) < sum(best):
            best = (t1 - t0, t2 - t1)
    print(
        f"build={best[0]:6.3f}s  exec={best[1]:6.3f}s  total={sum(best):6.3f}s  {name}",
        flush=True,
    )
