"""Time named queries at a given SF under the bench session (min over N).

Usage: python probes/time_queries.py <sf_dir> <reps> name1 name2 ...
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())
from parallel_mapreduce_spark.registry import QUERIES, _load_all  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402

SF, REPS = sys.argv[1], int(sys.argv[2])
names = sys.argv[3:]
_load_all()
spark = get_spark("time-queries")

for name in names:
    # warm pass at sf0.001 (codegen) then one untimed pass at target SF
    QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    QUERIES[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        ts.append(time.perf_counter() - t0)
    print(
        f"{min(ts):7.3f}s min  {name}  "
        f"[{', '.join(f'{t:.3f}' for t in ts)}]",
        flush=True,
    )
