"""A/B: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning under a
plain 200-partition session — wall + value equality for persist-heavy
queries."""
import sys
import time

from pyspark.sql import SparkSession

FLAG = sys.argv[1]  # "true" or "false"
names = sys.argv[2:]
SF = "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", FLAG
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

qs = E.queries()
for name in names:
    t0 = time.time()
    df = qs[name](spark, SF).toPandas()
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True).round(6)
    import hashlib

    h = hashlib.md5(df.to_csv(index=False).encode()).hexdigest()[:12]
    print(f"{time.time()-t0:7.2f}s  {h}  {name}", flush=True)
