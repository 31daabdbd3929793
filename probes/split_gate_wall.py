"""Split a gate query's wall into Spark-side (fn + toPandas) vs
DuckDB-oracle-side time at sf0.01 under a plain session."""
import sys
import time

from pyspark.sql import SparkSession
import duckdb

SF = "/root/testdata/sf0.01"
names = sys.argv[1:]
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

qs, os_ = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

for name in names:
    t0 = time.time()
    qs[name](spark, SF).toPandas()
    t1 = time.time()
    con.sql(os_[name]).df()
    t2 = time.time()
    print(
        f"spark={t1-t0:7.2f}s  oracle={t2-t1:7.2f}s  {name}", flush=True
    )
