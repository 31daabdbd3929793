"""Scoped driver-gate replica: oracle-check only the named queries.

Usage: python probes/run_gate_scoped.py <sf_dir> name1 name2 ...
       python probes/run_gate_scoped.py <sf_dir> @prefix   (all names starting
       with prefix)
"""
import json
import sys
import time

from pyspark.sql import SparkSession
import duckdb

SF = sys.argv[1]
args = sys.argv[2:]

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import __spark_entry__ as E  # noqa: E402
from test_oracle_parity import _normalize, _values_close, _kind_mismatches  # noqa: E402

qs, os_ = E.queries(), E.oracle_sql()
names = []
for a in args:
    if a.startswith("@"):
        names += [n for n in qs if n.startswith(a[1:])]
    else:
        names.append(a)
names = sorted(set(names))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

bad, walls = [], {}
for name in names:
    t0 = time.time()
    try:
        got = qs[name](spark, SF).toPandas()
    except Exception as exc:  # noqa: BLE001
        bad.append((name, f"ERROR: {exc}"))
        walls[name] = round(time.time() - t0, 2)
        continue
    want = con.sql(os_[name]).df()
    if sorted(got.columns) != sorted(want.columns):
        bad.append((name, "SCHEMA"))
    else:
        kd = _kind_mismatches(got, want[got.columns])
        g = _normalize(got.to_dict("records"), got.columns)
        w = _normalize(want.to_dict("records"), want.columns)
        ok = len(g) == len(w) and all(
            all(_values_close(x, y) for x, y in zip(a, b))
            for a, b in zip(g, w)
        ) and not kd
        if not ok:
            bad.append((name, f"VALUES kd={kd}"))
    walls[name] = round(time.time() - t0, 2)
    print(f"{walls[name]:7.2f}s  {'FAIL' if bad and bad[-1][0]==name else 'ok  '}  {name}", flush=True)

print(json.dumps({"n": len(names), "n_bad": len(bad), "bad": bad}))
