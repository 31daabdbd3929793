"""Full-registry driver-gate replica (see .claude/skills/verify).

Usage: python probes/run_gate.py [sf_dir] [out_json]
Mirrors the external driver: plain session, row/schema/value/kind checks
against the DuckDB oracle for every registered query.
"""
import json
import sys
import time

from pyspark.sql import SparkSession
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gate_out.json"

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import __spark_entry__ as E  # noqa: E402
from test_oracle_parity import _normalize, _values_close, _kind_mismatches  # noqa: E402

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, os_ = E.queries(), E.oracle_sql()
bad, walls = [], {}
t_all = time.time()
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        got = fn(spark, SF).toPandas()
        err = None
    except Exception as exc:  # noqa: BLE001
        bad.append((name, f"ERROR: {exc}"))
        walls[name] = round(time.time() - t0, 2)
        continue
    if name in os_:
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

res = {
    "sf": SF,
    "n": len(qs),
    "n_bad": len(bad),
    "bad": bad,
    "total_wall_s": round(time.time() - t_all, 1),
    "walls": walls,
}
with open(OUT, "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps({k: res[k] for k in ("sf", "n", "n_bad", "total_wall_s")}))
print("bad:", bad)
