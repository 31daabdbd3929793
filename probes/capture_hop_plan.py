"""Capture the traversal HOP-SCORING subplan (the part hidden behind the
per-hop materialization in the final-cut explain): entry pairs scored via
_knn_score under the current tree's serving decision.

Usage: PYTHONPATH=<tree> python capture_hop_plan.py <tree> <out_file>
"""
import contextlib
import io
import sys

tree, out = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)

from pyspark.sql import functions as F  # noqa: E402

from parallel_mapreduce_spark.session import get_spark  # noqa: E402
from parallel_mapreduce_spark.functions import similarity as sim  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark("capture-hop-plan")
vecs = sim._knn_vecs(spark, SF)
bkts = sim._knn_buckets_snap(spark, SF)
q_src = bkts.where(F.col("vec_id") < sim.KNN_EVAL_N)
entry = (
    q_src.select(F.col("vec_id").alias("node"), "tbl", "bucket")
    .join(
        sim._knn_capped_buckets(bkts).select(
            F.col("vec_id").alias("nbr"), "tbl", "bucket"
        ),
        ["tbl", "bucket"],
    )
    .where(F.col("node") != F.col("nbr"))
    .select("node", "nbr")
    .dropDuplicates(["node", "nbr"])
)
if hasattr(sim, "_gs_small"):
    scored = sim._knn_score(entry, vecs, bcast=sim._gs_small(SF))
    tag = f"bcast={sim._gs_small(SF)}"
else:  # pre-optimization tree: no bcast parameter
    scored = sim._knn_score(entry, vecs)
    tag = "committed shuffle_hash"
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    scored.explain("formatted")
txt = buf.getvalue()
with open(out, "w") as fh:
    fh.write(
        f"-- traversal hop-scoring subplan ({tag}), tree={tree}\n"
        f"-- Exchange nodes: {txt.count('Exchange')}\n" + txt
    )
print(out, "exchanges:", txt.count("Exchange"))
