"""Round-12 one-off 10x/30x probe for the graph-serving stack.

Round 11's probe30 measured every serving query WITH its in-query
NN-Descent rebuild (t10 ~25-30s each, slopes 0.35-0.62 dominated by the
build). Round 12 materializes the index once (`_knn_index`), so this
probe reports the two costs the new physical design actually has:

- ``build_wall_s``: ONE snapshot build per corpus scale (timed by
  touching `_knn_index` on a cold key before any query runs);
- per-query SERVING wall at 10x/30x with the build already on disk —
  the steady-state number a serving tier sees — plus the fitted slope
  t ~ scale^b over the two points.

Uses scale_probe's disjoint replica corpora (dup structure constant, so
slopes measure plan cost). Writes probes/results/probe30_r12.json.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import build_scale_dir, time_query  # noqa: E402

from parallel_mapreduce_spark.functions import similarity as S  # noqa: E402
from parallel_mapreduce_spark.registry import QUERIES, _load_all  # noqa: E402
from parallel_mapreduce_spark.session import get_spark  # noqa: E402

SCALES = (10, 30)
NAMES = (
    "ann_graph_search_topk",
    "ann_graph_search_recall_at_k",
    "knn_graph_rng_prune",
    "ann_graph_delete_serve",
    "ann_graph_delete_recall",
    "ann_graph_search_quantized_recall",
)


def main() -> None:
    _load_all()
    spark = get_spark("probe30_r12")
    dirs = {}
    build_walls = {}
    for s in SCALES:
        d = build_scale_dir(spark, s, "disjoint")
        dirs[s] = d
        # Cold build: drop any existing snapshot for this corpus so the
        # build wall is measured, then touch the index once.
        snap = S._knn_snap_dir(d)
        shutil.rmtree(snap, ignore_errors=True)
        t0 = time.perf_counter()
        S._knn_index(spark, d)
        build_walls[f"x{s}"] = round(time.perf_counter() - t0, 2)
    # Warm pass at 10x (plan codegen), then timed serving runs.
    for name in NAMES:
        QUERIES[name].fn(spark, dirs[SCALES[0]]).write.format("noop").mode(
            "overwrite"
        ).save()
    out = {"build_wall_s": build_walls}
    for name in NAMES:
        t10, r10 = time_query(spark, name, dirs[10])
        t30, r30 = time_query(spark, name, dirs[30])
        slope = round(math.log(t30 / t10) / math.log(3.0), 2)
        out[name] = {
            "t10": round(t10, 2),
            "rows10": r10,
            "t30": round(t30, 2),
            "rows30": r30,
            "slope": slope,
        }
        print(name, out[name], flush=True)
    dest = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results",
        "probe30_r12.json",
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print("build walls:", build_walls)
    print("wrote", dest)


if __name__ == "__main__":
    main()
