"""Round-13 one-off 10x/30x probe for the truth snapshot + sharded and
streaming serving.

Round 13 materializes the eval-truth frame (`_knn_truth_index`) and adds
sharded + streaming serving, so this probe prices the round's three new
costs the way probe30_r12 priced the index split:

- ``build_wall_s``: the one-time snapshot builds per corpus scale —
  the full index, the TRUTH snapshot, and the sharded{2,4} variants,
  each timed cold;
- per-query serving wall at 10x/30x with every snapshot on disk, plus
  the fitted slope t ~ scale^b — for the recall legs the round rewired
  onto the truth scan, and the two new serving queries.

Uses scale_probe's disjoint replica corpora. Writes
probes/results/probe30_r13.json.
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
    "ann_graph_search_beam_curve",
    "ann_graph_delete_recall",
    "ann_graph_delete_fraction_curve",
    "ann_graph_search_oov_recall",
    "ann_graph_search_quantized_recall",
    "ann_graph_search_filtered_recall",
    "ann_graph_search_sharded_recall",
    "stream_ann_serve_topk",
)


def main() -> None:
    _load_all()
    spark = get_spark("probe30_r13")
    dirs = {}
    build_walls = {}
    for s in SCALES:
        d = build_scale_dir(spark, s, "disjoint")
        dirs[s] = d
        walls = {}
        for variant, keyfn in (
            ("full", lambda: S._knn_snap_dir(d)),
            ("truth", lambda: S._knn_truth_dir(d)),
            ("sharded2", lambda: S._knn_snap_dir(d, "sharded2")),
            ("sharded4", lambda: S._knn_snap_dir(d, "sharded4")),
        ):
            shutil.rmtree(keyfn(), ignore_errors=True)
            t0 = time.perf_counter()
            if variant == "truth":
                S._knn_truth_index(spark, d)
            else:
                S._knn_index(spark, d, variant if variant != "full" else "full")
            walls[variant] = round(time.perf_counter() - t0, 2)
        build_walls[f"x{s}"] = walls
        print(f"x{s} builds", walls, flush=True)
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
        "probe30_r13.json",
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print("wrote", dest)


if __name__ == "__main__":
    main()
