"""Global scale-posture audit: every registered query's physical plan is
swept for the red flags that would break a 100 TB run.

- CartesianProduct: an unhinted cross product shuffles |A| x |B| — every
  intentional cross is broadcast (BroadcastNestedLoopJoin) over a provably
  tiny side.
- BatchEvalPython / ArrowEvalPython in the plan means a per-row or per-batch
  Python stage; only the explicitly-Python surfaces (mapInPandas multimodal
  decode, the RDD veneer, stateful streaming) may have one.
"""

from __future__ import annotations

import pytest

from parallel_mapreduce_spark.registry import QUERIES, _load_all

_load_all()

# Queries whose plan is legitimately Python-backed (documented slow paths).
PYTHON_SURFACE = {
    "multimodal_features",
    "mr_wordcount",
    "stream_user_totals",
    "pandas_udf_vowel_ratio",
    "pandas_grouped_zscore",
    "multimodal_resize",
    "udtf_split_sentences",
    "arrow_doc_lengths",
    "cogrouped_user_value_share",
}
# Queries that execute eagerly on construction (stream run / iterative loop);
# their returned frame's plan is a result scan, still audited for the flags.
EAGER = {"stream_user_totals", "neardup_clusters", "pipeline_clean_corpus"}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_red_flags(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name}: unbroadcast cross product"
    if name not in PYTHON_SURFACE:
        assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
        if name not in EAGER:
            assert "ArrowEvalPython" not in plan, f"{name}: unexpected Python stage"
