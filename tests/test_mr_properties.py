"""Property-based checks of the MapReduce veneer (SURVEY.md §5.2 layer 3).

Hypothesis generates corpora and reducer counts; the veneer must satisfy the
reference's contract (SURVEY.md §2.4) on all of them:
- result set is independent of the number of reduce partitions;
- results equal a sequential model of the same map/reduce functions;
- keys arrive sorted ascending within each partition.

Spark jobs are slow per example, so examples are capped and deadlines off.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Keys deliberately include ''-adjacent and unicode-ish cases; values are the
# token stream the mapper will re-emit.
_corpus = st.lists(
    st.lists(
        st.text(
            alphabet="ab cdé", min_size=0, max_size=8
        ),  # spaces make empty tokens
        min_size=0,
        max_size=6,
    ).map(lambda toks: " ".join(toks)),
    min_size=0,
    max_size=12,
)


def _map_fn(line):
    return [(t, "1") for t in line.split(" ") if t]


def _reduce_count(key, values):
    return sum(1 for _ in values)


def _model(lines):
    from collections import Counter

    c = Counter(t for line in lines for t in line.split(" ") if t)
    return dict(c)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_corpus, reducers=st.sampled_from([1, 2, 7, 13]))
def test_veneer_matches_sequential_model_any_partition_count(
    spark, lines, reducers
):
    from parallel_mapreduce_spark.mr import mr_run_rdd

    rdd = spark.sparkContext.parallelize(lines, numSlices=3)
    got = dict(mr_run_rdd(rdd, _map_fn, _reduce_count, reducers).collect())
    assert got == _model(lines)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_corpus)
def test_keys_sorted_within_every_partition(spark, lines):
    from parallel_mapreduce_spark.mr import mr_run_rdd

    rdd = spark.sparkContext.parallelize(lines, numSlices=2)
    parts = mr_run_rdd(rdd, _map_fn, _reduce_count, 5).glom().collect()
    for part in parts:
        keys = [k for k, _ in part]
        assert keys == sorted(keys)
