"""Physical-plan shape assertions: the 100-TB posture, checked on the plan.

These tests pin the *plan*, not the result: filters reach the parquet scan,
dimension joins broadcast, top-k compiles to TakeOrdered, aggregation is
partial (map-side combine) — the properties SURVEY.md §4.2 calls out as the
engine's asymptotic wins over the reference.
"""

from __future__ import annotations


def _plan(df) -> str:
    # explain("formatted") prints untruncated PushedFilters/ReadSchema
    # (executedPlan().toString() elides long filter lists).
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from parallel_mapreduce_spark.operators.relational import filter_project

    plan = _plan(filter_project(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_column_pruning(spark, sf_dir):
    from parallel_mapreduce_spark.operators.relational import filter_project

    plan = _plan(filter_project(spark, sf_dir))
    # Scan must read only the needed columns, not o_orderdate/o_orderpriority.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderdate" not in read_schema
    assert "o_totalprice" in read_schema


def test_q5_broadcasts_dimensions(spark, sf_dir):
    from parallel_mapreduce_spark.operators.relational import q5_region_revenue

    plan = _plan(q5_region_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_topk_is_take_ordered(spark, sf_dir):
    from parallel_mapreduce_spark.operators.relational import topk_orders

    assert "TakeOrderedAndProject" in _plan(topk_orders(spark, sf_dir))


def test_wordcount_has_partial_aggregation(spark, sf_dir):
    from parallel_mapreduce_spark.functions.text import wordcount

    plan = _plan(wordcount(spark, sf_dir))
    # Map-side combine: a partial_count before the exchange (the reference
    # ships every ("w","1") pair across its shuffle instead).
    assert "partial_count" in plan
    assert "Exchange" in plan


def test_lookup_filter_pushed_below_aggregate(spark, sf_dir):
    from parallel_mapreduce_spark.functions.text import wordcount_lookup

    # Catalyst must push `word = term` below the groupBy (the reference
    # aggregates everything then probes a hashmap, src/main.c:55-58).
    plan = _optimized(wordcount_lookup(spark, sf_dir))
    agg_idx = plan.index("Aggregate")
    filter_idx = plan.index("word#")
    assert "Filter" in plan
    # The filter appears beneath the aggregate in the optimized tree:
    below_agg = plan[agg_idx:]
    assert "Filter" in below_agg


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    from parallel_mapreduce_spark.operators.relational import (
        range_join_quantity_bands,
    )

    plan = _plan(range_join_quantity_bands(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_approx_distinct_accuracy(spark, sf_dir):
    from parallel_mapreduce_spark.operators.relational import approx_distinct_parts

    rows = approx_distinct_parts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) <= 0.1 * r.exact_parts
