"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 is registered here as a named query —
a callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with the
ANSI-SQL oracle string DuckDB runs on the same Parquet tables. The driver's
correctness gate (``__spark_entry__.py``) is generated from this registry.

Rules enforced by convention (and by tests/test_oracle_parity.py):
- every computed column is aliased identically in the Spark plan and the SQL;
- float aggregates are rounded (ROUND(x, 4)) on BOTH sides so engine-order
  summation differences can't flip the value hash;
- counts are BIGINT on both sides (DuckDB's SUM(int)->HUGEINT is always cast);
- timestamps cross the comparison as epoch seconds or formatted strings,
  never raw timestamp objects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> driver does a rows-only check
    headline: bool = False  # included in bench.py's per-round benchmark


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


# The external verification driver value-checks the first ~50 entries of
# ``queries()`` per round (round 1's CORRECTNESS file covers exactly the
# first 50 registered names). This list front-loads the queries that do not
# yet have a driver correctness row — round 1's unchecked tail (relational/
# TPC-H analogues, windows, set ops, time-series, skew, streaming) plus the
# queries added since — so each round's checked window lands on fresh
# surface. Names not listed follow in registration order, so the full map
# always contains every query regardless of this list's contents.
#
# ROUND-3 ROTATION NOTE: after round 2's CORRECTNESS lands, the union of
# r01+r02 driver rows covers r01's first-50 plus this list. Replace this
# list's contents with the still-unrowed tail — everything registered during
# round 2 (trainprep additions, corpus-cleaning, embedding analytics,
# streaming registrations, Q2/Q11/Q21 shapes, UDTF/Arrow slots, round-trips,
# funnel/retention/transitions, fuzzy/triangles, chunking, SQ ANN, interp
# gap-fill, incremental merge, outliers, correlation) — keeping r01+r02
# names OUT so the window lands on fresh surface again.
DRIVER_PRIORITY: list[str] = [
    # new this round
    "full_outer_customer_orders",
    "multi_source_wordcount",
    # join kinds without a driver row yet
    "semi_join_big_spenders",
    "anti_join_no_f_orders",
    "left_join_open_orders",
    "range_join_quantity_bands",
    "salted_join_user_tiers",
    "asof_purchase_attribution",
    # dedicated window queries
    "window_top_orders_per_customer",
    "window_running_spend",
    "window_order_gaps",
    "window_trailing_7d_spend",
    "window_ntile_nth",
    # set operations (incl. an ALL form)
    "set_union",
    "set_intersect",
    "set_except",
    "set_union_all",
    # grouping analytics
    "rollup_flag_status",
    "cube_flag_status",
    "grouping_sets_segment_status",
    "pivot_status_by_segment",
    # relational tail
    "topk_orders",
    "scalar_functions",
    "monthly_revenue",
    "brand_volume",
    "having_frequent_customers",
    "price_percentiles",
    "cust_above_nation_avg",
    "orders_status_priority_dedup",
    "ship_latency_by_month",
    # TPC-H analogues
    "q4_priority_check",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_items_sql",
    "q12_ship_classes",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_volume_shippers",
    "q22_idle_customers",
    # time-series
    "events_rollup_day_hour",
    "events_hourly_gapfill_locf",
    # streaming
    "stream_dedup_events",
    "stream_user_totals",
]


def _driver_rowed_names() -> set[str]:
    """Query names with a recorded driver correctness row in ANY prior
    round (union of CORRECTNESS_r*.json at the repo root). Missing or
    unreadable files contribute nothing — a fresh checkout still orders
    deterministically."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rowed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rowed |= set(json.load(fh))
        except (OSError, ValueError):
            continue
    return rowed


def _ordered_names() -> list[str]:
    """DRIVER_PRIORITY first (the explicit window for this round's check),
    then — self-maintaining rotation — every query with NO driver row from
    any prior round, then the already-rowed tail; registration order within
    each block. If the driver ever checks more than the priority window,
    the extra slots land on fresh surface automatically."""
    _load_all()
    pri = [n for n in DRIVER_PRIORITY if n in QUERIES]
    listed = set(pri)
    rowed = _driver_rowed_names()
    rest = [n for n in QUERIES if n not in listed]
    return (
        pri
        + [n for n in rest if n not in rowed]
        + [n for n in rest if n in rowed]
    )


def query_map() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_map() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle
    }


def headline_names() -> list[str]:
    _load_all()
    return [name for name, spec in QUERIES.items() if spec.headline]


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import parallel_mapreduce_spark.functions.dedup  # noqa: F401
    import parallel_mapreduce_spark.functions.multimodal  # noqa: F401
    import parallel_mapreduce_spark.functions.pipeline  # noqa: F401
    import parallel_mapreduce_spark.functions.python_slots  # noqa: F401
    import parallel_mapreduce_spark.functions.similarity  # noqa: F401
    import parallel_mapreduce_spark.functions.text  # noqa: F401
    import parallel_mapreduce_spark.functions.trainprep  # noqa: F401
    import parallel_mapreduce_spark.mr  # noqa: F401
    import parallel_mapreduce_spark.operators.events  # noqa: F401
    import parallel_mapreduce_spark.operators.relational  # noqa: F401
    import parallel_mapreduce_spark.operators.skew  # noqa: F401
    import parallel_mapreduce_spark.operators.tpch_gaps  # noqa: F401
    import parallel_mapreduce_spark.operators.timeseries  # noqa: F401
    import parallel_mapreduce_spark.sources.roundtrip  # noqa: F401
    import parallel_mapreduce_spark.streaming.dedup_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.events_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.joins_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.stateful  # noqa: F401

    _LOADED = True
