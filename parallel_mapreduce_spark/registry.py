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
# ROUND-4 WINDOW: r01–r03 rows cover 150 names. The first two entries are
# the round-3 hash-FAIL re-checks — pipeline_training_mix and
# seq_pack_contiguous were value-correct but their oracles returned DuckDB
# HUGEINT from windowed SUMs (now CAST ... AS BIGINT, per the header rule) —
# followed by the first 48 of the 55 never-rowed queries in registration
# order (round-2 tail: quality features, PMI, k-NN, PCA, k-means, pack/
# shuffle/bucket/boilerplate/bigram/detok/sampling trainprep tail, events
# debounce/top-k/percentiles/ECDF/PageRank/trailing-24h, recursive CTE,
# relational analytics tail, q2/q11/q21 shapes, gap-fill, as-of, IO
# round-trips). The ~7 remaining unrowed (tail of the streaming
# registrations) are placed immediately after this window by the
# self-maintaining unrowed-first block in ``_ordered_names`` and form the
# round-5 window without further edits to this list.
DRIVER_PRIORITY: list[str] = [
    # round-3 red re-checks (oracle HUGEINT typing fixed this round)
    "pipeline_training_mix",
    "seq_pack_contiguous",
    # never-rowed, registration order
    "doc_quality_features",
    "hapax_ratio_by_source",
    "token_length_histogram",
    "zipf_slope_by_source",
    "token_pmi_top_pairs",
    "bpe_pair_merge_step",
    "countmin_heavy_hitters",
    "bloom_word_membership",
    "exact_dup_rate_by_source",
    "minhash_jaccard_estimate",
    "pipeline_chunk_index_search",
    "pandas_grouped_agg_iqr",
    "knn_label_accuracy",
    "embedding_pca_power_iter",
    "kmeans_lloyd_2iter",
    "pack_fill_stats",
    "epoch_shuffle_order",
    "length_bucket_padding",
    "strip_boilerplate_tokens",
    "bigram_logprob_score",
    "detokenize_ids_roundtrip",
    "weighted_sample_per_source",
    "events_debounce_dedup",
    "events_topk_types_per_hour",
    "session_duration_percentiles",
    "events_value_ecdf",
    "pagerank_event_types",
    "active_users_trailing_24h",
    "recursive_cte_reachability",
    "nation_extreme_customers",
    "orders_percent_rank_cume",
    "revenue_pareto_share",
    "nation_supplier_hhi",
    "orders_price_histogram",
    "customer_rfm_segments",
    "join_key_skew_census",
    "q21_waiting_suppliers_shape",
    "q11_important_parts_share",
    "q2_min_cost_supplier_shape",
    "events_hourly_gapfill_interp",
    "asof_next_click_after_purchase",
    "csv_roundtrip_order_stats",
    "json_roundtrip_doc_stats",
    "json_ingest_corrupt_tolerant",
    "bucketed_colocated_join",
    "orc_roundtrip_lineitem_stats",
    "partition_pruned_read",
    "range_clustered_write_stats",
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
    import parallel_mapreduce_spark.sources.pydatasource  # noqa: F401
    import parallel_mapreduce_spark.sources.roundtrip  # noqa: F401
    import parallel_mapreduce_spark.streaming.dedup_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.events_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.joins_stream  # noqa: F401
    import parallel_mapreduce_spark.streaming.stateful  # noqa: F401

    _LOADED = True
