"""Oracle parity at sf0.1 for the SCALE-SENSITIVE queries.

The driver checks parity at sf0.01; a pinned predicate can still flip at
a bigger scale factor (round 5 shipped exactly that: the HLL
merge-vs-direct band held bit-exact at 15 and 150 distinct users —
sparse-mode sketches — then diverged 0.40% at 1,500 when the union's
gadget promoted, turning the oracle's TRUE into a guaranteed red). This
module re-runs the queries whose oracles embed tolerance bands, sketch
behavior, data-dependent control flow, or day-boundary interval edges at
sf0.1, so a scale-dependent flip fails locally before any driver ever
sees it."""

from __future__ import annotations

import pytest

from parallel_mapreduce_spark.registry import QUERIES, _load_all

_load_all()

SCALE_SENSITIVE = [
    # sketch estimates asserted inside oracle-pinned bounds
    "hll_sketch_mergeable_rollup",
    "approx_distinct_parts",
    "price_percentiles_approx",
    # data-dependent loop iteration count
    "sql_scripting_threshold_search",
    # day-boundary interval explode (zero-length guard)
    "user_state_daily_seconds",
    # float-formula digit extraction over a wider value range
    "benford_first_digit_audit",
    # oracle-pinned LAYOUT properties (files-per-partition, footer
    # shredding) that bigger inputs could in principle change
    "small_files_compaction_stats",
    "variant_shred_roundtrip",
    # round-6 oracle-pinned booleans that depend on measured engine
    # behavior: the stats-driven join flip (estimate gap could in
    # principle close at another scale), the zstd-vs-snappy footprint
    # comparison, the 4-file layout literal, and the ORDER BY delivery
    # proof inside the table-arg UDTF
    "cbo_stats_broadcast_flip",
    "codec_roundtrip_compare",
    "file_metadata_lineage",
    "udtf_table_arg_lang_fold",
    # round-6 closers whose oracles embed data- or engine-dependent
    # behavior: the NOT IN trap boolean (needs a NULL in the probe and
    # nonzero true non-matches — fixture-dependent), the inverse
    # distribution pair (percentile_disc rank boundaries shift with N),
    # and the map-algebra report (its first float checksum split on
    # half-ulp boundaries at sf0.1 only — the class this module exists
    # to catch)
    "not_in_null_semantics_report",
    "percentile_disc_vs_cont",
    "map_higher_order_report",
    # round-7: recursive clamped fold — rebuilt in exact integer cents
    # (the map_higher_order_report fix); kept here because its floor
    # hits (bal = 0) and recursion depth are data-dependent, so a
    # regression back toward floats would split here first
    "clamped_balance_recursive",
    # round-7: oracle-pinned LAYOUT literal (one file per lang after the
    # REBALANCE-hinted write) — a bigger input could in principle cross
    # the AQE advisory size and split a lang into multiple files
    "rebalance_hint_write_stats",
    # round-7: engine-order-dependent double SUM of log-ratios rounded to
    # 4 decimals — same accepted float class as unigram_logprob_score,
    # re-proven at sf0.1 where ten times the docs probe the boundary
    "dsir_importance_weights",
    # round-7: two-iteration GD replay — gradient AVG folds in engine
    # order before the 1e-6 round, and the p > 0.5 prediction boundary
    # is data-dependent; a midpoint/boundary hit would split here first
    "quality_classifier_lr2",
    # round-7: each hint branch folds its double SUM in its own
    # partition order before the 4-dp round — a midpoint hit would
    # desynchronize the branches at a bigger scale before anywhere else
    "join_strategy_hint_matrix",
    # round-7: assignment distances and pairwise cosines round to 6 dp
    # before compare (the kmeans midpoint class); a bigger corpus probes
    # more boundaries, so the cluster report re-proves at sf0.1
    "semdedup_cluster_report",
    # round-7: inherits the LR fit's gradient-AVG fold AND the p > 0.5
    # keep boundary; a midpoint/boundary hit would flip keep counts here
    "pipeline_model_filtered_corpus",
    # round-7 session 3: sketch-bound booleans whose exactness depends on
    # the no-purge regime (capacity vs distinct tokens) — a bigger corpus
    # is exactly where purging would start
    "approx_topk_tokens",
    # round-7 session 3: oracle-pinned sketch-invariant booleans (mass
    # conservation, strict centroid ascent) over engine-measured behavior
    "histogram_numeric_profile",
    # round-7 session 3: the global ltz_rerendered boolean compares two
    # measured hour histograms — a pathological distribution could make
    # the +08:45 re-render coincide; re-prove at sf0.1
    "timestamp_ntz_roundtrip",
    # round-7 session 3: sketch-bound booleans over sampled estimates —
    # theta leaves the exact regime above 4096 distincts (sf0.1 is the
    # first scale that samples), and KLL's rank bound is probabilistic
    # with a fixed seed; both re-proven at sf0.1
    "theta_customer_set_algebra",
    "kll_quantile_rollup",
    # round-8: K derives from COUNT(*) — sf0.1 is the first scale where
    # the ceil crosses the MIN_K floor (K=16 vs 8), so the oracle's nv
    # CTE replay is only actually exercised here
    # (semdedup_cluster_report already listed above).
    # round-8: recall joins replay BOTH legs at 2000 vecs — the 6-dp
    # distance/cosine rounding boundaries and the PQ integer ADC sums
    # get 4x the corpus to probe midpoints
    "ann_recall_matrix",
    "ann_pq_shortlist_recall_curve",
    # round-8: island detection over organic long runs — sf0.1's larger
    # working set (1218 pairs incl. 10..95-token organic spans) is where
    # a diagonal/island edge case would first appear
    "exact_substring_runs",
    # round-8: mean-cosine buckets fold engine-order double AVGs to 4 dp
    # over ~11k pairs — the boundary-probing population is here
    "simhash_angle_fidelity",
    # round-8: sketch-bound booleans (4-sigma per precision) over a 10x
    # larger distinct population — the regime where a degraded sketch
    # would first breach its bound
    "hll_precision_error_curve",
    # round-8: per-doc fold of the run frame incl. the zero-overlap
    # left-join branch — sf0.1's organic long runs exercise both sides
    "longest_dup_span_per_doc",
    # round-10: within-doc self leg + its fixture first meet organic
    # long runs at this scale (the pair universe change rides the two
    # queries above plus the removal composition)
    "substring_run_removal",
    # round-10: bloom fp counts are load-factor-dependent — sf0.1 is
    # where the undersized filter saturates (837 fp) and a hash or
    # sizing drift would first show
    "bloom_incremental_dedup",
    # round-10: the clustered matrix's six floor booleans at the 2000-vec
    # corpus (ivf_pq per-cell codebooks + the rerank leg)
    "ann_recall_matrix_clustered",
    # round-11: the beam-search floor boolean (GS_FLOOR=0.7) has its
    # thinnest margin at sf0.1 (measured 0.777 vs ~0.8+ below), and the
    # traversal's UNION dedup rides exact 6-dp cosine agreement — the
    # midpoint class, probed widest here
    "ann_graph_search_recall_at_k",
    # round-11: held-out queries are md5-perturbed corpus vectors whose
    # arithmetic (conv/substr/md5 parity + the perturbation add) and
    # src_top1 booleans first meet the 2000-vec corpus at this scale
    "ann_graph_search_oov_recall",
    # round-12: deletion serving reads the SNAPSHOT and its recall
    # values ride the same 6-dp cosine agreement; the 2000-vec corpus
    # is where survivor-truth margins are thinnest (0.77/0.80 vs
    # 0.95/0.97 below), and the compacted leg's re-home join first sees
    # real tombstone-adjacent fan-out here
    "ann_graph_delete_recall",
    # round-12: the int8-steered beam's quantized-vs-float tie (0.7800
    # vs 0.7767) is a knife-edge value at this scale — a quantization
    # or rescale drift on either engine splits here first
    "ann_graph_search_quantized_recall",
    # round-12: snapshot-freshness check over the largest corpus the
    # suite builds — a stale or truncated snapshot shows up as count
    # drift here before any serving query notices
    "knn_index_manifest",
    # round-13: per-shard graphs first diverge meaningfully from the
    # global graph at the 2000-vec corpus (500-vec shards at S=4), and
    # the per-shard cap + per-shard beam arithmetic rides the same 6-dp
    # agreement as the unsharded family
    "ann_graph_search_sharded_recall",
    "ann_graph_search_sharded_topk",
    # round-13: the drained stream must equal the batch serving path at
    # the scale where beam margins are thinnest
    "stream_ann_serve_topk",
    # round-13: routed-vs-fanout recall gap is widest (and the in-shard
    # truth fraction smallest) at the largest corpus
    "ann_graph_search_routed_recall",
    # round-13: cell sizes skew with the corpus (kmeans cells), so the
    # per-cell cap + probe ranking arithmetic needs the big-corpus check
    "ann_graph_search_cell_routed_recall",
]


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.1"
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_scale_sensitive_query_matches_oracle_at_sf01(name, spark, duck01):
    from test_oracle_parity import _kind_mismatches, _normalize, _values_close

    spec = QUERIES[name]
    got = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
    want = duck01.sql(spec.oracle).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert not _kind_mismatches(got, want[got.columns])
    g = _normalize(got.to_dict("records"), got.columns)
    w = _normalize(want.to_dict("records"), want.columns)
    assert len(g) == len(w)
    for a, b in zip(g, w):
        assert all(_values_close(x, y) for x, y in zip(a, b)), (a, b)
