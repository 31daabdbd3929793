"""Invariant tests for the round-3 operators — properties the DuckDB
value-parity comparison cannot express (cross-run determinism, structural
invariants, conservation laws)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_epoch_shuffle_is_a_permutation(spark, sf_dir):
    from parallel_mapreduce_spark.functions.trainprep import epoch_shuffle_order

    out = epoch_shuffle_order(spark, sf_dir).toPandas()
    n = len(out)
    assert sorted(out["global_pos"]) == list(range(n))
    # shard-major layout: sorting by position gives non-decreasing shards
    assert out.sort_values("global_pos")["shard"].is_monotonic_increasing


def test_epoch_shuffle_is_deterministic(spark, sf_dir):
    from parallel_mapreduce_spark.functions.trainprep import epoch_shuffle_order

    a = epoch_shuffle_order(spark, sf_dir).toPandas().sort_values("doc_id")
    b = epoch_shuffle_order(spark, sf_dir).toPandas().sort_values("doc_id")
    assert a["global_pos"].tolist() == b["global_pos"].tolist()


def test_kmeans_sizes_conserve_corpus(spark, sf_dir):
    from parallel_mapreduce_spark.functions.similarity import (
        KMEANS_K,
        kmeans_lloyd_2iter,
    )
    from parallel_mapreduce_spark.sources import load_table

    out = kmeans_lloyd_2iter(spark, sf_dir).toPandas()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    sizes = out.drop_duplicates("cid").set_index("cid")["n"]
    assert sizes.sum() == n_vecs
    assert len(sizes) <= KMEANS_K
    # every surviving cluster reports a full 64-dim centroid
    assert (out.groupby("cid").size() == 64).all()


def test_strip_boilerplate_conserves_tokens(spark, sf_dir):
    from parallel_mapreduce_spark.functions.text import tokens
    from parallel_mapreduce_spark.functions.trainprep import (
        strip_boilerplate_tokens,
    )
    from parallel_mapreduce_spark.sources import load_table

    out = strip_boilerplate_tokens(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(tokens("text"))).alias("s")
    ).first()["s"]
    agg = out.agg(
        F.sum("n_kept").alias("kept"),
        F.sum("n_removed").alias("removed"),
        F.min("n_removed").alias("min_removed"),
    ).first()
    assert agg["kept"] + agg["removed"] == total_tokens
    assert agg["min_removed"] >= 0
    assert agg["removed"] > 0  # the fixture vocabulary has head tokens


def test_length_buckets_are_powers_of_two(spark, sf_dir):
    from parallel_mapreduce_spark.functions.trainprep import (
        MIN_LEN_BUCKET,
        length_bucket_padding,
    )
    from parallel_mapreduce_spark.sources import load_table

    out = length_bucket_padding(spark, sf_dir).toPandas()
    for b in out["bucket"]:
        assert b >= MIN_LEN_BUCKET and (int(b) & (int(b) - 1)) == 0
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out["n_docs"].sum() == n_docs
    assert (out["padding_tokens"] >= 0).all()


def test_detokenize_roundtrip_all_ok(spark, sf_dir):
    from parallel_mapreduce_spark.functions.trainprep import (
        detokenize_ids_roundtrip,
    )

    out = detokenize_ids_roundtrip(spark, sf_dir)
    assert out.filter(~F.col("roundtrip_ok")).count() == 0


def test_pagerank_mass_is_bounded(spark, sf_dir):
    from parallel_mapreduce_spark.operators.events import pagerank_event_types

    out = pagerank_event_types(spark, sf_dir).toPandas()
    assert (out["pagerank"] > 0).all()
    # dangling mass can leak but never appear: total in (0, 1]
    assert 0 < out["pagerank"].sum() <= 1.0 + 1e-6


def test_reachability_starts_at_zero(spark, sf_dir):
    from parallel_mapreduce_spark.operators.events import (
        REACH_START,
        recursive_cte_reachability,
    )

    out = recursive_cte_reachability(spark, sf_dir).toPandas()
    hops = out.set_index("node")["min_hops"]
    assert hops[REACH_START] == 0
    assert (hops >= 0).all()


def test_active_users_bounded_by_hourly_and_total(spark, sf_dir):
    from parallel_mapreduce_spark.operators.events import (
        active_users_trailing_24h,
    )
    from parallel_mapreduce_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias(
                "hour_epoch_h"
            )
        )
        .agg(F.countDistinct("user_id").alias("in_hour"))
    )
    out = active_users_trailing_24h(spark, sf_dir)
    joined = out.join(hourly, "hour_epoch_h").toPandas()
    total_users = ev.select("user_id").distinct().count()
    assert (joined["active_users"] >= joined["in_hour"]).all()
    assert (joined["active_users"] <= total_users).all()


def test_rag_capstone_topk_shape(spark, sf_dir):
    from parallel_mapreduce_spark.functions.pipeline import (
        RAG_N_QUERIES,
        RAG_TOP_K,
        pipeline_chunk_index_search,
    )

    out = pipeline_chunk_index_search(spark, sf_dir).toPandas()
    per_q = out.groupby("q_id").size()
    assert len(per_q) == RAG_N_QUERIES
    assert (per_q <= RAG_TOP_K).all()
    assert ((out["score"] >= -1.0 - 1e-9) & (out["score"] <= 1.0 + 1e-9)).all()
