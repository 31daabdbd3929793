"""Similarity search quality: ANN recall vs brute force; vector math sanity."""

from __future__ import annotations


def test_ann_results_subset_of_bucket_and_scored_like_brute(spark, sf_dir):
    from parallel_mapreduce_spark.functions.similarity import ann_lsh_topk, cosine_topk

    brute = {
        (r.q_id, r.c_id): r.cosine for r in cosine_topk(spark, sf_dir).collect()
    }
    ann = {(r.q_id, r.c_id): r.cosine for r in ann_lsh_topk(spark, sf_dir).collect()}
    assert ann, "ANN should return neighbors"
    # Scores for pairs found by both paths must be identical (same math).
    common = set(brute) & set(ann)
    for pair in common:
        assert abs(brute[pair] - ann[pair]) < 1e-9
    # LSH bucketing should still find a meaningful share of true neighbors.
    recall = len(common) / len(brute)
    assert recall >= 0.2, f"ANN recall {recall:.2f}"


def test_topk_scores_are_sorted_and_bounded(spark, sf_dir):
    from parallel_mapreduce_spark.functions.similarity import TOP_K, cosine_topk

    rows = cosine_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.cosine)
        assert -1.0001 <= r.cosine <= 1.0001
    for q, scores in by_q.items():
        assert len(scores) == TOP_K
        assert scores == sorted(scores, reverse=True)


def test_neardup_threshold_respected(spark, sf_dir):
    from parallel_mapreduce_spark.functions.similarity import (
        EMB_DEDUP_THRESHOLD,
        emb_neardup_pairs,
    )

    for r in emb_neardup_pairs(spark, sf_dir).collect():
        assert r.cosine >= EMB_DEDUP_THRESHOLD
        assert r.id_a < r.id_b


def test_ivf_results_scored_like_brute_with_meaningful_recall(spark, sf_dir):
    from parallel_mapreduce_spark.functions.similarity import (
        TOP_K,
        ann_ivf_topk,
        cosine_topk,
    )

    brute = {(r.q_id, r.c_id): r.cosine for r in cosine_topk(spark, sf_dir).collect()}
    ivf_rows = ann_ivf_topk(spark, sf_dir).collect()
    ivf = {(r.q_id, r.c_id): r.cosine for r in ivf_rows}
    assert ivf, "IVF should return neighbors"
    by_q = {}
    for r in ivf_rows:
        by_q.setdefault(r.q_id, []).append(r.cosine)
    for scores in by_q.values():
        assert len(scores) <= TOP_K
        assert scores == sorted(scores, reverse=True)
    common = set(brute) & set(ivf)
    for pair in common:
        assert abs(brute[pair] - ivf[pair]) < 1e-9
    recall = len(common) / len(brute)
    assert recall >= 0.2, f"IVF recall {recall:.2f}"


def test_emb_lsh_pairs_subset_of_exact_with_same_scores(spark, sf_dir):
    from parallel_mapreduce_spark.functions.similarity import (
        EMB_DEDUP_MAX_ID,
        EMB_DEDUP_THRESHOLD,
        emb_neardup_lsh_pairs,
        emb_neardup_pairs,
    )

    exact = {
        (r.id_a, r.id_b): r.cosine for r in emb_neardup_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in emb_neardup_lsh_pairs(spark, sf_dir).collect()
    }
    for (ia, ib), c in lsh.items():
        assert ia < ib
        assert c >= EMB_DEDUP_THRESHOLD
        # Within the exact query's id range, every LSH hit must be an exact
        # hit with the identical score (same math).
        if ib < EMB_DEDUP_MAX_ID:
            assert (ia, ib) in exact and abs(exact[(ia, ib)] - c) < 1e-9


def test_embedding_dim_matches_build_constant(spark, sf_dir):
    """EMB_DIM is baked into the LSH/IVF oracle SQL as plane literals AND
    used by the Spark plans (no runtime .first() probe); the corpus must
    actually have that dimension."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.functions.similarity import EMB_DIM
    from parallel_mapreduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dims = [r.d for r in emb.select(F.size("embedding").alias("d")).distinct().collect()]
    assert dims == [EMB_DIM]


def test_lsh_plan_build_triggers_no_extra_spark_job(spark, sf_dir):
    """Constructing an LSH query plan must not run Spark jobs beyond the
    parquet-footer schema read that ANY load_table call costs (the old
    .first() dim probe added a collect job on top of it)."""
    from parallel_mapreduce_spark.functions.similarity import (
        ann_lsh_topk,
        emb_neardup_lsh_pairs,
    )
    from parallel_mapreduce_spark.sources import load_table

    sc = spark.sparkContext

    def jobs_during(label, fn):
        sc.setJobGroup(label, label)
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(list(sc.statusTracker().getJobIdsForGroup(label)))

    baseline = jobs_during("probe-base", lambda: load_table(spark, sf_dir, "embeddings"))
    assert jobs_during("probe-ann", lambda: ann_lsh_topk(spark, sf_dir)) <= baseline
    assert (
        jobs_during("probe-embnd", lambda: emb_neardup_lsh_pairs(spark, sf_dir))
        <= baseline
    )


def test_embedding_dispersion_known_geometry(spark):
    """Hand-computable geometry: source A = two opposite unit vectors
    (centroid at origin, every distance exactly 1); source B = one vector
    (dispersion 0)."""
    from parallel_mapreduce_spark.functions.similarity import (
        embedding_dispersion,
    )

    docs = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "B")], "doc_id long, source string"
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.source: r for r in embedding_dispersion(docs, emb).collect()}
    assert got["A"].n_docs == 2
    assert got["A"].mean_dist == 1.0 and got["A"].max_dist == 1.0
    assert got["B"].n_docs == 1
    assert got["B"].mean_dist == 0.0 and got["B"].max_dist == 0.0


def test_sq_rerank_recall_vs_brute(spark, sf_dir):
    """int8 scalar quantization + exact rerank should recover nearly all of
    the true top-k: the approx phase only has to land the true neighbors
    inside the SQ_OVERFETCH cut, and 8-bit dot products rank far more
    finely than that."""
    from parallel_mapreduce_spark.functions.similarity import ann_sq_topk, cosine_topk

    brute = {
        (r.q_id, r.c_id): r.cosine for r in cosine_topk(spark, sf_dir).collect()
    }
    sq = {(r.q_id, r.c_id): r.cosine for r in ann_sq_topk(spark, sf_dir).collect()}
    assert sq, "SQ rerank should return neighbors"
    common = set(brute) & set(sq)
    # Reranked scores are full-precision — identical math to brute force.
    for pair in common:
        assert abs(brute[pair] - sq[pair]) < 1e-9
    recall = len(common) / len(brute)
    assert recall >= 0.9, f"SQ rerank recall {recall:.2f}"


def test_clustered_recall_matrix_gates_quantization_quality(spark, sf_dir):
    """On the product-clustered fixture a CORRECT PQ implementation must
    recover recall far above chance (a wrong ADC table or codebook
    scrambles cluster ordering and collapses toward k/N ~ 0.003-0.01):
    the floors are the committed quality gate, at every SF."""
    from parallel_mapreduce_spark.functions.similarity import (
        CLUST_IVF_FLOOR,
        CLUST_IVFPQ_FLOOR,
        CLUST_IVFPQ_RERANK_FLOOR,
        CLUST_LSH_FLOOR,
        CLUST_PQ_FLOOR,
        CLUST_SQ_FLOOR,
        ann_recall_matrix_clustered,
    )

    out = ann_recall_matrix_clustered(spark, sf_dir).toPandas()
    rows = {r.index_name: r for r in out.itertuples()}
    assert set(rows) == {
        "pq_adc", "ivf_pq", "ivf_pq_rerank", "lsh", "sq_int8", "ivf",
    }
    assert rows["pq_adc"].mean_recall >= CLUST_PQ_FLOOR
    assert rows["ivf_pq"].mean_recall >= CLUST_IVFPQ_FLOOR
    assert rows["lsh"].mean_recall >= CLUST_LSH_FLOOR
    assert rows["sq_int8"].mean_recall >= CLUST_SQ_FLOOR
    assert rows["ivf"].mean_recall >= CLUST_IVF_FLOOR
    # The exact-rerank composition must beat the pure ADC ranking AND
    # clear its own (higher) floor — refine buys back quantization loss.
    assert rows["ivf_pq_rerank"].mean_recall >= CLUST_IVFPQ_RERANK_FLOOR
    assert (
        rows["ivf_pq_rerank"].mean_recall >= rows["ivf_pq"].mean_recall
    )
    assert out.beats_floor.all()
    # and the isotropic matrix stays the documented honest floor: the
    # clustered fixture must be the thing that separates the two.
    assert rows["pq_adc"].mean_recall >= 10 * (5.0 / 490)


def test_clustered_fixture_is_product_structured(spark, sf_dir):
    """Fixture sanity: every vector sits within noise of its cluster's
    per-subspace centers, and the PQ seed vectors cover all PQ_K center
    values in every subspace (what makes one Lloyd step recover the
    codebook)."""
    from parallel_mapreduce_spark.functions.similarity import (
        CLUST_P,
        EMB_DIM,
        PQ_K,
        PQ_SUBDIM,
        N_QUERY_VECS,
        _clustered_vecs,
    )

    rows = _clustered_vecs(spark, sf_dir).limit(600).collect()
    pset = set(CLUST_P)
    seed_digits = {}
    for r in rows:
        assert len(r.e) == EMB_DIM
        digs = []
        for s in range(EMB_DIM // PQ_SUBDIM):
            sub = r.e[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            # every element within the +/-0.1 noise bound of one center
            cands = {p for p in pset if all(abs(x - p) <= 0.1001 for x in sub)}
            assert len(cands) == 1, (r.vec_id, s, sub[:3])
            digs.append(CLUST_P.index(next(iter(cands))))
        if N_QUERY_VECS <= r.vec_id < N_QUERY_VECS + PQ_K:
            seed_digits[r.vec_id] = digs
    assert sorted(seed_digits) == [
        N_QUERY_VECS + j for j in range(PQ_K)
    ]
    for j in range(PQ_K):
        assert seed_digits[N_QUERY_VECS + j] == [j] * (EMB_DIM // PQ_SUBDIM)


def test_brp_parity_mllib_finds_all_close_pairs(spark, sf_dir):
    """MLlib's BucketedRandomProjectionLSH (frozen seed, 12 OR-ed tables
    at bucketLength 10 >> the 1.6 max close-pair distance) must surface
    every same-cluster pair of the bounded slice; the portable
    hyperplane LSH is allowed honest sign-flip misses but must stay a
    near-complete index on this geometry."""
    from parallel_mapreduce_spark.functions.similarity import (
        BRP_D2,
        mllib_brp_lsh_parity_pairs,
    )

    out = mllib_brp_lsh_parity_pairs(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.d2 <= BRP_D2).all()
    assert out.in_mllib.all(), out[~out.in_mllib]
    assert out.in_cosine_lsh.mean() >= 0.9


# --- JL projection distortion (round 10, session 3) -----------------------
def test_jl_distortion_concentrates_with_k(spark, sf_dir):
    """The JL lemma's shape: higher target dimension -> tighter ratio
    concentration. Also the regression pin for the sign matrix: the
    rejected lattice signs read within-20% ~0.2 AT EVERY k with max
    ratios ~6 — iid-quality signs must beat that decisively at k=32."""
    from parallel_mapreduce_spark.functions.similarity import (
        JL_DIMS,
        jl_projection_distortion,
    )

    t = (
        jl_projection_distortion(spark, sf_dir)
        .toPandas()
        .sort_values("k_dim")
        .reset_index(drop=True)
    )
    assert t["k_dim"].tolist() == sorted(JL_DIMS)
    assert (t["n_pairs"] == t["n_pairs"].iloc[0]).all()
    assert t["frac_within_20pct"].is_monotonic_increasing
    assert t["frac_within_20pct"].iloc[-1] > 0.5
    assert t["max_ratio"].iloc[-1] < 3.0
    assert (t["mean_ratio"] - 1.0).abs().max() < 0.15


# --- multi-probe LSH (round 10, session 3) --------------------------------
def test_multiprobe_beats_single_probe_at_equal_storage(spark, sf_dir):
    """The point of multi-probe: at ONE table of index state, probing the
    1-bit-flip buckets must strictly widen the candidate set (and never
    lose the base bucket's candidates). Compared against the base-bucket-
    only restriction of the same table."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.functions.similarity import (
        MP_PROBE_MASKS,
        N_PLANES,
        _mp_topk_frame,
        ann_multiprobe_recall_at_k,
    )

    assert MP_PROBE_MASKS[0] == 0 and len(MP_PROBE_MASKS) == N_PLANES + 1
    assert len(set(MP_PROBE_MASKS)) == len(MP_PROBE_MASKS)
    topk = _mp_topk_frame(spark, sf_dir).toPandas()
    assert (topk.groupby("q_id").size() <= 5).all()
    rec = ann_multiprobe_recall_at_k(spark, sf_dir).toPandas()
    assert len(rec) == 10
    assert (rec["n_hit"] <= rec["k_exact"]).all()
    # multi-probe must find SOMETHING for most queries at one table
    assert (rec["recall"] > 0).sum() >= 7


def test_filtered_search_prefilter_dominates(spark, sf_dir):
    """Structural pins for the round-11 filtered-search family: every
    result satisfies the predicate, prefilter always returns a full k,
    postfilter at overfetch 1 starves, and prefilter recall dominates
    both postfilter variants (it ranks over exactly the eligible set)."""
    from parallel_mapreduce_spark.functions.similarity import (
        FLT_OVERFETCH,
        FLT_SOURCES,
        N_QUERY_VECS,
        TOP_K,
        ann_filtered_recall_at_k,
        ann_filtered_topk,
    )

    topk = ann_filtered_topk(spark, sf_dir).toPandas()
    assert set(topk["source"].unique()) <= set(FLT_SOURCES)
    assert (topk.groupby("q_id").size() <= TOP_K).all()
    assert topk["q_id"].nunique() == N_QUERY_VECS

    rec = (
        ann_filtered_recall_at_k(spark, sf_dir)
        .toPandas()
        .set_index("variant")
    )
    pre = rec.loc["prefilter"]
    p1 = rec.loc["postfilter_of1"]
    p4 = rec.loc[f"postfilter_of{FLT_OVERFETCH}"]
    assert pre["n_results"] == N_QUERY_VECS * TOP_K, (
        "prefilter must always fill k (eligible candidates exist in the "
        "probed cells at every test SF)"
    )
    assert p1["n_results"] < pre["n_results"], "of1 starvation not visible"
    assert pre["recall"] >= p4["recall"] >= p1["recall"]
