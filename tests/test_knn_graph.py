"""NN-Descent kNN-graph construction (functions/similarity.py, round 10).

The oracle-parity gate (test_oracle_parity.py) already replays both
queries value-for-value against DuckDB; these tests pin the STRUCTURAL
invariants the hash can't explain when it breaks:
- graph shape: K neighbors per node, no self edges, no duplicate edges;
- recall is non-decreasing across rounds (the keep-best update can only
  evict a true top-K member for a better-ranked edge, which is itself a
  true top-K member);
- the final-round floor holds with margin at the test SF;
- the LSH seed is already metric-aware (round-0 recall far above the
  ~K/N random-graph expectation).
"""

from __future__ import annotations

import pytest

from parallel_mapreduce_spark.functions import similarity as S


@pytest.fixture(scope="module")
def rounds(spark, sf_dir):
    return [b.toPandas() for b in S._knn_rounds(spark, sf_dir)]


@pytest.fixture(scope="module")
def curve(spark, sf_dir):
    df = S.knn_graph_recall_curve(spark, sf_dir).toPandas()
    return df.sort_values("rnd").reset_index(drop=True)


def test_graph_shape_every_round(rounds):
    for r, b in enumerate(rounds):
        assert (b["node"] != b["nbr"]).all(), "self edge"
        assert not b.duplicated(["node", "nbr"]).any(), "duplicate edge"
        per_node = b.groupby("node").size()
        assert (per_node <= S.KNN_K).all()
        if r == 0:
            # a node whose seed buckets are sparse can start under-K
            # (node 371 has 10 bucket candidates at sf0.001)
            assert (per_node >= 1).all()
        else:
            # one neighbor-of-neighbor expansion restores full degree
            assert (per_node == S.KNN_K).all()
        assert sorted(b["node"].unique()) == list(range(int(b["node"].max()) + 1))


def test_scores_are_rounded_and_ranked(rounds):
    final = rounds[-1]
    # 6-dp rounded: re-rounding is a no-op (up to float representation)
    assert (final["cos6"] - final["cos6"].round(6)).abs().max() < 1e-12
    top = final.sort_values(
        ["node", "cos6", "nbr"], ascending=[True, False, True]
    )
    assert (
        top.groupby("node")["cos6"].apply(lambda s: s.is_monotonic_decreasing)
    ).all()


def test_recall_monotone_and_floor(curve):
    rec = curve["recall"].tolist()
    assert rec == sorted(rec), "recall must be non-decreasing across rounds"
    assert curve["rnd"].tolist() == list(range(S.KNN_ITERS + 1))
    # churn: round 0 is all-new by definition; refinement churn shrinks
    assert (curve["n_new_edges"] <= curve["n_edges"]).all()
    assert curve.iloc[0]["n_new_edges"] == curve.iloc[0]["n_edges"]
    churn = curve["n_new_edges"].tolist()[1:]
    assert churn == sorted(churn, reverse=True), (
        "refinement churn should decrease as the graph converges"
    )
    final = curve.iloc[-1]
    assert final["floor_recall"] == S.KNN_FLOOR
    assert bool(final["beats_floor"])
    assert final["recall"] >= S.KNN_FLOOR + 0.05, "floor margin eroded"


def test_lsh_seed_is_metric_aware(curve):
    # A uniform random K-out graph would hit the true top-K at rate
    # ~K/(N-1) (< 0.03 at N=500). The LSH seed's round-0 recall must be
    # an order of magnitude above that or the seeding is broken.
    assert curve.iloc[0]["recall"] > 0.2


def test_truth_is_exact_topk(spark, sf_dir):
    # spot-check node 0's truth against a brute-force numpy recompute
    import numpy as np

    vecs = S._knn_vecs(spark, sf_dir)
    truth = S._knn_truth(spark, sf_dir, vecs).toPandas()
    assert (truth.groupby("node").size() == S.KNN_K).all()
    pdv = vecs.toPandas().sort_values("vec_id")
    e = np.array(pdv["e"].tolist())
    n = e / np.linalg.norm(e, axis=1, keepdims=True)
    sims = np.round(n[0] @ n.T, 6)
    sims[0] = -2.0
    expected = set(np.argsort(-sims, kind="stable")[: S.KNN_K].tolist())
    got = set(truth[truth["node"] == 0]["nbr"])
    assert got == expected


def test_incremental_ingest_shape(spark, sf_dir):
    df = S.knn_graph_incremental_ingest(spark, sf_dir).toPandas()
    new = df[df["kind"] == "new"]
    base = df[df["kind"] == "base"]
    is_batch = lambda s: s % S.KNN_BATCH_MOD == S.KNN_BATCH_RES  # noqa: E731
    # every batch node got a list; single-pass ingest scopes candidates
    # to the base graph, so 'new' neighbors are never batch nodes
    assert is_batch(new["node"]).all()
    assert not is_batch(new["nbr"]).any()
    assert (new.groupby("node")["rk"].max() <= S.KNN_K).all()
    import duckdb

    n_batch = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
        f" WHERE vec_id % {S.KNN_BATCH_MOD} = {S.KNN_BATCH_RES}"
    ).fetchone()[0]
    assert new["node"].nunique() == n_batch
    # the delta rows are base lists absorbing batch arrivals
    assert not is_batch(base["node"]).any()
    assert is_batch(base["nbr"]).all()
    assert (base["rk"] <= S.KNN_K).all()
    assert len(base) > 0, "no base list absorbed any arrival"
    # no self edges anywhere
    assert (df["node"] != df["nbr"]).all()
