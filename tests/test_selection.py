"""k-center greedy coreset selection (functions/selection.py, round 10).

Oracle parity is covered by test_oracle_parity.py; here the Gonzalez
invariants:
- the covering radius is strictly about the SELECTED set: non-increasing
  in pick rank, and every pick strictly reduces or holds it;
- picks are distinct, seeded at vec_id 0;
- each pick really is the farthest point: verified against a numpy
  replay of the full trajectory.
"""

from __future__ import annotations

import numpy as np

from parallel_mapreduce_spark.functions.selection import (
    KC_K,
    kcenter_coreset_select,
)


def _trajectory(spark, sf_dir):
    df = kcenter_coreset_select(spark, sf_dir).toPandas()
    return df.sort_values("sel_rank").reset_index(drop=True)


def test_shape_and_seed(spark, sf_dir):
    t = _trajectory(spark, sf_dir)
    assert len(t) == KC_K
    assert t["sel_rank"].tolist() == list(range(KC_K))
    assert t.loc[0, "center_id"] == 0
    assert t["center_id"].nunique() == KC_K


def test_radius_non_increasing(spark, sf_dir):
    r = _trajectory(spark, sf_dir)["radius"].tolist()
    assert all(a >= b for a, b in zip(r, r[1:]))
    assert r[-1] > 0  # corpus has no duplicate-of-seed collapse


def test_matches_numpy_replay(spark, sf_dir):
    import duckdb

    t = _trajectory(spark, sf_dir)
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).df()
    e = np.array(emb["embedding"].tolist(), dtype=np.float64)
    md = np.round(((e - e[0]) ** 2).sum(axis=1), 6)
    centers, radii = [0], [md.max()]
    for _ in range(KC_K - 1):
        # argmax with ties to the LOWER vec_id: argmax returns first max
        pick = int(np.argmax(md))
        d = np.round(((e - e[pick]) ** 2).sum(axis=1), 6)
        md = np.minimum(md, d)
        centers.append(pick)
        radii.append(md.max())
    assert t["center_id"].tolist() == centers
    np.testing.assert_allclose(t["radius"].to_numpy(), radii, rtol=1e-9)


def test_k_anonymity_lattice_monotone(spark, sf_dir):
    """Levels are strictly nested generalizations, so coarsening can only
    merge groups: min group size is non-decreasing, the below-k row mass
    and the group count are non-increasing."""
    from parallel_mapreduce_spark.operators.relational import (
        k_anonymity_generalization,
    )

    t = (
        k_anonymity_generalization(spark, sf_dir)
        .toPandas()
        .sort_values("gen_level")
        .reset_index(drop=True)
    )
    assert t["gen_level"].tolist() == [0, 1, 2, 3, 4]
    assert t["min_group_size"].is_monotonic_increasing
    mono_dec = lambda s: all(  # noqa: E731
        a >= b for a, b in zip(s, s[1:])
    )
    assert mono_dec(t["rows_below_k"].tolist())
    assert mono_dec(t["n_groups"].tolist())
    assert bool(t.iloc[-1]["k_anonymous"]), "region level must be releasable"
    assert (t["k_anonymous"] == (t["min_group_size"] >= 5)).all()


def test_pipeline_diverse_sample_gate_binds(spark, sf_dir):
    from parallel_mapreduce_spark.functions.selection import (
        PDS_K,
        PDS_MIN_TOKS,
        pipeline_diverse_sample,
    )

    t = (
        pipeline_diverse_sample(spark, sf_dir)
        .toPandas()
        .sort_values("sel_rank")
        .reset_index(drop=True)
    )
    assert len(t) == PDS_K
    assert (t["n_toks"] >= PDS_MIN_TOKS).all()
    r = t["radius"].tolist()
    assert all(a >= b for a, b in zip(r, r[1:]))
    # the gate must actually bind on this corpus: the unfiltered
    # trajectory seeds at vec_id 0; doc 0 is below the token gate at
    # sf0.001, so the seed differs (regression pin for a silent
    # gate-drop refactor)
    import duckdb

    n_below = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' WHERE"
        " len(list_filter(string_split(text, ' '), x -> x <> ''))"
        f" < {PDS_MIN_TOKS}"
    ).fetchone()[0]
    assert n_below > 0
    # diversity: k picks should span multiple sources on this corpus
    assert t["source"].nunique() >= 3
