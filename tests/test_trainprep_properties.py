"""Property tests for the training-prep operators (hypothesis-style
replay checks on generated inputs, complementing the DuckDB parity gate)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_mapreduce_spark.functions.trainprep import PACK_CAPACITY_TOKENS


def test_seq_pack_matches_sequential_replay(spark):
    """Pack ids/offsets from the hierarchical prefix sum (_pack_prefix)
    must equal a driver-side sequential replay of the contiguous-fill
    algorithm, per source, in doc_id order — on a source-SKEWED corpus
    (one source is ~90% of docs, the case the per-shard decomposition
    exists for) and with a span small enough that every source crosses
    many shard boundaries, including shards where a source is absent."""
    import random

    rng = random.Random(7)
    rows = [
        (i, "big" if i % 10 else f"src{i % 3}",
         rng.randint(0, 2 * PACK_CAPACITY_TOKENS))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    from parallel_mapreduce_spark.functions.trainprep import _pack_prefix

    got = {
        r.doc_id: (r.pack_id, r.tok_offset)
        for r in _pack_prefix(df, span=64)
        .select(
            "doc_id",
            (F.col("before") / F.lit(PACK_CAPACITY_TOKENS))
            .cast("long")
            .alias("pack_id"),
            (F.col("before") % PACK_CAPACITY_TOKENS).alias("tok_offset"),
        )
        .collect()
    }

    # sequential replay
    want = {}
    cum: dict[str, int] = {}
    for doc_id, source, n in sorted(rows):
        c = cum.get(source, 0)
        want[doc_id] = (c // PACK_CAPACITY_TOKENS, c % PACK_CAPACITY_TOKENS)
        cum[source] = c + n
    assert got == want


def test_deletion_variant_candidates_complete_for_ed1():
    """The SymSpell completeness lemma behind fuzzy_name_pairs: any two
    strings at Levenshtein distance <= 1 share an entry of
    {word} ∪ {single-char deletions}. Checked exhaustively over random
    words and every single edit of them (substitution/insertion/deletion),
    including repeated-char and unicode cases."""
    import random

    def variants(w: str) -> set[str]:
        return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}

    rng = random.Random(11)
    alphabet = "abco0ü#"
    for _ in range(300):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 8))
        )
        edits = set()
        for i in range(len(w)):
            for c in alphabet:
                edits.add(w[:i] + c + w[i + 1 :])  # substitution
                edits.add(w[:i] + c + w[i:])  # insertion
            edits.add(w[:i] + w[i + 1 :])  # deletion
        for e in edits:
            assert variants(w) & variants(e), (w, e)


def test_chunk_documents_boundary_lengths(spark, tmp_path):
    """Chunk starts/lengths at the exact stride and capacity boundaries:
    n_tokens in {1, stride, stride+1, capacity, capacity+1, 2*stride,
    3*stride+5} must produce the replayed chunk grid, with full token
    coverage and the declared overlap."""
    from parallel_mapreduce_spark.functions.trainprep import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    sizes = [1, CHUNK_STRIDE, CHUNK_STRIDE + 1, CHUNK_TOKENS,
             CHUNK_TOKENS + 1, 2 * CHUNK_STRIDE, 3 * CHUNK_STRIDE + 5]
    rows = [
        (i, " ".join(f"t{j}" for j in range(n)), "xx", "src", n)
        for i, n in enumerate(sizes)
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    # register_views loads every table of the sf_dir; symlink the rest from
    # the smallest fixture so only `documents` carries the crafted rows.
    import os

    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")
    got = {}
    for r in chunk_documents(spark, out).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.start_tok, r.chunk_len))
    for doc_id, n in enumerate(sizes):
        starts = list(range(0, n, CHUNK_STRIDE))
        want = [
            (k, s, min(CHUNK_TOKENS, n - s)) for k, s in enumerate(starts)
        ]
        assert sorted(got[doc_id]) == want, (doc_id, n)
        # coverage: every token index falls in at least one chunk
        covered = set()
        for _, s, ln in want:
            covered.update(range(s, s + ln))
        assert covered == set(range(n))
