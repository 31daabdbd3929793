"""Unit tests for the corpus-cleaning trainprep operators on synthetic
corpora with hand-computable truth (the DuckDB parity gate covers the
registered queries on the shipped tables; these pin the semantics)."""

from __future__ import annotations

import hashlib

from parallel_mapreduce_spark.functions.trainprep import (
    boilerplate_coverage,
    ingest_decisions,
    shard_manifest,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_coverage_flags_shared_spans(spark):
    # "a b c" appears in 4 docs -> boilerplate at df_min=4; everything else
    # is unique. Doc 3 is 50% boilerplate, docs 0-2 lower, doc 4 zero.
    rows = [
        (0, "a b c x0 y0 z0"),  # spans: "a b c","b c x0","c x0 y0","x0 y0 z0"
        (1, "a b c x1 y1 z1"),
        (2, "a b c x2 y2 z2"),
        (3, "a b c d"),  # spans: "a b c","b c d" -> ratio 0.5
        (4, "p q r s"),  # no shared span -> ratio 0.0
        (5, "one two"),  # < 3 tokens -> no row
    ]
    got = {
        r.doc_id: r
        for r in boilerplate_coverage(
            _docs(spark, rows), n_parts=4, df_min=4, flag_ratio=0.3
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}  # doc 5 has no spans
    assert got[3].n_spans == 2 and got[3].n_boilerplate == 1
    assert got[3].boilerplate_ratio == 0.5 and got[3].flagged
    assert got[0].n_spans == 4 and got[0].n_boilerplate == 1
    assert not got[0].flagged  # 0.25 < 0.3
    assert got[4].n_boilerplate == 0 and got[4].boilerplate_ratio == 0.0
    assert not got[4].flagged


def test_ingest_decisions_three_way(spark):
    corpus = _docs(spark, [(0, "in corpus"), (1, "also in corpus")])
    batch = _docs(
        spark,
        [
            (10, "fresh text"),  # ingest
            (11, "in corpus"),  # dup_of_corpus
            (12, "batch dup"),  # ingest (min doc_id of its group)
            (13, "batch dup"),  # dup_in_batch
            (14, "in corpus"),  # dup_of_corpus (both copies, not just one)
        ],
    )
    got = {r.doc_id: r.decision for r in ingest_decisions(batch, corpus).collect()}
    assert got == {
        10: "ingest",
        11: "dup_of_corpus",
        12: "ingest",
        13: "dup_in_batch",
        14: "dup_of_corpus",
    }


def _py_phash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_shard_manifest_deterministic_assignment(spark):
    rows = [(i, "w " * (i + 1)) for i in range(40)]  # doc i has i+1 tokens
    rows = [(i, t.strip()) for i, t in rows]
    out = shard_manifest(_docs(spark, rows), n_shards=4).collect()
    assert sum(r.n_docs for r in out) == 40
    assert sum(r.n_tokens for r in out) == sum(i + 1 for i in range(40))
    # Recompute the assignment driver-side: the engine hash must equal the
    # portable md5-60bit hash of the stringified doc_id.
    by_shard: dict[int, list[int]] = {}
    for i in range(40):
        h = _py_phash60(str(i))
        by_shard.setdefault(h % 4, []).append(h)
    for r in out:
        hs = by_shard[r.shard_id]
        assert r.n_docs == len(hs)
        assert r.min_h == min(hs) and r.max_h == max(hs)


def test_ingest_decisions_random_replay(spark):
    """Random batches/corpora: decisions must equal a driver-side replay of
    the spec (corpus text -> dup_of_corpus; else min-doc_id of the text's
    batch group ingests, the rest are dup_in_batch)."""
    import random

    rng = random.Random(11)
    texts = [f"text {i}" for i in range(12)]
    corpus_rows = [(i, rng.choice(texts)) for i in range(20)]
    batch_rows = [(100 + i, rng.choice(texts + ["only batch " + str(i % 4)]))
                  for i in range(30)]
    got = {
        r.doc_id: r.decision
        for r in ingest_decisions(
            _docs(spark, batch_rows), _docs(spark, corpus_rows)
        ).collect()
    }
    corpus_texts = {t for _, t in corpus_rows}
    first_seen: dict[str, int] = {}
    for doc_id, t in sorted(batch_rows):
        if t not in corpus_texts:
            first_seen.setdefault(t, doc_id)
    want = {
        doc_id: (
            "dup_of_corpus"
            if t in corpus_texts
            else ("ingest" if first_seen[t] == doc_id else "dup_in_batch")
        )
        for doc_id, t in batch_rows
    }
    assert got == want


# ---------------------------------------------------------------------------
# source_cap_sample: the two-phase salted quota must equal the naive
# single-window form ON A SOURCE WHERE STAGE 1 ACTUALLY BINDS — the
# shipped fixtures hold ~25/NSALT rows per salt bucket, under the CAP, so
# only this synthetic megasite exercises the stage-1 filter path.
# ---------------------------------------------------------------------------
def test_cap_per_source_two_phase_equals_single_window_under_skew(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.functions.trainprep import (
        SOURCE_CAP,
        SOURCE_CAP_NSALT,
        _cap_priority,
        cap_per_source,
    )

    # One megasite (200 rows: every salt bucket far exceeds the CAP) plus
    # a small site and an under-CAP site.
    rows = (
        [(i, "mega") for i in range(200)]
        + [(1000 + i, "tiny") for i in range(3)]
        + [(2000 + i, "exact") for i in range(SOURCE_CAP)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    # Sanity: stage 1 must bind (some mega bucket holds > CAP rows).
    bucket_sizes = (
        docs.withColumn(
            "salt",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("salt"), F.col("doc_id"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % SOURCE_CAP_NSALT,
        )
        .groupBy("source", "salt").count()
        .filter(F.col("source") == "mega")
        .agg(F.max("count")).first()[0]
    )
    assert bucket_sizes > SOURCE_CAP

    got = {
        (r.source, r.doc_id)
        for r in cap_per_source(docs).select("source", "doc_id").collect()
    }
    naive = docs.withColumn("pri", _cap_priority()).withColumn(
        "rn", F.row_number().over(
            W.partitionBy("source").orderBy("pri", "doc_id")
        ),
    ).filter(F.col("rn") <= SOURCE_CAP)
    want = {(r.source, r.doc_id) for r in naive.select("source", "doc_id").collect()}
    assert got == want
    per_source = {}
    for s, _ in got:
        per_source[s] = per_source.get(s, 0) + 1
    assert per_source == {"mega": SOURCE_CAP, "tiny": 3, "exact": SOURCE_CAP}
