"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas."""

from __future__ import annotations

import pytest


def test_extract_features_schema_and_determinism(spark, sf_dir):
    from parallel_mapreduce_spark.functions.multimodal import extract_features
    from parallel_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(docs)
    assert [f.name for f in feats.schema.fields] == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "channels",
        "sha_prefix",
    ]
    a = {r.doc_id: (r.width, r.height, r.channels, r.sha_prefix) for r in feats.collect()}
    b = {r.doc_id: (r.width, r.height, r.channels, r.sha_prefix) for r in feats.collect()}
    assert a == b  # deterministic fake decode
    assert len(a) == docs.count()


def test_feature_ranges(spark, sf_dir):
    from parallel_mapreduce_spark.functions.multimodal import extract_features
    from parallel_mapreduce_spark.sources import load_table

    for r in extract_features(load_table(spark, sf_dir, "documents")).collect():
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert 1 <= r.channels <= 3
        assert r.n_bytes > 0
        assert len(r.sha_prefix) == 8


def test_n_bytes_matches_builtin_path(spark, sf_dir):
    """The Pandas-UDF path and the pure-JVM metadata query must agree."""
    from parallel_mapreduce_spark.functions.multimodal import (
        extract_features,
        multimodal_meta,
    )
    from parallel_mapreduce_spark.sources import load_table

    udf_bytes = {
        r.doc_id: r.n_bytes
        for r in extract_features(load_table(spark, sf_dir, "documents")).collect()
    }
    jvm_bytes = {r.doc_id: r.n_bytes for r in multimodal_meta(spark, sf_dir).collect()}
    assert udf_bytes == jvm_bytes


def test_fake_decode_rejects_empty_payload():
    from parallel_mapreduce_spark.functions.multimodal import _fake_decode

    with pytest.raises(ValueError):
        _fake_decode(b"")


def test_frame_sample_counts(spark, sf_dir):
    from parallel_mapreduce_spark.functions.multimodal import frame_sample
    from parallel_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    rows = frame_sample(docs, every_n_bytes=64).collect()
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert len(per_doc) == 20
    assert all(n >= 1 for n in per_doc.values())
