"""Property tests for the training-prep operators (hypothesis-style
replay checks on generated inputs, complementing the DuckDB parity gate)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_mapreduce_spark.functions.trainprep import PACK_CAPACITY_TOKENS


def test_seq_pack_matches_sequential_replay(spark):
    """Pack ids/offsets must equal a driver-side sequential replay of the
    contiguous-fill algorithm, per source, in doc_id order."""
    import random

    rng = random.Random(7)
    rows = [
        (i, f"src{i % 3}", rng.randint(0, 2 * PACK_CAPACITY_TOKENS))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    got = {
        r.doc_id: (r.pack_id, r.tok_offset)
        for r in df.select(
            "doc_id",
            (before / F.lit(PACK_CAPACITY_TOKENS)).cast("long").alias("pack_id"),
            (before % PACK_CAPACITY_TOKENS).alias("tok_offset"),
        ).collect()
    }

    # sequential replay
    want = {}
    cum: dict[str, int] = {}
    for doc_id, source, n in sorted(rows):
        c = cum.get(source, 0)
        want[doc_id] = (c // PACK_CAPACITY_TOKENS, c % PACK_CAPACITY_TOKENS)
        cum[source] = c + n
    assert got == want
