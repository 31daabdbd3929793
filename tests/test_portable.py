"""Pin the engine-portable hash contract: Spark phash60 == DuckDB twin.

Every hash-defined operator's oracle (MinHash, SimHash, sampling) rests on
this equality; if it drifts, those oracles break silently at the driver.
"""

from __future__ import annotations

import duckdb

CASES = [
    "",
    " ",
    "abc",
    "the quick brown fox",
    "0:salted shingle text",
    "ünïcode — ascii以外の文字",
    "line\nbreak\ttab",
    "quote'and\"doublequote",
    "x" * 10_000,
    "1234567890",
    "éèê",  # accented
]


def test_phash60_matches_duckdb(spark):
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.functions.portable import phash60, phash60_sql

    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {r.s: r.h for r in df.select("s", phash60(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in CASES:
        want = con.execute(f"SELECT {phash60_sql('?')}", [s]).fetchone()[0]
        assert got[s] == want, repr(s)
        assert 0 <= want < 2**60


def test_phash60_uniformity_smoke(spark):
    """Low-bit balance over a numeric id range — guards against an
    accidental substring/endianness change that would skew bucketing."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.functions.portable import phash60

    n = 10_000
    df = spark.range(n).select(
        (phash60(F.col("id").cast("string")) % 2).alias("bit")
    )
    ones = df.agg(F.sum("bit")).first()[0]
    assert abs(ones - n / 2) < 5 * (n / 4) ** 0.5
