"""Word-count differential test on the reference's own fixture (bee.txt).

The reference's only data file is the Bee Movie script; SURVEY.md §5.1
measured golden counts from the reference binary *under its buggy tokenizer*
(line-abort on empty token, src/main.c:20-21). Our engine implements the
intended semantics (split on whitespace, drop empties; SURVEY.md §2.4), so
the assertion is differential: Spark's counts must equal an independent
pure-Python tokenization of the same file, and the known golden keys must
match where the reference bug doesn't bite (tokens on clean lines).
"""

from __future__ import annotations

import collections
import os

import pytest

BEE = "/root/reference/bee.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(BEE), reason="fixture absent")


def _python_counts() -> dict[str, int]:
    import re

    counts: collections.Counter[str] = collections.Counter()
    with open(BEE, encoding="utf-8", errors="replace") as f:
        for line in f:
            counts.update(
                t for t in re.split(r"[ \t\r]+", line.rstrip("\n")) if t
            )
    return dict(counts)


def test_wordcount_matches_independent_tokenizer(spark):
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.sources import read_text_lines

    lines = read_text_lines(spark, BEE)
    toks = F.filter(
        F.split(F.col("value"), "[ \\t\\r]+"), lambda t: t != F.lit("")
    )
    counts = (
        lines.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = {r.word: r.cnt for r in counts.collect()}
    want = _python_counts()
    assert got == want


def test_golden_keys_from_survey(spark):
    """Intended-semantics counts for the survey's golden words (these words
    never follow an empty token mid-line, so buggy and intended semantics
    agree on them — SURVEY.md §5.1: the=516, Barry=89, honey=38, bee=35,
    flowers=11)."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.sources import read_text_lines

    lines = read_text_lines(spark, BEE)
    toks = F.filter(
        F.split(F.col("value"), "[ \\t\\r]+"), lambda t: t != F.lit("")
    )
    counts = {
        r.word: r.cnt
        for r in lines.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("word").isin("the", "Barry", "honey", "bee", "flowers"))
        .collect()
    }
    assert counts["the"] == 516
    assert counts["Barry"] == 89
    assert counts["honey"] == 38
    assert counts["bee"] == 35
    assert counts["flowers"] == 11


def test_stratified_sample_fractions_and_determinism(spark, sf_dir):
    from parallel_mapreduce_spark.functions.text import (
        SAMPLE_FRACTIONS,
        stratified_sample_docs,
    )
    from parallel_mapreduce_spark.sources import load_table

    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    a = stratified_sample_docs(spark, sf_dir).collect()
    b = stratified_sample_docs(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded => stable
    by_lang = {}
    for r in a:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    # Only requested strata appear; observed fraction within Bernoulli noise.
    assert set(by_lang) <= set(SAMPLE_FRACTIONS)
    for lang, frac in SAMPLE_FRACTIONS.items():
        n, k = totals.get(lang, 0), by_lang.get(lang, 0)
        if n >= 50:
            sd = (n * frac * (1 - frac)) ** 0.5
            assert abs(k - n * frac) <= 5 * sd, (lang, k, n)


def test_repetition_metrics_hand_computed(spark):
    """Pin the repetition-share semantics on handcrafted docs (the
    sf-scaled oracle can't isolate single-doc arithmetic):
    - 'x y x y x y': bigrams [xy yx xy yx xy] -> top2 = 3/5; trigrams
      [xyx yxy xyx yxy] all duplicated -> dup3 = 4/4.
    - 'a b c d e': no repeats -> top2 = 1/4, dup3 = 0.
    - 'a a a': bigrams [aa aa] -> top2 = 2/2; trigrams [aaa] occurs once
      -> dup3 = 0 (a single instance is not a repetition).
    - 'a b': fewer than 3 tokens -> dropped entirely.
    """
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.functions.text import (
        repetition_metrics,
        tokens,
    )

    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d e"), (3, "a a a"), (4, "a b")],
        "doc_id bigint, text string",
    ).select("doc_id", tokens("text").alias("toks"))
    got = {
        r["doc_id"]: (r["top2_share"], r["dup3_frac"])
        for r in repetition_metrics(df, "doc_id").collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (3 / 5, 1.0)
    assert got[2] == (1 / 4, 0.0)
    assert got[3] == (2 / 2, 0.0)
