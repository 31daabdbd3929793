"""Contract tests for the MapReduce veneer (SURVEY.md §2.4 semantics)."""

from __future__ import annotations

from parallel_mapreduce_spark.mr import djb2, mr_run_rdd


def _wc_map(line):
    return [(t, "1") for t in line.split(" ") if t]


def _count(key, values):
    return sum(1 for _ in values)


def test_djb2_matches_reference_algorithm():
    # hash = 5381; hash = hash * 33 + c  over bytes, 64-bit wrapping
    # (reference src/mapreduce.c:129-138). Independently computed values:
    h = 5381
    for b in b"bee":
        h = (h * 33 + b) % (1 << 64)
    assert djb2("bee") == h
    assert djb2("") == 5381


def test_djb2_signed_char_high_bytes():
    # The reference reads bytes via `int c = *key++` through a signed char*,
    # so UTF-8 continuation/lead bytes (>= 0x80) contribute NEGATIVE values.
    # Simulate the C loop exactly for a non-ASCII key:
    h = 5381
    for b in "café".encode("utf-8"):
        c = b - 256 if b >= 0x80 else b
        h = (h * 33 + c) % (1 << 64)
    assert djb2("café") == h
    # and it must differ from the unsigned-byte interpretation
    hu = 5381
    for b in "café".encode("utf-8"):
        hu = (hu * 33 + b) % (1 << 64)
    assert h != hu


def test_wordcount_via_veneer(spark):
    lines = spark.sparkContext.parallelize(
        ["the bee the", "  bee   movie ", "", "the"], 3
    )
    out = dict(mr_run_rdd(lines, _wc_map, _count, num_reducers=4).collect())
    assert out == {"the": 3, "bee": 2, "movie": 1}


def test_tokenizer_delimiter_class(spark):
    """The flagship mapper splits on the reference's full strtok class
    " \\t\\n\\r" (src/main.c:19), not just spaces — and ONLY that class:
    other Unicode whitespace (\\x0b, NBSP) is token content."""
    from parallel_mapreduce_spark.mr import _count_values, _tokenize_emit

    lines = spark.sparkContext.parallelize(
        ["the\tbee\rthe", " bee \t movie\r\n", "\t\r", "the\x0bend", "a b"], 3
    )
    out = dict(
        mr_run_rdd(lines, _tokenize_emit, _count_values, num_reducers=4).collect()
    )
    assert out == {"the": 2, "bee": 2, "movie": 1, "the\x0bend": 1, "a b": 1}


def test_keys_sorted_within_partition(spark):
    lines = spark.sparkContext.parallelize(["d c b a a c d b e f g"], 1)
    result = mr_run_rdd(lines, _wc_map, _count, num_reducers=3)
    for part in result.glom().collect():
        keys = [k for k, _ in part]
        assert keys == sorted(keys)  # ascending within partition (not global)


def test_partitioner_routes_keys(spark):
    lines = spark.sparkContext.parallelize(["a b c d e f"], 2)
    r = 4
    result = mr_run_rdd(lines, _wc_map, _count, num_reducers=r)
    parts = result.glom().collect()
    assert len(parts) == r
    for idx, part in enumerate(parts):
        for key, _ in part:
            assert djb2(key) % r == idx


def test_custom_partitioner(spark):
    lines = spark.sparkContext.parallelize(["a b c d"], 2)
    everything_to_zero = lambda key: 0  # noqa: E731
    parts = (
        mr_run_rdd(lines, _wc_map, _count, num_reducers=3, partitioner=everything_to_zero)
        .glom()
        .collect()
    )
    assert len(parts[0]) == 4 and not parts[1] and not parts[2]


def test_partition_count_invariance(spark):
    """Results identical for any reducer count (SURVEY.md §5.2 property)."""
    lines = spark.sparkContext.parallelize(
        ["x y z x y x", "w x", "y z w q"], 3
    )
    expected = {"x": 4, "y": 3, "z": 2, "w": 2, "q": 1}
    for r in (1, 2, 7, 100):
        out = dict(mr_run_rdd(lines, _wc_map, _count, num_reducers=r).collect())
        assert out == expected, f"num_reducers={r}"


def test_reducer_sees_value_stream(spark):
    """The value iterator streams all values of one key (Getter contract)."""
    lines = spark.sparkContext.parallelize(["k k k"], 1)

    def concat(key, values):
        return ",".join(values)

    out = dict(mr_run_rdd(lines, _wc_map, concat, num_reducers=2).collect())
    assert out == {"k": "1,1,1"}


def test_empty_input(spark):
    lines = spark.sparkContext.parallelize([], 2)
    assert mr_run_rdd(lines, _wc_map, _count, num_reducers=3).collect() == []


def test_mr_run_file_api_on_reference_fixture(spark):
    """MR_Run file surface end-to-end on the reference's own bee.txt: the
    veneer's counts must equal an independent pure-Python tokenization
    (intended semantics — the reference's line-abort bug is not replicated,
    SURVEY.md §2.4)."""
    import collections
    import os

    import pytest

    bee = "/root/reference/bee.txt"
    if not os.path.exists(bee):
        pytest.skip("fixture absent")

    from parallel_mapreduce_spark.mr import mr_run

    def map_fn(line):
        return [(t, "1") for t in line.split(" ") if t]

    def reduce_fn(key, values):
        return sum(1 for _ in values)

    got = dict(mr_run(spark, bee, map_fn, reduce_fn, num_reducers=4).collect())

    want: collections.Counter[str] = collections.Counter()
    with open(bee, encoding="utf-8", errors="replace") as f:
        for line in f:
            want.update(t for t in line.rstrip("\n").split(" ") if t)
    assert got == dict(want)
    # Reference golden keys (SURVEY.md §5.1) under intended semantics:
    assert got["Barry"] == 89 and got["bee"] == 35


def test_mr_run_multi_file_union_and_awkward_paths(spark, tmp_path):
    """D7 multi-file semantics: MR_Run over a file LIST word-counts the
    union; a path containing a comma must be loaded verbatim, not split
    (sc.textFile would comma-split; mr_run routes through the DataFrame
    text reader, which takes the path list as-is). Globs still expand per
    the standard Spark file-source convention."""
    from parallel_mapreduce_spark.mr import mr_run

    a = tmp_path / "part,one.txt"  # comma in the filename
    b = tmp_path / "part2.txt"
    a.write_text("the bee\nthe\n")
    b.write_text("bee movie\n")

    def map_fn(line):
        return [(t, "1") for t in line.split(" ") if t]

    def reduce_fn(key, values):
        return sum(1 for _ in values)

    got = dict(
        mr_run(
            spark, [str(a), str(b)], map_fn, reduce_fn, num_reducers=3
        ).collect()
    )
    assert got == {"the": 2, "bee": 2, "movie": 1}
