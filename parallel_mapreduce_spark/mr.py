"""MapReduce compatibility veneer: the reference's exact contract on RDDs.

The reference's whole public API is three functions (``src/mapreduce.h:47-54``):
``MR_Emit``, ``MR_DefaultHashPartition`` (djb2), and ``MR_Run(files, map_fn,
num_mappers, reduce_fn, num_reducers, partitioner)``. This module reproduces
that contract Spark-side (SURVEY.md §1.2 "decision", §7 step 2):

- ``flatMap`` = the Mapper + MR_Emit stream (``src/mapreduce.c:110-125``);
- ``repartitionAndSortWithinPartitions`` = hash shuffle + per-partition key
  sort (``src/mapreduce.c:110-138`` + ``150-160``), with the partitioner
  pluggable exactly like the reference's ``Partitioner`` slot
  (``src/mapreduce.h:14``), defaulting to a faithful djb2 reimplementation;
- a sorted-run walk in ``mapPartitions`` = the grouped reduce dispatch with a
  single-pass value iterator (``src/mapreduce.c:215-238`` + the Getter at
  ``89-107``).

Faithful semantics preserved (SURVEY.md §2.4): keys sorted ascending
byte-lexicographically *within* a partition (not globally); value order within
a key unspecified; empty partitions get no reducer call; the value iterator is
single-pass. Known reference bugs (tokenizer line-abort, wave-scheduler file
loss, >100-reducer overflow) are intentionally NOT replicated.

API deviation, by design: the Python ``reduce_fn(key, values_iter) -> value``
replaces the C ``Reducer(key, Getter, partition)`` callback triple — the
iterator contract is identical, the calling convention is Pythonic.

This veneer is the *fidelity* layer. The production path for the same
computations is the DataFrame surface (``operators/``, ``functions/``), where
Catalyst adds partial aggregation — the asymptotic win the reference lacks.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable, Iterator
from itertools import groupby
from typing import Any

from pyspark import RDD
from pyspark.sql import DataFrame, SparkSession

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources import load_table

MASK64 = (1 << 64) - 1


def djb2(key: str) -> int:
    """The reference's default partitioner hash (``src/mapreduce.c:129-138``):
    ``hash = hash * 33 + c`` over the key's bytes, in C unsigned-long (64-bit
    wrapping) arithmetic. The C loop reads ``int c = *key++`` through a plain
    ``char*`` — signed char on the common ABIs — so bytes >= 0x80 contribute
    their *negative* two's-complement value. Mirrored here (``b - 256`` for
    high bytes) so partition routing matches the reference for non-ASCII
    keys too, not just ASCII."""
    h = 5381
    for b in key.encode("utf-8"):
        c = b - 256 if b >= 0x80 else b
        h = (h * 33 + c) & MASK64
    return h


def mr_run_rdd(
    pairs_source: RDD,
    map_fn: Callable[[Any], Iterable[tuple[str, str]]],
    reduce_fn: Callable[[str, Iterator[str]], Any],
    num_reducers: int,
    partitioner: Callable[[str], int] | None = None,
) -> RDD:
    """One MapReduce round over an arbitrary input RDD.

    ``map_fn(record) -> iterable[(key, value)]`` (the Mapper + its MR_Emit
    calls); ``reduce_fn(key, values_iterator) -> result`` is invoked once per
    distinct key per partition, keys in ascending order within the partition.
    Returns an RDD of ``(key, result)`` with ``num_reducers`` partitions.
    """
    from parallel_mapreduce_spark.session import ensure_package_on_workers

    ensure_package_on_workers(pairs_source.context)
    if partitioner is None:
        partitioner = djb2
    shuffled = pairs_source.flatMap(map_fn).repartitionAndSortWithinPartitions(
        numPartitions=num_reducers,
        partitionFunc=partitioner,  # applied as partitioner(key) % numPartitions
        ascending=True,
    )

    def reduce_partition(part: Iterator[tuple[str, str]]) -> Iterator[tuple[str, Any]]:
        # The prev-dedupe walk of reducePartition (src/mapreduce.c:226-233),
        # minus its `prev = " "` sentinel bug (§2.4 bug 5): groupby handles
        # any first key, including a literal space.
        for key, kvs in groupby(part, key=lambda kv: kv[0]):
            yield key, reduce_fn(key, (v for _, v in kvs))

    return shuffled.mapPartitions(reduce_partition, preservesPartitioning=True)


def mr_run(
    spark: SparkSession,
    files: list[str] | str,
    map_fn: Callable[[str], Iterable[tuple[str, str]]],
    reduce_fn: Callable[[str, Iterator[str]], Any],
    num_reducers: int,
    partitioner: Callable[[str], int] = djb2,
) -> RDD:
    """``MR_Run`` over text files: ``map_fn`` is called per line (Spark's task
    scheduler replaces the reference's one-thread-per-file wave logic,
    ``src/mapreduce.c:181-212``; multi-file union semantics as in D7)."""
    if isinstance(files, str):
        files = [files]
    # Load via the DataFrame text reader, which takes the path LIST verbatim:
    # sc.textFile comma-splits its path string at the Hadoop layer (even a
    # single path), so "part,one.txt" would silently become two lookups.
    # Globs in individual paths still expand — the standard Spark file-source
    # convention, same as the reference's shell-expanded argv.
    lines = spark.read.text(files).rdd.map(lambda r: r[0])
    return mr_run_rdd(lines, map_fn, reduce_fn, num_reducers, partitioner)


# --------------------------------------------------------------------------
# The reference's flagship application, run through the veneer: word count
# (main.c:10-40). Tokenization here is the reference's strtok class
# " \t\n\r" (widened in round 5 for fidelity); the DataFrame wordcount's
# shared tokens()/_SQL_TOKS deliberately stay space-only — that is the
# engine's documented corpus tokenization, used by dozens of oracles. The
# two surfaces therefore agree on space-delimited text (all current
# testdata) and are EACH value-checked against their own matching DuckDB
# oracle; they are not defined to agree on tab/CR-bearing documents.
# --------------------------------------------------------------------------
# The reference's strtok delimiter set (src/main.c:19). A compiled regex
# split runs at C speed on the per-line RDD hot path; the explicit
# 4-char class does NOT widen to Unicode whitespace (\x0b/\x0c/NBSP stay
# token content), unlike str.split() with no argument.
_DELIM_RE = re.compile("[ \t\n\r]+")


def _tokenize_emit(line: str) -> list[tuple[str, str]]:
    # Intended semantics of the reference Mapper (src/main.c:17-23): strtok
    # on the " \t\n\r" class, drop empty tokens, emit (token, "1"). The
    # line-abort bug at src/main.c:20-21 is deliberately not replicated
    # (SURVEY.md §2.4).
    return [(t, "1") for t in _DELIM_RE.split(line) if t]


def _count_values(key: str, values: Iterator[str]) -> int:
    # The reference Reducer (src/main.c:30-40): count the value stream.
    return sum(1 for _ in values)


@query(
    "mr_wordcount",
    # regex class = the same " \t\n\r" strtok set (real tab/newline/CR chars
    # embedded in the SQL literal — DuckDB '...' literals don't process
    # backslash escapes, so the Python escapes must resolve before DuckDB).
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(list_filter(
              string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS word
          FROM documents)
    GROUP BY word
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = load_table(spark, sf_dir, "documents").select("text").rdd.map(lambda r: r[0])
    counted = mr_run_rdd(lines, _tokenize_emit, _count_values, num_reducers=8)
    return spark.createDataFrame(counted, "word string, cnt bigint")
