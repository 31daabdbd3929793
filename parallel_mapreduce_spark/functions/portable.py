"""Engine-portable 60-bit hash: identical value in Spark and DuckDB.

Several operators are hash-defined (MinHash permutations, SimHash token
hashes, LSH band hashes, hash-threshold sampling). With a JVM-only hash
(``xxhash64``) those queries can only get rows-only correctness checks,
because the DuckDB oracle cannot reproduce the hash. md5 is bit-identical in
every engine; the first 15 hex digits give a uniform, non-negative 60-bit
value that fits a BIGINT on both sides, so every hash-defined operator
becomes fully value-checkable against its SQL oracle.

At 100 TB the cost delta vs xxhash64 is real but bounded: md5 is still a
JVM intrinsic inside whole-stage codegen (no Python), evaluated once per
exploded row. Determinism across engines *and retries* is worth more than
the cycles — hash-defined sampling/dedup decisions must not depend on which
engine or task attempt computed them.

Spark and SQL forms must stay in lockstep:
  phash60(col)      == (PHASH60 SQL with the same input expression)
  concat_ws(":", a, b) on the Spark side pairs with `a || ':' || b` in SQL
  (both render integers in plain decimal).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`phash60` over a SQL expression string."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
