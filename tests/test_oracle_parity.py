"""Local replica of the driver's correctness gate (at sf0.001 for speed).

For every registered query with an oracle: run the Spark plan and the DuckDB
SQL on the same parquet tables and compare row count, column names, and values
order-insensitively. Values are compared with an explicit float tolerance so
a true mismatch produces a readable diff, not a hash delta — BUT the gate
also asserts per-column dtype-KIND equality, because the driver's hash
canonicalizes values as strings and ``3 == 3.0`` locally would mask a
``"3" != "3.0"`` driver failure. (Round 3 shipped exactly that bug: a
DuckDB windowed ``SUM(BIGINT)`` returned HUGEINT, pandas materialized it as
float64, every value compared equal here, and the driver hash-failed.
``test_hugeint_oracle_fails_kind_gate`` keeps the regression pinned.)
"""

from __future__ import annotations

import math

import pytest

from parallel_mapreduce_spark.registry import QUERIES, _load_all

_load_all()
ORACLE_CASES = sorted(name for name, spec in QUERIES.items() if spec.oracle)
ROWS_ONLY_CASES = sorted(name for name, spec in QUERIES.items() if not spec.oracle)


def _normalize(rows, columns):
    out = []
    for row in rows:
        norm = []
        for col in sorted(columns):
            v = row[col]
            if isinstance(v, float):
                v = round(v, 6)
            elif hasattr(v, "item"):  # numpy scalar
                v = v.item()
                if isinstance(v, float):
                    v = round(v, 6)
            norm.append(v)
        out.append(tuple(norm))
    out.sort(key=repr)
    return out


def _values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _column_kind(series) -> str | None:
    """Coarse dtype kind as the driver's string-canonical hash would see it:
    'int' vs 'float' vs 'bool' vs 'datetime' vs 'obj'. Object columns are
    classified by their first non-null Python value (catches HUGEINT
    materialized as object-of-ints, Decimal, etc.). All-null -> None
    (unknowable, skip)."""
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    non_null = series.dropna()
    if non_null.empty:
        return None
    v = non_null.iloc[0]
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return "obj"


def _kind_mismatches(got, want) -> list[tuple[str, str | None, str | None]]:
    out = []
    for col in got.columns:
        gk, wk = _column_kind(got[col]), _column_kind(want[col])
        if gk is None or wk is None:
            continue
        # Nullable-int promotion: a column with ANY null is float64 on both
        # pandas paths, so int-vs-float there is a real split, not noise.
        if gk != wk:
            out.append((col, gk, wk))
    return out


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    got = spec.fn(spark, sf_dir).toPandas()
    want = duck.sql(spec.oracle).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"

    kind_diffs = _kind_mismatches(got, want[got.columns])
    assert not kind_diffs, (
        f"{name}: dtype-kind split (engine vs oracle) {kind_diffs} — the "
        "driver hashes canonical strings, so int-vs-float fails there even "
        "when values compare equal here (cast the oracle, e.g. HUGEINT->BIGINT)"
    )

    got_rows = _normalize(got.to_dict("records"), got.columns)
    want_rows = _normalize(want.to_dict("records"), want.columns)
    mismatches = [
        (g, w)
        for g, w in zip(got_rows, want_rows)
        if not all(_values_close(x, y) for x, y in zip(g, w))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_hugeint_oracle_fails_kind_gate(duck):
    """Regression for the round-3 driver hash FAILs: an uncast DuckDB
    windowed SUM(BIGINT) yields HUGEINT -> pandas float64, which the old
    value-only comparison waved through (3 == 3.0) but the driver's
    string-canonical hash rejects ("3" != "3.0"). The kind gate must flag
    it; the CAST ... AS BIGINT form must pass."""
    hugeint = duck.sql(
        "SELECT SUM(x) OVER (ORDER BY x) AS s FROM (VALUES (1), (2)) t(x)"
    ).df()
    bigint = duck.sql(
        "SELECT CAST(SUM(x) OVER (ORDER BY x) AS BIGINT) AS s "
        "FROM (VALUES (1), (2)) t(x)"
    ).df()
    assert _kind_mismatches(bigint, hugeint) == [("s", "int", "float")]
    assert _kind_mismatches(bigint, bigint) == []
