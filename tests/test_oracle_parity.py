"""Local replica of the driver's correctness gate (at sf0.001 for speed).

For every registered query with an oracle: run the Spark plan and the DuckDB
SQL on the same parquet tables and compare row count, column names, and values
order-insensitively — stricter than the driver's hash (explicit tolerance on
floats so a true mismatch produces a readable diff, not a hash delta).
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


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    got = spec.fn(spark, sf_dir).toPandas()
    want = duck.sql(spec.oracle).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"

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
