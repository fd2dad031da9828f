"""Every oracle-backed query must match DuckDB exactly (the driver's
correctness gate, replicated locally at sf0.001): same row count, same
values under order-insensitive comparison with columns sorted by name.
"""

from __future__ import annotations

import decimal
import math

import pytest

from azure_etl_spark.plans.queries import QUERIES


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"{type(v).__name__}:{v}"


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column sets differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


NO_ORACLE = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_no_oracle_queries_run(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
