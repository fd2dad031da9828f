"""Guard against _finalize/oracle dtype drift.

``_finalize`` (plans/queries.py) casts every DECIMAL output column to
DOUBLE at the Spark driver boundary; each oracle SQL must do the same
(``_ORACLE_DOUBLE_COLS`` applies the cast at registration).  This test
DESCRIBEs every registered oracle in DuckDB and fails if any DECIMAL
column survives — the round-2 regression (31 stale DECIMAL oracles)
cannot recur silently.
"""

from __future__ import annotations

import pytest

from azure_etl_spark.plans.queries import _ORACLE_DOUBLE_COLS, QUERIES

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_emits_no_decimal(duck, name):
    desc = duck.sql(f"DESCRIBE ({QUERIES[name].oracle})").fetchall()
    decs = [c for c, t, *_ in desc if t.upper().startswith("DECIMAL")]
    assert not decs, (
        f"{name}: oracle emits DECIMAL columns {decs}; _finalize emits DOUBLE "
        f"on the Spark side — add the columns to _ORACLE_DOUBLE_COLS or cast "
        f"inline in the oracle SQL"
    )


def test_double_cols_map_has_no_stale_entries():
    stale = [n for n in _ORACLE_DOUBLE_COLS if n not in QUERIES or not QUERIES[n].oracle]
    assert not stale, f"_ORACLE_DOUBLE_COLS names unknown/oracle-less queries: {stale}"
