"""S1/S2/A4: bounded HTTP collector with injectable transport
(FIXTURES.md §4 — Binance-shaped snapshots, no live network)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from azure_etl_spark.operators.filters import filter_isin
from azure_etl_spark.sources.http import collect_snapshots, ingest_http

SYMBOLS = ["BTCUSDT", "ADAUSDT", "ETHUSDT", "BNBUSDT", "LTCUSDT"]


def fake_binance_transport(n_snapshots: int = 3):
    """Deterministic jittered snapshots shaped like the Binance payload."""
    state = {"i": 0}

    def fetch() -> str:
        i = state["i"]
        state["i"] += 1
        rows = [
            {"symbol": s, "price": f"{1000 + 7 * j + i:.2f}"}
            for j, s in enumerate(SYMBOLS + ["DOGEUSDT"])
        ]
        return json.dumps(rows)

    return fetch


def test_collect_respects_window_deadline():
    t = [0.0]

    def clock():
        t[0] += 60.0
        return t[0]

    snaps = collect_snapshots(fake_binance_transport(), window_s=180, clock=clock)
    # deadline semantics of etl-vini-azure.py:70: polls until now-start > window
    assert 2 <= len(snaps) <= 4
    assert all(len(s) == 6 for s in snaps)


def test_ingest_filter_dedup_sort(spark):
    df = ingest_http(
        spark, fake_binance_transport(), window_s=60, max_snapshots=3
    )
    assert df.columns == ["symbol", "price"]
    kept = filter_isin(df, "symbol", SYMBOLS)  # P1: drop DOGEUSDT
    assert kept.select("symbol").distinct().count() == 5
    # micro-batches unioned: 3 snapshots x 6 symbols, 1 row dropped each
    assert kept.count() == 15
    agg = kept.groupBy("symbol").agg(F.min("price").alias("lo"))
    assert agg.count() == 5
