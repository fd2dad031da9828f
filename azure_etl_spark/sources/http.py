"""S1/S2: bounded HTTP JSON collector -> DataFrame.

The reference's extract polls the Binance ticker REST endpoint in a
while-loop for 180 s and buffers rows in pandas
(`k8s/dags/etl-vini-azure.py:32,61-75`). Spark has no native HTTP
source, so the engine keeps the collector driver-side (the payload is a
full snapshot of ~2k tickers — KBs, not a distributed concern) and makes
the *transport injectable* so tests never hit the network (FIXTURES.md §4).

The moment data lands it becomes a DataFrame and everything downstream
(filter/dedup/agg/sinks) is distributed. For a continuous variant see
streaming/collector.py.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# A transport returns the raw JSON bytes/str of one snapshot request.
Transport = Callable[[], "str | bytes"]

TICKER_SCHEMA = "symbol string, price string"


def urllib_transport(url: str, timeout_s: float = 10.0) -> Transport:
    """Real-network transport (stdlib only; requests not assumed)."""

    def fetch() -> bytes:
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout_s) as r:  # noqa: S310
            return r.read()

    return fetch


def collect_snapshots(
    transport: Transport,
    window_s: float,
    interval_s: float = 0.0,
    max_snapshots: int | None = None,
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
) -> list[list[dict]]:
    """The reference's poll loop (etl-vini-azure.py:69-75): fetch
    snapshots until the deadline. Injectable clock/sleep for tests."""
    out: list[list[dict]] = []
    start = clock()
    while clock() - start <= window_s:
        payload = transport()
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8")
        rows = json.loads(payload)
        out.append(rows if isinstance(rows, list) else [rows])
        if max_snapshots is not None and len(out) >= max_snapshots:
            break
        if interval_s:
            sleep(interval_s)
    return out


def snapshots_to_df(
    spark: SparkSession,
    snapshots: Iterable[list[dict]],
    schema: StructType | str = TICKER_SCHEMA,
) -> DataFrame:
    """Union of snapshot micro-batches as one DataFrame (A4). Rows go
    through createDataFrame with an explicit schema — no inference
    drift between polls."""
    rows = [r for snap in snapshots for r in snap]
    return spark.createDataFrame(rows, schema=schema)


def ingest_http(
    spark: SparkSession,
    transport: Transport,
    window_s: float,
    schema: StructType | str = TICKER_SCHEMA,
    **kw,
) -> DataFrame:
    """End-to-end S1+S2+A4: poll window -> one DataFrame."""
    return snapshots_to_df(spark, collect_snapshots(transport, window_s, **kw), schema)
