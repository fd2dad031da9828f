"""Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The reference's ingest (S1, etl-vini-azure.py:61-75) is a driver-side
poll loop. This module models the same bounded ticker-snapshot ingest as
a REGISTERED SPARK SOURCE instead: ``spark.read.format("ticker")`` —
partition planning, schema, and (in the streaming variant) offset
tracking all live behind the standard source contract, so the collector
composes with every DataFrame operator with no special-case glue.

The payload generator is deterministic (seeded LCG over the symbol
universe) because the container has no network; swapping ``_snapshot``
for a real HTTP GET is the only production change — partitioning and
offset logic stay identical. Each partition generates independently on
its executor (no driver fan-out of data).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SYMBOLS = ("BTCUSDT", "ETHUSDT", "ADAUSDT", "BNBUSDT", "LTCUSDT")
SCHEMA = "snapshot_id int, symbol string, price double"


def _price(snapshot_id: int, sym_idx: int) -> float:
    """Deterministic pseudo-price: LCG seeded by (snapshot, symbol)."""
    state = (snapshot_id * 31 + sym_idx + 1) * 6364136223846793005 + 1442695040888963407
    state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    return round(100.0 + (state >> 16) % 1_000_000 / 100.0, 2)


def _snapshot(snapshot_id: int):
    for i, sym in enumerate(SYMBOLS):
        yield (snapshot_id, sym, _price(snapshot_id, i))


class _SnapshotPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class TickerBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("snapshots", 4))
        self.parts = int(options.get("numpartitions", 2))

    def partitions(self):
        per = max(1, -(-self.n // self.parts))
        return [
            _SnapshotPartition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition):
        for sid in range(partition.start, partition.end):
            yield from _snapshot(sid)


class TickerStreamReader(DataSourceStreamReader):
    """Micro-batch variant: each trigger emits the snapshots that
    'arrived' since the last committed offset (here: one per trigger;
    with a real API, one poll per trigger)."""

    def __init__(self, options):
        self._next = 0

    def initialOffset(self):
        return {"snapshot": 0}

    def latestOffset(self):
        self._next += 1
        return {"snapshot": self._next}

    def partitions(self, start, end):
        return [_SnapshotPartition(start["snapshot"], end["snapshot"])]

    def read(self, partition):
        for sid in range(partition.start, partition.end):
            yield from _snapshot(sid)

    def commit(self, end):
        pass


class TickerDataSource(DataSource):
    @classmethod
    def name(cls):
        return "ticker"

    def schema(self):
        return SCHEMA

    def reader(self, schema: StructType):
        return TickerBatchReader(self.options)

    def streamReader(self, schema: StructType):
        return TickerStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickerDataSource)
