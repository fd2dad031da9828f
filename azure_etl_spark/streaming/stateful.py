"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4).

The successor to ``applyInPandasWithState``: typed state handles
(ValueState/ListState/MapState), timers, and TTL behind a
``StatefulProcessor`` class. State lives in the RocksDB state store,
partitioned by the grouping key — the same hash shuffle as a batch
groupBy, held incrementally across micro-batches.

``RunningStatsProcessor`` keeps per-key (count, sum, min, max) — the
streaming twin of the gold aggregation, but emitting an updated row per
key per micro-batch (a live materialized aggregate). The batch
equivalence test pins the semantics: after draining a static input, the
last emitted row per key equals the batch groupBy result.

Environment note: the PySpark<->JVM state protocol needs ``protobuf``,
which this container lacks, so the test skips here; the engine's
CI-exercised stateful path is ``applyInPandasWithState``
(streaming/collector.py), which has no such dependency.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("run_min", DoubleType()),
        StructField("run_max", DoubleType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, sum, min, max) with a ValueState handle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, s, mn, mx = self._state.get()
        else:
            n, s, mn, mx = 0, 0.0, None, None
        for pdf in rows:
            vals = pdf["value"]
            n += int(len(vals))
            s += float(vals.sum())
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        self._state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "total": [s],
                "run_min": [mn],
                "run_max": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_stats(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Wire a keyed stream through RunningStatsProcessor. Requires the
    RocksDB state store provider (set by the caller's session conf)."""
    src = stream.selectExpr(f"{key_col} AS key", f"CAST({value_col} AS DOUBLE) AS value")
    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
