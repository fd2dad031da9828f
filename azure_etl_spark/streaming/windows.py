"""Event-time windowed aggregation with watermarks.

The reference has no Structured Streaming — its "stream" is a bounded
180 s poll loop inside one Airflow task (etl-vini-azure.py:69-75). The
engine extends the same gold aggregation (min/max per key) to true
streams: ``readStream`` -> ``withWatermark`` -> tumbling ``F.window`` ->
sink, run either continuously or as an incremental batch with
``trigger(availableNow=True)``.

Correctness contract: with availableNow over a static input, the result
must equal the batch ``date_trunc``-grouped aggregation — that batch
twin is the oracle-checked ``events_hourly_rollup`` query.

Scale notes: watermark bounds the state store (late rows beyond the
delay are dropped); state is partitioned by (window, keys) — the same
hash shuffle as the batch groupBy, held incrementally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str,
    window_duration: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation; works on both streaming
    and batch DataFrames (watermark is a no-op in batch)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark_delay)
    win = F.window(F.col(ts_col), window_duration)
    return (
        src.groupBy(win.alias("window"), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            *[F.col(name) for name in aggs],
        )
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding (hopping) window aggregation — each event
    lands in ``window/slide`` overlapping windows (e.g. 1h window, 15m
    slide -> 4). State per key scales with that overlap factor; the
    watermark bounds how many open windows the store holds, which is
    what keeps a 100 TB/day stream's state finite. Batch-safe like the
    tumbling variant (watermark is a no-op in batch), so the streaming
    result can be oracle-checked against the same call on a batch scan.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark_delay)
    win = F.window(F.col(ts_col), window_duration, slide_duration)
    return (
        src.groupBy(win.alias("window"), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            *[F.col(name) for name in aggs],
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available through the streaming engine
    into an in-memory sink table named ``query_name``, then stop."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
