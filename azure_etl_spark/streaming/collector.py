"""Streaming variant of the HTTP collector (S1 as a real stream).

``rate``-source-paced polling: the rate source emits ticks, a
``foreachBatch`` callback fetches one snapshot per tick through the same
injectable transport as sources/http.py and appends rows to a target.
This keeps the reference's bounded-poll semantics (stop after the
window) while exercising the genuine streaming machinery.

Also provides ``stateful_running_minmax`` — a custom stateful operator
via ``applyInPandasWithState``: running min/max per key across
micro-batches, the streaming twin of the gold aggregation with
explicit state (demonstrates the pattern Spark's built-ins can't
express when the update logic is arbitrary Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from azure_etl_spark.sources.http import Transport, snapshots_to_df


def rate_paced_collector(
    spark: SparkSession,
    transport: Transport,
    target_table: str,
    rows_per_second: int = 1,
    schema: str = "symbol string, price string",
):
    """Start a rate-paced poller appending each snapshot to an in-memory
    table. Returns the StreamingQuery (caller stops it after the window,
    mirroring the reference's 180 s deadline)."""
    import json

    ticks = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()

    def poll(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        payload = transport()
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8")
        rows = json.loads(payload)
        snap = snapshots_to_df(spark, [rows if isinstance(rows, list) else [rows]], schema)
        snap.write.mode("append").saveAsTable(target_table)

    return ticks.writeStream.foreachBatch(poll).start()


def stateful_running_minmax(
    events: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """applyInPandasWithState: running min/max per key, updated per
    micro-batch. State is two floats per key — constant memory however
    long the stream runs."""
    out_schema = f"{key_col} string, run_min double, run_max double"
    state_schema = "min double, max double"

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lo, hi = state.get if state.exists else (None, None)
        for pdf in pdfs:
            if len(pdf):
                mn, mx = float(pdf[value_col].min()), float(pdf[value_col].max())
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
        state.update((lo, hi))
        yield pd.DataFrame({key_col: [key[0]], "run_min": [lo], "run_max": [hi]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_medallion(
    bronze_stream: DataFrame,
    gold_path: str,
    checkpoint: str,
    key: str,
    value: str,
    min_alias: str = "min_value",
    max_alias: str = "max_value",
):
    """The reference pipeline in streaming mode (SURVEY.md §2.10):
    bronze micro-batches fold incrementally into the gold min/max table
    instead of recomputing history each run.

    Each ``foreachBatch``: dedup the batch, read current gold, merge via
    the mergeable-monoid identity (incremental_minmax_merge), atomically
    swap the gold directory. Per-batch cost is O(batch + |keys|) —
    independent of history size, which is what makes a continuously-
    ingesting 100 TB corpus's gold refresh affordable. foreachBatch
    replays are idempotent: re-merging the same batch is a no-op for
    min/max (idempotent monoid), so crash-redelivery cannot corrupt
    gold. Returns the started query; callers trigger availableNow or
    processingTime.
    """
    import os as _os

    from azure_etl_spark.operators.aggregate import incremental_minmax_merge

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates()
        try:
            gold = spark.read.parquet(gold_path)
        except Exception:
            gold = None
        if gold is None:
            from azure_etl_spark.operators.aggregate import grouped_min_max

            merged = grouped_min_max(
                batch, keys=[key], value=value,
                min_alias=min_alias, max_alias=max_alias,
            )
        else:
            merged = incremental_minmax_merge(
                gold, batch, keys=[key], value=value,
                min_alias=min_alias, max_alias=max_alias,
            )
        tmp = gold_path.rstrip("/") + f"__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(gold_path)
        import shutil as _shutil

        _shutil.rmtree(tmp, ignore_errors=True)
        _os.makedirs(checkpoint, exist_ok=True)

    return (
        bronze_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def streaming_distinct_sketch(
    stream: DataFrame,
    gold_path: str,
    checkpoint: str,
    key: str,
    id_col: str,
):
    """Streaming distinct-count gold table via mergeable HLL sketches:
    per micro-batch, sketch the batch's ids per key and hll_union the
    binary sketch into the persisted gold row — the sketch analogue of
    streaming_medallion's min/max fold.

    COUNT(DISTINCT) is not incrementally maintainable from counts alone
    (you cannot merge two distinct-counts), but HLL sketches form a
    monoid: union is associative/commutative/idempotent, so per-batch
    cost is O(batch + |keys|) forever, replay-safe under foreachBatch's
    at-least-once redelivery, and the same sketch column can roll up
    across keys later (hll_union_agg) without rescanning history.
    """
    from pyspark.sql import functions as F

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sk = batch_df.groupBy(key).agg(
            F.hll_sketch_agg(id_col).alias("sketch")
        )
        try:
            gold = spark.read.parquet(gold_path)
        except Exception:
            gold = None
        if gold is not None:
            both = gold.select(key, "sketch").unionByName(batch_sk)
            merged = both.groupBy(key).agg(F.hll_union_agg("sketch").alias("sketch"))
        else:
            merged = batch_sk
        tmp = gold_path.rstrip("/") + f"__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(gold_path)
        import shutil as _shutil

        _shutil.rmtree(tmp, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )
