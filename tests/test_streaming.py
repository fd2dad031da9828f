"""§2.10: Structured Streaming — tumbling-window agg equals its batch
twin; custom stateful operator runs through applyInPandasWithState."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_etl_spark.sources.files import load_table
from azure_etl_spark.streaming.collector import stateful_running_minmax
from azure_etl_spark.streaming.windows import run_available_now, tumbling_window_agg


def _events_to_stream_dir(spark, sf_dir, tmp_path) -> str:
    src = load_table(spark, sf_dir, "events")
    path = os.path.join(str(tmp_path), "events_stream")
    src.write.mode("overwrite").parquet(path)
    return path


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    path = _events_to_stream_dir(spark, sf_dir, tmp_path)
    batch_df = spark.read.parquet(path)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(path)

    aggs = {
        "n": F.count("*"),
        "min_value": F.min("value"),
        "max_value": F.max("value"),
    }
    windowed = tumbling_window_agg(
        stream_df, "ts", "1 hour", ["event_type"], aggs, watermark_delay="1 minute"
    )
    run_available_now(windowed, "hourly_stream", os.path.join(str(tmp_path), "ckpt"))
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["min_value"], r["max_value"])
        for r in spark.table("hourly_stream").collect()
    }

    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["min_value"], r["max_value"])
        for r in tumbling_window_agg(batch_df, "ts", "1 hour", ["event_type"], aggs)
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stateful_running_minmax(spark, sf_dir, tmp_path):
    path = _events_to_stream_dir(spark, sf_dir, tmp_path)
    batch_df = spark.read.parquet(path)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(path)

    out = stateful_running_minmax(stream_df, "event_type", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("run_minmax")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per key must equal the global batch min/max
    got = {
        r["event_type"]: (r["run_min"], r["run_max"])
        for r in spark.table("run_minmax").collect()
    }
    want = {
        r["event_type"]: (r["mn"], r["mx"])
        for r in batch_df.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want
