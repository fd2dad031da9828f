#!/usr/bin/env python
"""Adversarial-skew + growth probe for the streaming text near-dup
writer (streaming/sinks.incremental_text_near_dup_writer, round 8).

Two questions a 100 TB ingest asks of it:

1. HOT CONTENT: 10% of every batch is ONE document (the text analogue
   of the blank-image flood). The linear stages must absorb it — the
   within-batch exact collapse keeps one copy per digest, and the
   cross-batch exact digest anti-join rejects re-ingests — so the
   capped band join never sees the flood as pair candidates. Per-batch
   wall time should grow ~linearly in batch size, never quadratically,
   and the overflow reports should stay near-empty (the hot doc is ONE
   index row after batch 0).

2. INDEX GROWTH: per-batch cost as the cumulative index grows must be
   bounded by |batch| x bands against capped buckets + the linear
   digest join — NOT by corpus size. Measured: batch time across
   successive same-size batches of fresh content.

Usage: python tools/scale_probe_text_stream.py [n_per_batch] [batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.session import session_builder  # noqa: E402
from azure_etl_spark.streaming.sinks import (  # noqa: E402
    incremental_text_near_dup_writer,
)

HOT = (
    "breaking news alert please subscribe to our newsletter for daily "
    "updates on markets weather and sports delivered to your inbox"
)


def synth_batch(spark, n: int, batch: int, hot_frac: float = 0.1):
    """n docs: hot_frac exact copies of HOT, rest unique deterministic
    word soup (disjoint bigram sets across docs/batches)."""
    base = batch * 1_000_000
    return spark.range(base, base + n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % int(1 / hot_frac) == 0, F.lit(HOT))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{w}x"), (F.col("id") * 31 + w).cast("string"))
                    for w in range(18)
                ],
            )
        )
        .alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = session_builder(app_name="probe-text-stream", master="local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="probe_txt_stream_")
    target = os.path.join(root, "t")
    index = os.path.join(root, "i")
    w = incremental_text_near_dup_writer(target, index)
    try:
        print(f"n_per_batch={n} hot_frac=0.1 batches={batches}")
        print("batch  secs   admitted  index_rows  overflow_rows")
        for b in range(batches):
            df = synth_batch(spark, n, b).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            w(df, b)
            dt = time.perf_counter() - t0
            admitted = spark.read.parquet(
                os.path.join(target, f"batch_id={b}")
            ).count()
            idx_rows = spark.read.parquet(index).count()
            ov = 0
            for sub in ("_overflow", "_overflow_index"):
                p = os.path.join(index, sub, f"batch_id={b}")
                if os.path.isdir(p):
                    ov += spark.read.parquet(p).count()
            print(f"{b:5d}  {dt:5.2f}  {admitted:8d}  {idx_rows:10d}  {ov:13d}")
        # hot doc admitted exactly once across the whole run
        hot_n = spark.read.parquet(target).filter(F.col("text") == HOT).count()
        print(f"hot-doc survivors across all batches: {hot_n} (want 1)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
