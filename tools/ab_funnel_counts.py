#!/usr/bin/env python
"""Interleaved A/B of CurationPipeline counts="observed" (default)
vs counts="off" (round 13, VERDICT r12 #6): what do the ~8
driver-synchronized materialization barriers actually cost at a given
scale? Both modes are timed to a FULLY MATERIALIZED packed output
(noop write), so "off" pays its whole fused DAG in the measurement.

Usage: python tools/ab_funnel_counts.py [cycles=3] [sf_dir]
Appends per-run lines to tools/ab_funnel_counts_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.session import session_builder  # noqa: E402


def one_run(spark, sf_dir: str, counts: str) -> float:
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.imagehash import attach_synth_pnm
    from azure_etl_spark.plans.corpus_pipeline import CurationPipeline
    from azure_etl_spark.sources.files import ensure_min_partitions, load_table

    docs = ensure_min_partitions(
        load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    media = attach_synth_pnm(
        docs.filter(F.col("doc_id") % 5 < 2).select("doc_id")
    ).withColumn("media_type", F.lit("image/pnm"))
    t0 = time.perf_counter()
    packed = CurationPipeline(counts=counts).run(
        docs, eval_docs=eval_docs, embeddings=emb, media=media
    )
    packed.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = session_builder(
        app_name="funnel-counts-ab", master="local[32]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def kernel():
        t0 = time.perf_counter()
        spark.range(0, 32_000_000, 1, 32).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    kernel()  # warm
    one_run(spark, sf_dir, "observed")  # warm both paths' codegen
    log = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ab_funnel_counts_runs.jsonl"), "a")
    for cyc in range(cycles):
        for mode in ("observed", "off"):
            k0 = kernel()
            t = one_run(spark, sf_dir, mode)
            rec = {"mode": mode, "cycle": cyc, "sec": round(t, 3),
                   "kernel": k0, "sf_dir": sf_dir}
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(rec)
    spark.stop()


if __name__ == "__main__":
    main()
