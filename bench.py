#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs the ``bench=True`` subset of the query registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ..., "load": {...}}`` — ``load`` is the calibration-kernel time
series sampled before every query (round 8): tools/bench_guard.py
divides per-query ratios by the run's load index so shared-box
contention reads as uniform drift instead of fake regressions.

Each query is materialized with a noop-format write (full execution,
no driver collect / no sink IO in the measurement), matching how the
reference's notebook telemetry measured compute+write per stage
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_etl_spark.plans.queries import QUERIES  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402


# Load-calibration kernel (VERDICT r7 #2): a fixed, deterministic,
# CPU-bound query — 32M codegen'd multiply+mod rows across 32
# partitions, no IO, no data dependence — timed before each headline
# query. Its time series IS the box's load profile during the run:
# tools/bench_guard.py divides each query's ratio by the run's load
# index (median kernel time / quiet-box reference) so a uniformly
# loaded sandbox reads as "uniform drift", not 29 fake regressions,
# while a single-query plan regression (which can't move the kernel)
# still flags.
CALIB_ROWS = 32_000_000


def _calib_kernel_sec(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, CALIB_ROWS, 1, 32).selectExpr(
        "sum((id * 2654435761) % 1000003) AS s"
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _run_corpus_funnel(spark, sf_dir: str) -> None:
    """One full CurationPipeline pass over the documents fixture with
    every optional stage armed: synthetic PNM media on 40% of docs
    (groups of near-identical payloads, the planted-duplicate fixture
    the registry media queries use), embeddings joined by id for
    SemDeDup, and a deterministic eval slice for decontamination.
    run() counts each stage, so returning means fully executed."""
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
    # media_routes declares the (single) modality this fixture attaches
    # — the media stage then skips the distinct-probe job that would
    # otherwise EXECUTE the attach_synth_pnm mapInPandas end-to-end a
    # second time just to list types (round 13; output identical, the
    # hash/pair/resolve work is unchanged)
    CurationPipeline(media_routes=("image/pnm",)).run(
        docs, eval_docs=eval_docs, embeddings=emb, media=media
    )


def _build_delta_fixture(spark, sf_dir: str, root: str) -> str:
    """A deterministic foreign-Delta fixture scaled by the sf tables:
    10 append commits (orders sliced by key), one merge-on-read delete
    (real deletion vectors), exported to a real ``_delta_log``. Build
    cost is OUTSIDE the timed sections — the bench rows time the
    READERS (VERDICT r12 #5: the Delta reader family had oracle
    checks but zero wall-time protection; a planning-cost regression
    in _replay_state/_unit would be invisible until a 10k-commit
    estate hits it)."""
    from pyspark.sql import functions as F

    from azure_etl_spark.sources.delta_export import export_delta_log
    from azure_etl_spark.sources.files import load_table
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )

    path = os.path.join(root, "delta_fixture")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    for i in range(10):
        write_snapshot(
            orders.filter(F.col("o_orderkey") % 10 == i).coalesce(2),
            path,
            mode="append" if i else "overwrite",
        )
    delete_from_snapshot(
        spark, path, [("o_orderkey", "<", 1000)], mode="merge_on_read"
    )
    export_delta_log(spark, path)
    return path


def _run_delta_batch_read(spark, fixture: str) -> None:
    """Tip read through the foreign-log batch reader (replay + DV
    masks + partition dim), fully materialized via noop."""
    from azure_etl_spark.sources.delta_export import read_delta_log_table

    read_delta_log_table(spark, fixture).write.format("noop").mode(
        "overwrite"
    ).save()


def _run_delta_stream_drain(spark, fixture: str, ckpt: str) -> None:
    """Full availableNow CDF drain over the fixture's 11 commits from
    version 0 — per-commit planning (_replay_state/_unit/latestOffset)
    plus the per-file Arrow read path, the costs the streaming oracle
    rows can't see."""
    from azure_etl_spark.streaming import delta_source

    delta_source.register(spark)
    q = (
        spark.readStream.format("delta_log_table")
        .option("path", fixture)
        .option("readchangefeed", "true")
        .option("startingversion", "0")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = (
        session_builder(app_name="azure-etl-spark-bench", master=f"local[{cpus}]")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths outside the measurement
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for _ in range(2):  # warm the calibration kernel's codegen too
        _calib_kernel_sec(spark)
    kernel_sec: list[float] = []

    # per-query JIT/codegen warmup at the smallest fixture: each query's
    # generated code and planner paths are exercised on sf0.001 before
    # the timed sf0.1 run, so the measurement reflects data processing,
    # not one-time class-loading/JIT (standard warm-measurement
    # methodology; the warmup scale is 100x smaller than the bench
    # scale, so no result data is cached between the two).
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm = os.path.isdir(warm_dir)

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        if not spec.bench:
            continue
        if warm:
            try:
                spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass  # warmup is best-effort; the timed run decides
        kernel_sec.append(round(_calib_kernel_sec(spark), 3))
        # min of three timed runs: per-run noise on this sandbox is
        # +/-30% per query (measured round 4), so one-off GC pauses /
        # page-cache misses otherwise smear seconds over the total.
        # The DataFrame is REBUILT per run (round 13): a query whose
        # plan shares a multi-consumer subtree through a lazy
        # localCheckpoint (cms_word_freq_docs) would otherwise hand
        # runs 2-3 the blocks run 1 checkpointed — every timed run must
        # compute from the parquet inputs. Rebuilding costs only
        # plan-construction time (timed, per the boundary note below)
        # and changes nothing for checkpoint-free queries (same plan,
        # recomputed either way).
        # The timed region starts BEFORE the DataFrame is built (round
        # 13 measurement fix, guide §1): with AQE on, a lazy
        # localCheckpoint materializes every upstream query stage at
        # CONSTRUCTION time (AdaptiveSparkPlanExec.getFinalPhysicalPlan
        # runs inside Dataset.checkpoint's toRdd), so timing only the
        # write would let a checkpointed query's corpus work escape the
        # measurement. Timing fn()+write covers all data work wherever
        # Spark schedules it; for checkpoint-free queries it adds only
        # driver plan-construction (~tens of ms), uniformly.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # full medallion pipeline end-to-end (real layer writes to local tmp),
    # the BASELINE.md "pipeline <= 30 s" row
    import datetime as dt
    import shutil
    import tempfile

    from azure_etl_spark.plans.pipeline import MedallionPipeline
    from azure_etl_spark.plans.queries import crypto_view

    if warm:  # same per-query warmup policy for the pipeline path
        wroot = tempfile.mkdtemp(prefix="bench_pipe_warm_")
        try:
            MedallionPipeline(root=wroot, as_of=dt.date(2024, 1, 15)).run(
                spark, crypto_view(spark, warm_dir)
            )
        except Exception:
            pass
        finally:
            shutil.rmtree(wroot, ignore_errors=True)

    root = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        raw = crypto_view(spark, sf_dir)
        kernel_sec.append(round(_calib_kernel_sec(spark), 3))
        t0 = time.perf_counter()
        MedallionPipeline(root=root, as_of=dt.date(2024, 1, 15)).run(spark, raw)
        timings["pipeline_medallion"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # end-to-end LLM curation funnel (VERDICT r8 #2): the engine's
    # flagship training-data capability gets the same wall-time
    # protection as the reference pipeline — lang gate -> quality gate
    # -> exact dedup -> MinHash near-dup -> MEDIA near-dup (real PNM
    # payloads, planted duplicate groups) -> SemDeDup (embeddings) ->
    # decontamination (eval broadcast) -> shard + token-budget pack.
    # CurationPipeline.run() counts every stage, so the timed call IS
    # full execution (no lazy remainder).
    if warm:
        try:
            _run_corpus_funnel(spark, warm_dir)
        except Exception:
            pass
    kernel_sec.append(round(_calib_kernel_sec(spark), 3))
    t0 = time.perf_counter()
    _run_corpus_funnel(spark, sf_dir)
    timings["corpus_funnel"] = round(time.perf_counter() - t0, 3)

    # Delta reader family (round 13, VERDICT r12 #5): fixture build is
    # untimed; the batch read gets the min-of-3 treatment, the stream
    # drain runs once per fresh checkpoint (its cost IS the replay)
    droot = tempfile.mkdtemp(prefix="bench_delta_")
    try:
        fixture = _build_delta_fixture(spark, sf_dir, droot)
        kernel_sec.append(round(_calib_kernel_sec(spark), 3))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _run_delta_batch_read(spark, fixture)
            best = min(best, time.perf_counter() - t0)
        timings["delta_batch_read"] = round(best, 3)
        # Round-13 measurement fix (guide §1, documented in
        # OPTIMIZATION_r13.md): the drain row used to time the FIRST
        # streaming execution in the JVM — cold micro-batch machinery,
        # streaming-noop-sink init and Python-source codepaths — unlike
        # every other row, which is warmed (sf0.001 warmup or
        # min-of-3). Measured cold 7.1 s vs 2.1 s warm for the SAME
        # replay. One warm drain on a THROWAWAY checkpoint first; the
        # timed drain still starts from a fresh checkpoint and replays
        # the full 11-commit backlog from the fixture's parquet+log
        # (nothing is result-cached: a fresh checkpoint forces complete
        # re-planning and re-reading).
        _run_delta_stream_drain(
            spark, fixture, os.path.join(droot, "ckpt_warm")
        )
        kernel_sec.append(round(_calib_kernel_sec(spark), 3))
        t0 = time.perf_counter()
        _run_delta_stream_drain(spark, fixture, os.path.join(droot, "ckpt"))
        timings["delta_stream_drain"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(droot, ignore_errors=True)
    kernel_sec.append(round(_calib_kernel_sec(spark), 3))  # closing sample

    total = round(sum(timings.values()), 3)
    kmed = sorted(kernel_sec)[len(kernel_sec) // 2]
    print(
        json.dumps(
            {
                "metric": "bench_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "load": {
                    "kernel_rows": CALIB_ROWS,
                    "kernel_sec": kernel_sec,
                    "kernel_median_sec": round(kmed, 3),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
