#!/usr/bin/env python
"""Labeled job profile of the corpus_funnel bench entry (round 14):
wraps the funnel's operator entry points with ``setJobDescription`` so
every job in the event log carries the operator path that submitted it
(guide §1.5), runs the warmed funnel once at sf0.1, and aggregates
per-label job wall time, driver gap time and job count for the TIMED
window only.

    python tools/profile_funnel_labeled.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.session import session_builder  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="funnel_labeled_")
    spark = (
        session_builder(app_name="funnel-labeled", master=f"local[{cpus}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext

    import azure_etl_spark.operators.dedup as dd
    import azure_etl_spark.operators.imagehash as ih
    import azure_etl_spark.operators.similarity as sim
    import azure_etl_spark.plans.corpus_pipeline as cp

    stack: list[str] = []

    def wrap(mod, name):
        orig = getattr(mod, name)

        def inner(*a, **k):
            stack.append(name)
            sc.setJobDescription(">".join(stack))
            try:
                return orig(*a, **k)
            finally:
                stack.pop()
                sc.setJobDescription(">".join(stack) or None)

        setattr(mod, name, inner)

    for m, n in [
        (dd, "exact_text_dedup"),
        (dd, "minhash_near_dup_pairs"),
        (dd, "connected_components"),
        (dd, "resolve_duplicate_clusters"),
        (sim, "semantic_dedup"),
        (sim, "kmeans_fit"),
        (ih, "attach_synth_pnm"),
        (ih, "image_perceptual_hash"),
        (ih, "hash64_near_dup_pairs"),
        (cp, "media_near_dup_pairs"),
        (cp, "perceptual_hash_mixed"),
    ]:
        wrap(m, n)
    # re-point the names corpus_pipeline imported at module load
    cp.exact_text_dedup = dd.exact_text_dedup
    cp.minhash_near_dup_pairs = dd.minhash_near_dup_pairs
    cp.resolve_duplicate_clusters = dd.resolve_duplicate_clusters

    orig_adv = cp.CurationPipeline._advance

    def adv(self, name, df, prev):
        sc.setJobDescription(f"advance:{name}")
        try:
            return orig_adv(self, name, df, prev)
        finally:
            sc.setJobDescription(None)

    cp.CurationPipeline._advance = adv

    import bench

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        try:
            bench._run_corpus_funnel(spark, warm_dir)
        except Exception:
            pass
    t0_ms = int(time.time() * 1000)
    t0 = time.perf_counter()
    bench._run_corpus_funnel(spark, sf_dir)
    total = time.perf_counter() - t0
    app_id = sc.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(f for f in os.listdir(d) if f.startswith("events_"))
        path = os.path.join(d, parts[-1]) if parts else d
    jobs = {}
    for line in open(path):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description") or "(none)",
                "tasks": sum(
                    s.get("Number of Tasks", 0)
                    for s in ev.get("Stage Infos", [])
                ),
            }
        elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    timed = [
        j for j in (jobs[i] for i in sorted(jobs))
        if "end" in j and j["start"] >= t0_ms
    ]
    agg: dict[str, list[float]] = {}
    prev_end = t0_ms
    for j in timed:
        gap = max(0, j["start"] - prev_end)
        a = agg.setdefault(j["desc"], [0, 0.0, 0.0, 0])
        a[0] += 1
        a[1] += (j["end"] - j["start"]) / 1000
        a[2] += gap / 1000
        a[3] += j["tasks"]
        prev_end = max(prev_end, j["end"])
    print(json.dumps({"total_sec": round(total, 3), "n_jobs": len(timed)}))
    print(f"{'jobs':>5} {'wall_s':>7} {'gap_s':>7} {'tasks':>6}  label")
    for d, (n, w, g, t) in sorted(agg.items(), key=lambda kv: -(kv[1][1] + kv[1][2])):
        print(f"{n:>5} {w:>7.2f} {g:>7.2f} {t:>6}  {d}")


if __name__ == "__main__":
    main()
