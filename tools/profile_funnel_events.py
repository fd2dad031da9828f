#!/usr/bin/env python
"""Job-level profile of the corpus_funnel bench entry via the Spark
event log: per-job wall time, task time, and the DRIVER GAPS between
jobs (planning/barrier think time the stage profiler can't see).

Run on a quiet box from the repo root:

    python tools/profile_funnel_events.py

Prints a JSON summary plus a per-job table (job id, submit gap from
previous job end, wall, #tasks, description).
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
    evdir = tempfile.mkdtemp(prefix="funnel_events_")
    spark = (
        session_builder(app_name="funnel-profile-events", master=f"local[{cpus}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    import bench

    # same warmup policy as bench.py so codegen/JIT is out of the measure
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        try:
            bench._run_corpus_funnel(spark, warm_dir)
        except Exception:
            pass
    t0 = time.perf_counter()
    bench._run_corpus_funnel(spark, sf_dir)
    total = time.perf_counter() - t0
    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):  # Spark 4 rolling event-log layout
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            f for f in os.listdir(d) if f.startswith("events_")
        )
        path = os.path.join(d, parts[-1]) if parts else d

    jobs: dict[int, dict] = {}
    if path.endswith(".zstd"):
        import io
        import subprocess

        raw = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        ).stdout
        lines = io.StringIO(raw.decode())
    else:
        lines = open(path)
    for line in lines:
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (props.get("spark.job.description") or "")[:90],
                "callsite": (props.get("callSite.short") or "")[:60],
                "stages": len(ev.get("Stage Infos", [])),
                "tasks": sum(
                    s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                ),
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]

    order = sorted(jobs)
    # keep only jobs inside the timed funnel window: the warmup ran in the
    # same app, so cut at the last long idle gap before the final burst is
    # unreliable — instead report everything and let the reader use the
    # job count parity between warm and timed halves.
    rows = []
    prev_end = None
    for jid in order:
        j = jobs[jid]
        if "end" not in j:
            continue
        gap = (j["start"] - prev_end) if prev_end is not None else 0
        rows.append(
            (jid, gap, j["end"] - j["start"], j["stages"], j["tasks"],
             j["callsite"], j["desc"])
        )
        prev_end = j["end"]
    print(json.dumps({"total_sec": round(total, 3), "n_jobs": len(rows)}))
    print(f"{'job':>4} {'gap_ms':>7} {'wall_ms':>8} {'st':>3} {'tasks':>6}  callsite / desc")
    for jid, gap, wall, st, tasks, cs, d in rows:
        print(f"{jid:>4} {gap:>7} {wall:>8} {st:>3} {tasks:>6}  {cs} {d}")


if __name__ == "__main__":
    main()
