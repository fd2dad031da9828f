#!/usr/bin/env python
"""Matched-load interleaved A/B of the corpus_funnel across the three
funnel-path rewrites that landed after the r10 13.26 s quiet record.

The three suspects change ONLY azure_etl_spark/operators/dedup.py and
are sequential on that file, so swapping that single file inside the
HEAD tree isolates each change:

  A = dedup.py @ 9d210a8^  (row_number exact dedup, loop CC, unpacked minhash)
  B = dedup.py @ 9d210a8   (+ min_by exact dedup)
  C = dedup.py @ 050860e   (+ pointer-jumping CC)
  D = dedup.py @ HEAD      (+ packed-signature band join)

Runs rotate A,B,C,D within each cycle (same box, back-to-back, kernel
calibration recorded per run) so load drift hits every variant equally.
Each run is a fresh subprocess (fresh JVM). Prints one JSON object and
appends per-run lines to tools/ab_funnel_runs.jsonl.

Usage: python tools/ab_funnel.py [cycles=4] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(REPO, "azure_etl_spark", "operators", "dedup.py")
VARIANTS = {
    "A_pre_minby": "tools/ab/dedup_vA_pre_minby.py",
    "B_minby": "tools/ab/dedup_vB_minby.py",
    "C_ptrjump": "tools/ab/dedup_vC_ptrjump.py",
    "D_head": "tools/ab/dedup_vD_head.py",
}

ONE_RUN = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from azure_etl_spark.session import session_builder
spark = session_builder(app_name="ab-funnel", master="local[32]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
t0 = time.perf_counter()
spark.range(32_000_000).selectExpr("sum(id % 7)").collect()
k0 = time.perf_counter() - t0

from azure_etl_spark.plans.corpus_pipeline import CurationPipeline
stage_t = {{}}
orig = CurationPipeline._advance
last = [0.0]
def timed(self, name, df, prev):
    out = orig(self, name, df, prev)
    now = time.perf_counter(); stage_t[name] = round(now - last[0], 3); last[0] = now
    return out
CurationPipeline._advance = timed
import bench
t0 = time.perf_counter(); last[0] = t0
bench._run_corpus_funnel(spark, {sf_dir!r})
total = time.perf_counter() - t0

t0 = time.perf_counter()
spark.range(32_000_000).selectExpr("sum(id % 7)").collect()
k1 = time.perf_counter() - t0
print("ABRESULT " + json.dumps({{"total": round(total, 3),
    "kernel": [round(k0, 3), round(k1, 3)], "stages": stage_t}}))
spark.stop()
"""


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    orig = open(TARGET).read()
    runs: list[dict] = []
    log = open(os.path.join(REPO, "tools", "ab_funnel_runs.jsonl"), "a")
    try:
        for cyc in range(cycles):
            for name, path in VARIANTS.items():
                shutil.copyfile(os.path.join(REPO, path), TARGET)
                proc = subprocess.run(
                    [sys.executable, "-c", ONE_RUN.format(repo=REPO, sf_dir=sf_dir)],
                    capture_output=True, text=True, cwd=REPO, timeout=900,
                )
                line = [l for l in proc.stdout.splitlines() if l.startswith("ABRESULT ")]
                if not line:
                    print(f"cycle {cyc} {name}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
                    continue
                rec = json.loads(line[0][len("ABRESULT "):])
                rec.update({"variant": name, "cycle": cyc, "sf_dir": sf_dir})
                runs.append(rec)
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(f"cycle {cyc} {name}: total={rec['total']} kernel={rec['kernel']}")
    finally:
        with open(TARGET, "w") as f:
            f.write(orig)
    summary = {}
    for name in VARIANTS:
        vals = [r["total"] for r in runs if r["variant"] == name]
        if vals:
            summary[name] = {
                "n": len(vals), "min": min(vals),
                "median": statistics.median(vals),
                "stage_min": {
                    k: min(r["stages"].get(k, 9e9) for r in runs if r["variant"] == name)
                    for k in runs[0]["stages"]
                },
            }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
