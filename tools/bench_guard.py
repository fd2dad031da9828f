#!/usr/bin/env python
"""Bench regression guard: compare a bench.py output line against the
round-2 reference numbers (the best clean measurement; r3's uniform
+21% drift was sandbox load, not plan changes — see BASELINE.md).

Usage:
    python bench.py | tail -1 > /tmp/bench.json
    python tools/bench_guard.py /tmp/bench.json [--factor 1.5]

Exits non-zero and lists offenders if any reference query is slower
than ``factor`` x its reference time. Queries added after round 2 have
no reference and are reported informationally. A uniform slowdown
across ALL queries (load noise, not a plan regression) is called out
as such: single-query regressions are the actionable signal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# BENCH_r02.json "queries" (sf0.1, local[32], quiet sandbox)
REFERENCE: dict[str, float] = {
    "flagship_gold_minmax": 0.653,
    "dedup_distinct": 1.533,
    "topk_orders": 0.102,
    "join_revenue_per_nation": 0.484,
    "window_minmax_partition": 0.52,
    "events_hourly_rollup": 0.179,
    "tpch_q1ish": 1.258,
    "text_token_stats": 0.185,
    "minhash_near_dup": 0.999,  # r3 value: exact-verify stage added in r3
    "cosine_topk": 0.11,
    "tpch_q3ish": 0.795,
    "tpch_q6ish": 0.183,
    "tpch_q9ish": 0.442,
    "hll_sketch_rollup_users": 0.363,  # r02's 0.259 was a lucky draw; best clean min-of-4 (r4)
    "training_corpus_filter": 0.534,
    "contamination_ngram_overlap": 0.876,
    "pack_sequences_budget": 0.458,
    "word_entropy_docs": 0.228,
    "remove_dup_segments_docs": 1.15,
    "unigram_logprob_docs": 0.743,
    "cohort_weekly_retention": 0.4,
    "pipeline_medallion": 3.546,
}

# queries under ~250 ms are timer/GC-noise dominated at sf0.1; require
# an absolute floor before calling one a regression
ABS_FLOOR_SEC = 0.15


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json", help="file with bench.py's JSON line")
    ap.add_argument("--factor", type=float, default=1.5)
    args = ap.parse_args()

    with open(args.bench_json) as f:
        text = f.read().strip()
    # accept either the raw JSON line or driver-style {"parsed": {...}}
    data = json.loads(text.splitlines()[-1])
    if "parsed" in data:
        data = data["parsed"]
    queries: dict[str, float] = data["queries"]

    offenders, new, ratios = [], [], []
    for name, ref in REFERENCE.items():
        cur = queries.get(name)
        if cur is None:
            continue
        ratios.append(cur / ref)
        if cur > args.factor * ref and cur - ref > ABS_FLOOR_SEC:
            offenders.append((name, ref, cur, cur / ref))
    for name in queries:
        if name not in REFERENCE:
            new.append(name)

    if new:
        print(f"(info) no reference for: {', '.join(sorted(new))}")
    if ratios:
        med = sorted(ratios)[len(ratios) // 2]
        print(f"median ratio vs r02 reference: {med:.2f}x over {len(ratios)} queries")
        if med > args.factor:
            print(
                "NOTE: uniform slowdown across the board — likely sandbox "
                "load, re-run on a quiet machine before bisecting plans"
            )
    if offenders:
        print(f"FAIL: {len(offenders)} queries > {args.factor}x reference:")
        for name, ref, cur, ratio in sorted(offenders, key=lambda o: -o[3]):
            print(f"  {name}: {cur:.3f}s vs ref {ref:.3f}s ({ratio:.2f}x)")
        return 1
    print("OK: no per-query regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
