#!/usr/bin/env python
"""Bench regression guard: compare a bench.py output line against the
round-4 clean-run reference numbers (BENCH_LOCAL_r04.json, min-of-3 on
a quiet sandbox — the current best; r3's uniform +21% drift was sandbox
load, not plan changes — see BASELINE.md).

Usage:
    python bench.py | tail -1 > /tmp/bench.json
    python tools/bench_guard.py /tmp/bench.json [--factor 1.5]

Exits non-zero and lists offenders if any reference query is slower
than ``factor`` x its reference time. Queries added after the reference
round have no reference and are reported informationally. A uniform slowdown
across ALL queries (load noise, not a plan regression) is called out
as such: single-query regressions are the actionable signal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# BENCH_LOCAL_r04.json "queries" (sf0.1, local[32], min-of-3, quiet sandbox)
REFERENCE: dict[str, float] = {
    "flagship_gold_minmax": 0.458,
    "dedup_distinct": 1.377,
    "topk_orders": 0.096,
    "join_revenue_per_nation": 0.369,
    "window_minmax_partition": 0.538,
    "events_hourly_rollup": 0.169,
    "tpch_q1ish": 1.277,
    "text_token_stats": 0.168,
    "minhash_near_dup": 0.782,
    "cosine_topk": 0.093,
    "tpch_q3ish": 0.739,
    "tpch_q6ish": 0.154,
    "tpch_q9ish": 0.395,
    "hll_sketch_rollup_users": 0.268,
    "training_corpus_filter": 0.495,
    "contamination_ngram_overlap": 0.781,
    "pack_sequences_budget": 0.266,
    "word_entropy_docs": 0.158,
    "remove_dup_segments_docs": 0.909,
    "unigram_logprob_docs": 0.604,
    "cohort_weekly_retention": 0.321,
    "pipeline_medallion": 3.033,
    # added round 5 (BENCH_LOCAL_r05.json clean-run value)
    "dedup_duplicate_spans_docs": 1.152,
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
        print(f"median ratio vs r04 reference: {med:.2f}x over {len(ratios)} queries")
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
