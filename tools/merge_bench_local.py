#!/usr/bin/env python
"""Merge N bench.py run lines (one JSON per line) into a BENCH_LOCAL
record: per-query MIN over runs, per-run kernel medians recorded, the
BENCH_LOCAL_r12 protocol shape.

Usage: python tools/merge_bench_local.py runs.jsonl OUT.json ["note"]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs_path, out_path = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    runs = [json.loads(ln) for ln in open(runs_path) if ln.strip()]
    names = list(runs[0]["queries"])
    mins = {
        n: min(r["queries"][n] for r in runs if n in r["queries"])
        for n in names
    }
    kmeds = [r["load"]["kernel_median_sec"] for r in runs]
    out = {
        "metric": "bench_headline_total_min",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "queries": mins,
        "sf": runs[0]["sf"],
        "runs": len(runs),
        "protocol": "per-query min over runs; bench.py defaults (local[32])",
        "load": {
            "kernel_rows": runs[0]["load"]["kernel_rows"],
            "kernel_median_sec": sorted(kmeds)[len(kmeds) // 2],
            "kernel_median_sec_per_run": kmeds,
            "quiet_reference_kernel_sec": 0.085,
            "note": note,
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: total_min={out['value']} kernels={kmeds}")


if __name__ == "__main__":
    main()
