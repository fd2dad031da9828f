#!/bin/bash
# Run bench.py N times sequentially, capturing the JSON line of each
# run to tools/bench_local_r13_runs.jsonl (sf dir from $1, runs from $2).
set -u
SF_DIR="${1:-/root/testdata/sf0.1}"
N="${2:-6}"
OUT="${3:-tools/bench_local_r13_runs.jsonl}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1 >> "$OUT"
  echo "run $i/$N done" >&2
done
