#!/usr/bin/env python
"""Backlog-pacing probe for the foreign-Delta streaming source
(VERDICT r11 #5): tail a MANY-commit log under ``maxbytespertrigger``
and verify per-batch PLANNING cost stays flat as the stream works
through the backlog.

Why this matters at 100 TB: a real gold table accumulates thousands of
commits between stream restarts. Planning each micro-batch must cost
O(commits newly admitted to that batch) — if it re-walked the whole
backlog (or re-parsed every consumed commit) per trigger, a 10k-commit
catch-up would go quadratic and the stream would never drain. The
source's admission control walks units FROM the last planned offset and
stops at budget exhaustion, so each commit JSON is parsed O(1) times
across the drain (plus the bounded unit cache).

The probe drives ``DeltaLogStreamReader`` directly — offset planning is
deliberately plain-Python (the Python Data Source worker has no JVM
gateway), so no SparkSession is needed and the measurement isolates
planning from IO. It builds a COMMITS-commit log (one add per commit,
realistic byte sizes in the actions), walks it from version 0 under a
byte budget of ~2 files per batch, and records per-batch planning wall
time. Healthy = the mean of the LAST 10 batches is within noise of the
FIRST 10 (flat), and every file is delivered exactly once.

    python tools/scale_probe_delta_stream.py [commits]   # default 400
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import LongType, StructField, StructType  # noqa: E402

from azure_etl_spark.streaming.delta_source import (  # noqa: E402
    DELTA_LOG_DIR,
    DeltaLogStreamReader,
)

FILE_BYTES = 4 << 20  # declared add size: 4 MiB per file
BUDGET = 2 * FILE_BYTES  # ~2 files per batch


def build_log(table: str, commits: int) -> None:
    ldir = os.path.join(table, DELTA_LOG_DIR)
    os.makedirs(ldir)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
    for v in range(commits):
        actions = [{"commitInfo": {"timestamp": 1700000000000 + v * 1000,
                                   "operation": "WRITE"}}]
        if v == 0:
            actions += [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {"metaData": {
                    "id": "probe-table",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 1700000000000,
                }},
            ]
        actions.append({"add": {
            "path": f"part-{v:05d}.parquet",
            "partitionValues": {},
            "size": FILE_BYTES,
            "modificationTime": 1700000000000,
            "dataChange": True,
        }})
        with open(os.path.join(ldir, f"{v:020d}.json"), "w") as f:
            f.write("\n".join(json.dumps(a, sort_keys=True) for a in actions))


def main() -> None:
    commits = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    tmp = tempfile.mkdtemp(prefix="delta_stream_probe_")
    table = os.path.join(tmp, "tbl")
    try:
        build_log(table, commits)
        schema = StructType([
            StructField("id", LongType()), StructField("val", LongType()),
        ])
        reader = DeltaLogStreamReader(
            {"path": table, "startingversion": "0",
             "maxbytespertrigger": str(BUDGET)},
            schema,
        )
        start = reader.initialOffset()
        delivered: list[str] = []
        timings_ms: list[float] = []
        batches = 0
        while True:
            t0 = time.perf_counter()
            end = reader.latestOffset()
            parts = reader.partitions(start, end)
            timings_ms.append((time.perf_counter() - t0) * 1000)
            delivered.extend(p.abs_path for p in parts)
            reader.commit(end)
            batches += 1
            if end == {"version": commits - 1} or not parts:
                break
            start = end
        assert len(delivered) == commits, (len(delivered), commits)
        assert len(set(delivered)) == commits, "duplicate delivery"
        head = timings_ms[1:11]  # batch 0 pays the walk-unit warmup
        tail = timings_ms[-10:]
        out = {
            "probe": "delta_stream_backlog_pacing",
            "commits": commits,
            "batches": batches,
            "files_delivered": len(delivered),
            "first10_mean_ms": round(sum(head) / len(head), 3),
            "last10_mean_ms": round(sum(tail) / len(tail), 3),
            "max_batch_ms": round(max(timings_ms), 3),
            "flat": sum(tail) / len(tail) < 5 * (sum(head) / len(head)) + 1.0,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
