#!/usr/bin/env python
"""Planning-cost probe for the foreign-Delta readers over a LONG log
(round 13): a 10k-commit estate must not pay O(commits) where
O(log commits) is available, and log replay must stay linear with a
small constant.

Synthesizes logs of N tiny commits (metaData + one add each, stamped
monotonic commitInfo timestamps; no data files — planning never reads
data), then measures:

1. replay_delta_log wall time vs N (expected linear, small constant);
2. timestampAsOf resolution: number of per-commit timestamp lookups
   via the shared bisect (expected ~log2 N) and wall time;
3. the streaming source's _resolve_starting_timestamp lookup count
   (same bisect, side="left").

Usage: python tools/scale_probe_delta_planning.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from azure_etl_spark.sources.delta_export import (  # noqa: E402
    _commit_ts_ms_jvm,
    bisect_versions_by_ts,
    replay_delta_log,
)

SCHEMA = {
    "type": "struct",
    "fields": [{"name": "k", "type": "long", "nullable": True,
                "metadata": {}}],
}


def synth_log(root: str, n: int) -> str:
    path = os.path.join(root, f"log{n}")
    ldir = os.path.join(path, "_delta_log")
    os.makedirs(ldir)
    for v in range(n):
        acts = []
        if v == 0:
            acts += [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {"metaData": {
                    "id": "probe", "format": {"provider": "parquet",
                                              "options": {}},
                    "schemaString": json.dumps(SCHEMA),
                    "partitionColumns": [], "configuration": {},
                    "createdTime": 1700000000000,
                }},
            ]
        acts.append({"add": {
            "path": f"part-{v:06d}.parquet", "partitionValues": {},
            "size": 1024, "modificationTime": 1700000000000 + v * 1000,
            "dataChange": True,
        }})
        acts.append({"commitInfo": {"timestamp": 1700000000000 + v * 1000}})
        with open(os.path.join(ldir, f"{v:020d}.json"), "w") as f:
            f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    return path


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="delta_planning_")
    for n in (500, 2000, 8000):
        path = synth_log(root, n)
        t0 = time.time()
        state = replay_delta_log(spark, path)
        t_replay = time.time() - t0
        assert len(state["live"]) == n

        calls = [0]

        def ts_of(v):
            calls[0] += 1
            return _commit_ts_ms_jvm(spark, path, v)

        versions = list(range(n))
        probe_ts = 1700000000000 + (n // 2) * 1000 + 500
        t0 = time.time()
        idx = bisect_versions_by_ts(versions, ts_of, probe_ts, side="right")
        t_asof = time.time() - t0
        n_calls_asof = calls[0]
        assert versions[idx - 1] == n // 2

        calls[0] = 0
        bisect_versions_by_ts(versions, ts_of, probe_ts, side="left")
        n_calls_start = calls[0]

        print(
            f"commits={n:5d} replay={t_replay:6.2f}s "
            f"({t_replay / n * 1000:.2f} ms/commit) "
            f"timestampAsOf: {n_calls_asof} ts lookups in {t_asof * 1000:6.1f} ms "
            f"(log2={n.bit_length()}); startingtimestamp: {n_calls_start} lookups"
        )
    spark.stop()


if __name__ == "__main__":
    main()
