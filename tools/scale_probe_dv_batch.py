#!/usr/bin/env python
"""Heavy-delete probe for read_delta_log_table's DV masking (round 13,
VERDICT r12 #2): a table whose deletion vectors enumerate >= 10^7
positions must read WITHOUT the driver materializing the positions.

Claims probed:
1. Over the cardinality budget the reader takes the EXECUTOR-SIDE
   path (mapInPandas, per-file decode): driver RSS stays flat while
   the table's total DV cardinality is ~12M positions.
2. The pre-round-13 unconditional broadcast path (forced here via a
   huge budget) CANNOT read this table at all on a default driver —
   enumerating ~12M positions into Python tuples and broadcasting
   them dies with Spark's "Not enough memory to build and broadcast"
   — which is exactly why the budget gate exists. (Path parity at
   under-budget scale is pinned by
   tests/test_delta_export.py::test_read_delta_log_table_dv_executor_side.)

Usage: python tools/scale_probe_dv_batch.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.sources.delta_export import (  # noqa: E402
    export_delta_log,
    read_delta_log_table,
)
from azure_etl_spark.sources.snapshot import (  # noqa: E402
    delete_from_snapshot,
    write_snapshot,
)

N_FILES = 8
ROWS_PER_FILE = 2_000_000  # 16M rows; ~12M DV-deleted below


def driver_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp(prefix="dvbatch_") + "/tbl"
    for i in range(N_FILES):
        df = (
            spark.range(i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE)
            .select(F.col("id"), (F.col("id") % 97).alias("grp"))
            .coalesce(1)
        )
        write_snapshot(df, path, mode="overwrite" if i == 0 else "append")
    # MOR delete of 3/4 of every file -> ~12M DV positions table-wide
    delete_from_snapshot(spark, path, [("grp", "<", 73)], mode="merge_on_read")
    t0 = time.time()
    export_delta_log(spark, path)
    t_export = time.time() - t0
    want = spark.range(N_FILES * ROWS_PER_FILE).filter("id % 97 >= 73").count()

    # 1) executor-side path (the default: 12M >> 1M budget)
    rss0 = driver_rss_mb()
    t0 = time.time()
    got_exec = read_delta_log_table(spark, path).count()
    t_exec = time.time() - t0
    rss1 = driver_rss_mb()

    assert got_exec == want, (got_exec, want)
    print(
        f"rows={N_FILES * ROWS_PER_FILE:,} dv_positions~{N_FILES * ROWS_PER_FILE * 3 // 4:,} "
        f"visible={want:,} export={t_export:.1f}s"
    )
    print(
        f"executor path: {t_exec:6.2f}s  driver RSS {rss0:7.1f} -> {rss1:7.1f} MB "
        f"(delta {rss1 - rss0:+.1f})"
    )

    # 2) the old unconditional path, forced: expected to DIE on a
    # default driver — the probe's point, not a failure of the probe
    t0 = time.time()
    try:
        read_delta_log_table(
            spark, path, dv_broadcast_max_positions=1 << 40
        ).count()
        print(
            f"broadcast path: survived in {time.time() - t0:.2f}s "
            f"(driver RSS now {driver_rss_mb():.1f} MB) — raise N_FILES "
            "to show the cap"
        )
    except Exception as e:  # Py4JJavaError: broadcast OOM
        msg = str(e).splitlines()[0][:160]
        print(
            f"broadcast path: FAILED after {time.time() - t0:.1f}s as "
            f"expected at this cardinality ({msg})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
