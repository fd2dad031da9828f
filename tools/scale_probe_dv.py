"""Scale probe: deletion-vector export + positional-delete read cost.

Claims probed (SCALE.md 'Deletion-vector interop'):
1. Exporting a merge-on-read version as deletion vectors costs
   O(covered files), independent of TABLE size — the bitmap build job
   reads only the covered files and ships one compressed bitmap per
   file to the driver.
2. The positional-delete read path (broadcast anti-join on
   _metadata.row_index) adds only a small constant factor over the
   plain scan of the covered files, and uncovered files pay nothing.

Usage: python tools/scale_probe_dv.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.sources.delta_export import export_delta_log  # noqa: E402
from azure_etl_spark.sources.snapshot import (  # noqa: E402
    delete_from_snapshot,
    read_snapshot,
    write_snapshot,
)

ROWS_PER_FILE = 250_000


def build(spark, path, n_files):
    for i in range(n_files):
        df = (
            spark.range(i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE)
            .select(F.col("id"), (F.col("id") % 97).alias("grp"))
            .coalesce(1)
        )
        write_snapshot(df, path, mode="overwrite" if i == 0 else "append")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"rows_per_file={ROWS_PER_FILE}")
    for n_files in (4, 16, 64):  # 4 doubles as JVM/Arrow warmup
        path = tempfile.mkdtemp(prefix=f"dvprobe_{n_files}_") + "/tbl"
        build(spark, path, n_files)
        # plain read baseline
        t0 = time.time()
        full = read_snapshot(spark, path).count()
        t_plain = time.time() - t0
        # MOR delete covering exactly ONE file's key range
        delete_from_snapshot(
            spark, path, [("id", "between", (1000, 5000))], mode="merge_on_read"
        )
        t0 = time.time()
        read_snapshot(spark, path).count()
        t_mor = time.time() - t0
        # isolate the DV version's export: pre-export everything else,
        # then time ONLY the incremental MOR-version export (bitmap
        # build bounded by the single covered file regardless of
        # n_files)
        export_delta_log(spark, path, upto_version=n_files - 1)
        t0 = time.time()
        export_delta_log(spark, path)
        t_export = time.time() - t0
        print(
            f"files={n_files:3d} rows={full:>9,} plain_read={t_plain:6.2f}s "
            f"mor_read={t_mor:6.2f}s dv_version_export={t_export:6.2f}s"
        )
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
