#!/usr/bin/env python
"""Measure what stats-based file skipping buys on a selective read.

Writes sf0.1 lineitem (~600k rows) into two snapshot tables — one with
files laid out by arrival order (repartition(N): every file spans the
whole l_orderkey domain), one clustered on l_orderkey
(write_snapshot(cluster_by=...)) — then times the same selective
predicate read on both and reports files opened vs skipped.

The absolute times at this scale are small; the point is the *ratio*
structure: unclustered reads open every file regardless of predicate
selectivity (IO scales with table size), clustered+skipped reads open
O(selectivity) files (IO scales with answer size). At 100 TB that ratio
is the difference between a full-table scan and touching a few hundred
MB.

    python tools/snapshot_skip_probe.py [n_files]   # default 32
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.session import get_session  # noqa: E402
from azure_etl_spark.sources.files import load_table  # noqa: E402
from azure_etl_spark.sources.snapshot import (  # noqa: E402
    read_snapshot,
    resolve_scan,
    write_snapshot,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def time_read(spark, path, pred):
    t0 = time.monotonic()
    n = read_snapshot(spark, path, where=pred).agg(
        F.count(F.lit(1)), F.sum("l_extendedprice")
    ).collect()
    return time.monotonic() - t0, n[0][0]


def main(n_files: int = 32) -> None:
    spark = get_session(app_name="snapshot-skip-probe")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    hi_key = li.agg(F.max("l_orderkey")).collect()[0][0]
    # ~1% of the key domain
    pred = [("l_orderkey", "between", (int(hi_key * 0.40), int(hi_key * 0.41)))]

    base = tempfile.mkdtemp(prefix="skip_probe_")
    flat, clustered = f"{base}/flat", f"{base}/clustered"
    write_snapshot(li.repartition(n_files), flat)
    write_snapshot(li, clustered, cluster_by=["l_orderkey"], cluster_files=n_files)

    for label, path in (("unclustered", flat), ("clustered", clustered)):
        opened, skipped = resolve_scan(spark, path, where=pred)
        best = min(time_read(spark, path, pred)[0] for _ in range(3))
        rows = time_read(spark, path, pred)[1]
        print(
            f"{label:12s} files_opened={len(opened):3d} files_skipped={len(skipped):3d} "
            f"rows={rows} best_of_3={best:.3f}s"
        )

    # --- two-dimensional: linear (l_orderkey, l_partkey) vs Z-order ---
    hi_part = li.agg(F.max("l_partkey")).collect()[0][0]
    pred_b = [("l_partkey", "between", (int(hi_part * 0.40), int(hi_part * 0.41)))]
    linear2, zorder2 = f"{base}/linear2", f"{base}/zorder2"
    write_snapshot(li, linear2, cluster_by=["l_orderkey", "l_partkey"],
                   cluster_files=n_files)
    write_snapshot(li, zorder2, cluster_by=["l_orderkey", "l_partkey"],
                   cluster_files=n_files, cluster_mode="zorder")
    print("-- secondary-column predicate (l_partkey ~1% of domain):")
    for label, path in (("linear(a,b)", linear2), ("zorder(a,b)", zorder2)):
        opened, skipped = resolve_scan(spark, path, where=pred_b)
        print(f"{label:12s} files_opened={len(opened):3d} files_skipped={len(skipped):3d}")
    print("-- leading-column predicate (l_orderkey ~1% of domain):")
    for label, path in (("linear(a,b)", linear2), ("zorder(a,b)", zorder2)):
        opened, skipped = resolve_scan(spark, path, where=pred)
        print(f"{label:12s} files_opened={len(opened):3d} files_skipped={len(skipped):3d}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
