#!/usr/bin/env python
"""Materialize a persistent ~sf1 fixture set by replicating sf0.1 10x
with re-keyed ids (same construction as tools/scale_probe.py, kept on
disk so benches are repeatable): the round-5 verdict flagged the ±30%
sandbox-noise floor of sf0.1's sub-second queries as the bench guard's
weakness — at 10x data the headline queries run seconds, not hundreds
of milliseconds, so per-query regressions separate from timer/GC noise.

    python tools/make_sf1.py [out_dir]   # default /root/repo/.benchdata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.session import session_builder  # noqa: E402
from tools.scale_probe import build_big  # noqa: E402

N = 10
SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata", "sf1")
    )
    spark = session_builder(app_name="make-sf1", master="local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    build_big(spark, SRC, out, N)
    total = 0
    for root, _dirs, files in os.walk(out):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    print(f"built {out} ({N}x sf0.1, {total / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
