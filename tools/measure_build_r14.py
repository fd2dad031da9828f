#!/usr/bin/env python
"""Per-query DataFrame CONSTRUCTION time for every bench row (round 14,
VERDICT r13 #4): since the round-13 boundary fix the timed region
includes ``spec.fn(spark, sf_dir)``, so driver-serial plan-build cost
(py4j Column-builder loops, big SQL parses) is real bench seconds.
This isolates it: build each query's DataFrame WITHOUT executing,
min-of-3, after one warm build (classloading/analysis caches out of
the measurement the same way bench.py warms codegen).

    python tools/measure_build_r14.py          # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.plans.queries import QUERIES  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session_builder(
        app_name="build-time-profile", master=f"local[{cpus}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, float] = {}
    for name, spec in QUERIES.items():
        if not spec.bench:
            continue
        try:
            spec.fn(spark, sf_dir)  # warm build (JIT/analysis caches)
        except Exception as e:  # pragma: no cover
            out[name] = -1.0
            print(f"# {name}: build failed: {e}", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"build_sec": out, "total": round(sum(v for v in out.values() if v > 0), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
