#!/usr/bin/env python
"""Dump .explain("formatted") for every bench query to plans/r14/.

Usage: python tools/dump_plans_r14.py <suffix> [query ...]
  suffix: "before" or "after" (file names <query>_<suffix>.txt)
  query:  optional subset; default = every bench=True registry query.

Planning only — no query is executed (explain goes through the
analyzer/optimizer, not the scheduler), so this is safe to run next to
other work. The corpus_funnel / medallion / delta rows are composite
driver programs, not single DataFrames; their plan evidence lives in
PLANS.md + SCALE.md stage decompositions instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.plans.queries import QUERIES  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = session_builder(app_name="dump-plans-r13").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in QUERIES.items():
        if not spec.bench:
            continue
        if only and name not in only:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
