#!/usr/bin/env python
"""Per-stage wall-clock profile of the corpus_funnel bench entry.

Times each CurationPipeline stage by hooking _advance, plus the
iterative sub-loops (k-means rounds, connected-components rounds) via
job-level timing. Run on a QUIET box; prints one JSON object.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_etl_spark.session import session_builder  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session_builder(
        app_name="funnel-profile", master=f"local[{cpus}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    from azure_etl_spark.plans.corpus_pipeline import CurationPipeline

    stage_t: dict[str, float] = {}
    orig_advance = CurationPipeline._advance
    last = [time.perf_counter()]

    def timed_advance(self, name, df, prev):
        out = orig_advance(self, name, df, prev)
        now = time.perf_counter()
        stage_t[name] = round(now - last[0], 3)
        last[0] = now
        return out

    CurationPipeline._advance = timed_advance
    import bench

    t0 = time.perf_counter()
    last[0] = t0
    bench._run_corpus_funnel(spark, sf_dir)
    total = time.perf_counter() - t0
    CurationPipeline._advance = orig_advance
    print(json.dumps({"total": round(total, 3), "stages": stage_t}))


if __name__ == "__main__":
    main()
