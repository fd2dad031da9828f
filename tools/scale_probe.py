#!/usr/bin/env python
"""Scale probe: replicate the sf0.1 fixtures Nx with re-keyed ids and
time the headline queries at both scales on the same session.

The small-SF oracle runs prove CORRECTNESS; this probes the SCALING
claim directly: a query whose plan is healthy (pushdown, partial aggs,
broadcasts, no super-linear stage) should run ~Nx slower at Nx data on
a fixed-core box — markedly super-linear growth exposes a plan that
would not survive a 100 TB cluster. Results are printed as one JSON
line and summarized in SCALE.md's "Measured scaling" section.

    python tools/scale_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.plans.queries import QUERIES  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402
from azure_etl_spark.sources.files import load_table  # noqa: E402

PROBES = [
    "flagship_gold_minmax",
    "dedup_distinct",
    "tpch_q1ish",
    "tpch_q6ish",
    "word_entropy_docs",
    "minhash_near_dup",
    "hash_sample_orders",
    "events_hourly_rollup",
]

# id column to re-key per replica so replicated rows stay distinct
REKEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "events": "event_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
}


def _word_tagger(tag: str):
    # factory keeps the lambda ARITY-1: F.transform calls a 2-parameter
    # lambda as (element, INDEX) and would silently replace the tag
    # (the round-8 minhash-seed bug class)
    return lambda w: F.concat(F.lit(tag), w)


def build_big(spark, sf_dir: str, out_dir: str, n: int) -> None:
    """Replicate sf0.1 ``n``x with re-keyed ids. Replicas must be
    genuinely DISTINCT content, not just distinct keys (round 10,
    VERDICT r9 #7 — id-only replication made the funnel's sf1 record
    collapse back to the sf0.1 corpus at the exact-dedup stage):

    - documents: every word of replica i>0 is prefixed ``x{i}`` — an
      injective per-word transform, so each replica keeps the ORIGINAL
      corpus's exact shingle-overlap structure internally (near-dup
      clusters replicate) while sharing zero shingles across replicas
      (no cross-replica dups, no artificial 10-cliques);
    - embeddings: replica i's vectors are cyclically shifted by i
      dimensions — an orthogonal transform, so intra-replica cosine
      structure is preserved exactly while cross-replica similarity
      decorrelates (SemDeDup clusters replicate instead of collapsing).
    """
    for t, key in REKEY.items():
        src = load_table(spark, sf_dir, t)
        parts = []
        for i in range(n):
            p = src.withColumn(key, F.col(key) + F.lit(i * 10_000_000))
            if t == "documents" and i > 0:
                p = p.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(F.split("text", " "), _word_tagger(f"x{i}")),
                    ),
                )
            if t == "embeddings" and i > 0:
                s = i % 64
                p = p.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {s + 1}, "
                        f"size(embedding) - {s}), slice(embedding, 1, {s}))"
                    ),
                )
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, sf_dir, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )


def time_query(fn, spark, sf_dir: str) -> float:
    df = fn(spark, sf_dir)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        session_builder(app_name="scale-probe", master="local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        build_big(spark, sf_dir, big_dir, n)
        out = {"replication": n, "base": sf_dir, "queries": {}}
        for name in PROBES:
            fn = QUERIES[name].fn
            t_small = time_query(fn, spark, sf_dir)
            t_big = time_query(fn, spark, big_dir)
            out["queries"][name] = {
                "small_s": t_small,
                "big_s": t_big,
                "ratio": round(t_big / t_small, 2) if t_small > 0 else None,
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
