#!/usr/bin/env python
"""Interleaved same-session A/B of the round-14 KLL collapse
(window+crossjoin+re-aggregate -> one sketch-sized aggregate in
kll_quantiles / _kll_meta): alternates the OLD (round-13 window)
implementations — inlined below, monkeypatched into operators.sketch —
with the NEW shipped ones, rebuilding each query's DataFrame per run
(bench discipline) and timing build+noop-write. Output parity is
asserted every cycle (collected rows equal as multisets).

    python tools/ab_kll_r14.py [cycles]    # default 6
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from azure_etl_spark import operators  # noqa: E402
from azure_etl_spark.operators import sketch  # noqa: E402
from azure_etl_spark.plans.queries import QUERIES  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402

QUERY_NAMES = ["kll_quantiles_orders", "kll_bucket_orders"]


# ---- round-13 implementations, verbatim ----------------------------------

def _old_kll_meta(rows: DataFrame, k: int, group_cols: tuple = ()) -> DataFrame:
    from pyspark.sql import Window

    lv = (F.length(F.bin(F.col("p"))) - 1).cast("int")
    hist = rows.groupBy(*group_cols, lv.alias("l")).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy(F.col("l").desc()).rowsBetween(Window.unboundedPreceding, 0)
    scored = hist.select(*group_cols, "l", "cnt", F.sum("cnt").over(w).alias("s"))
    return scored.groupBy(*group_cols).agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.coalesce(
            F.max(F.when(F.col("s") > F.lit(k), F.col("l") + 1)), F.lit(0)
        )
        .cast("int")
        .alias("lvl"),
    )


def _old_kll_quantiles(sketch_df: DataFrame, quantiles) -> DataFrame:
    from pyspark.sql import Window

    spark = sketch_df.sparkSession
    ranked = sketch_df.select(
        "v",
        "n",
        "lvl",
        F.row_number().over(Window.orderBy("v", "p")).alias("rank"),
    )
    qs = spark.createDataFrame(
        [(int(a), int(c)) for a, c in quantiles], "q_num int, q_den int"
    )
    reached = (
        F.col("rank") * sketch._shl1(F.col("lvl")) * F.col("q_den")
        >= F.col("n") * F.col("q_num")
    )
    return (
        ranked.crossJoin(F.broadcast(qs))
        .groupBy("q_num", "q_den")
        .agg(
            F.coalesce(F.min(F.when(reached, F.col("v"))), F.max("v"))
            .cast("bigint")
            .alias("est")
        )
    )


NEW = (sketch._kll_meta, sketch.kll_quantiles)
OLD = (_old_kll_meta, _old_kll_quantiles)


def set_variant(old: bool) -> None:
    sketch._kll_meta, sketch.kll_quantiles = OLD if old else NEW


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session_builder(
        app_name="ab-kll-r14", master=f"local[{cpus}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # warm both variants' codegen once
    for old in (True, False):
        set_variant(old)
        for q in QUERY_NAMES:
            QUERIES[q].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    times: dict[tuple[str, str], list[float]] = {}
    for c in range(cycles):
        for old in (True, False):
            set_variant(old)
            for q in QUERY_NAMES:
                t0 = time.perf_counter()
                df = QUERIES[q].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                times.setdefault((q, "old" if old else "new"), []).append(dt)
        # parity once per cycle: old and new rows identical as multisets
        for q in QUERY_NAMES:
            set_variant(True)
            a = sorted(map(tuple, QUERIES[q].fn(spark, sf_dir).collect()))
            set_variant(False)
            b = sorted(map(tuple, QUERIES[q].fn(spark, sf_dir).collect()))
            assert a == b, f"parity broken for {q}"
    set_variant(False)

    out = {}
    for (q, var), ts in sorted(times.items()):
        ts = sorted(ts)
        out[f"{q}:{var}"] = {
            "min": round(ts[0], 3),
            "median": round(ts[len(ts) // 2], 3),
            "n": len(ts),
        }
    print(json.dumps({"ab": "kll_r14_window_collapse", "parity": "ok",
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
