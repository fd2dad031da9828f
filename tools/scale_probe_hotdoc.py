#!/usr/bin/env python
"""Planted-hot-doc skew probe for exact_text_dedup (VERDICT r10 #2).

Real dedup input is skewed by definition: crawl boilerplate pages occur
10^6-10^7 times. The round-10 plan (``row_number() OVER (PARTITION BY
md5(content))``) shuffled EVERY copy's full text to one window task — a
scale-killer invisible at sf0.1 where content is near-unique. The
round-11 plan (``min_by(struct, id)`` grouped by hash) collapses
duplicates in the partial (map-side) aggregate, so the single Exchange
forwards at most one candidate row per (hash x map partition).

This probe plants ONE document with ``copies`` exact replicas (distinct
ids) into the sf fixture corpus and runs BOTH plans to a full
materialization (noop sink), recording wall time and — via the Spark UI
REST API — the MAX single-task shuffle-read bytes of each job's reduce
stage. Healthy = the min_by plan's max-task shuffle read stays at the
no-hot-doc baseline (the hot doc adds ~one candidate row per map task);
the window plan's grows with the planted copy count (every full-text
copy lands on one task).

    python tools/scale_probe_hotdoc.py [copies]   # default 100000
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.operators.dedup import exact_text_dedup, normalized_text  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def window_exact_dedup(df, id_col="doc_id", text_col="text"):
    """The round-10 plan, kept here verbatim as the probe's control arm."""
    hashed = df.withColumn("__h", F.md5(normalized_text(text_col)))
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def max_task_shuffle_read(spark, since_stage: int) -> tuple[int, int, int]:
    """(max single-task shuffle-read bytes, max single-task shuffle-read
    RECORDS, latest stage id) over stages newer than ``since_stage``.
    Records are the honest skew signal here: the planted copies are
    byte-identical texts, so lz4 compresses the skewed partition's
    bytes away while its record count still shows every copy landing
    on one task."""
    worst_b = worst_r = 0
    latest = since_stage
    for st in _rest(spark, "/stages?status=complete"):
        sid = st["stageId"]
        latest = max(latest, sid)
        if sid <= since_stage or not st.get("shuffleReadBytes"):
            continue
        det = _rest(
            spark,
            f"/stages/{sid}?withSummaries=true&quantiles=0.0,0.5,1.0",
        )
        for attempt in det if isinstance(det, list) else [det]:
            dist = attempt.get("taskMetricsDistributions") or {}
            srm = dist.get("shuffleReadMetrics") or {}
            if srm.get("readBytes"):
                worst_b = max(worst_b, int(srm["readBytes"][-1]))
            if srm.get("readRecords"):
                worst_r = max(worst_r, int(srm["readRecords"][-1]))
    return worst_b, worst_r, latest


def run(label, plan_fn, docs, spark, since):
    t0 = time.time()
    plan_fn(docs).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    worst_b, worst_r, latest = max_task_shuffle_read(spark, since)
    return {"plan": label, "sec": round(wall, 2),
            "max_task_shuffle_read_mb": round(worst_b / 2**20, 2),
            "max_task_shuffle_read_records": worst_r}, latest


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = (
        session_builder("hotdoc-probe")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    hot_row = base.orderBy("doc_id").limit(1).select("text", "lang", "source", "n_chars")
    hot = (
        spark.range(copies)
        .select((F.col("id") + 10_000_000).alias("doc_id"))
        .join(F.broadcast(hot_row))
        .select(*base.columns)
    )
    planted = base.unionByName(hot).repartition(32)
    planted = planted.localCheckpoint()  # isolate plant cost from the arms

    results = []
    since = -1
    for label, fn in (
        ("baseline_minby_no_hot", exact_text_dedup),
        ("minby_hot", exact_text_dedup),
        ("window_hot", window_exact_dedup),
    ):
        frame = base if label.endswith("no_hot") else planted
        rec, since = run(label, fn, frame, spark, since)
        rec["copies"] = 0 if label.endswith("no_hot") else copies
        # survivors must be identical across arms (the planted clones all
        # hash together; min id wins and the min is in the base corpus)
        rec["survivors"] = (exact_text_dedup if "minby" in label else window_exact_dedup)(frame).count()
        results.append(rec)
        print(json.dumps(rec), flush=True)

    assert results[1]["survivors"] == results[2]["survivors"]
    print(json.dumps({"probe": "hotdoc", "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
