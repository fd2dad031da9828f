#!/usr/bin/env python
"""Interleaved A/B for the round-13 shared-subtree checkpoints in the
kll/curation operators (kll_quantiles, remove_duplicate_spans,
contamination_overlap, remove_duplicate_segments + hot-subset join).

OLD variants are inlined copies of the pre-change DataFrame code (no
localCheckpoint; full-frequency inner join for segments); NEW variants
call the shipped operators. Runs alternate old/new per cycle in ONE
session so box load hits both equally. Per-query: min/median wall time
(noop sink, DataFrame rebuilt per run), executed-stage/task accounting
(numCompletedTasks only — skipped stages excluded), and an output-parity
check on the first cycle.

Usage: python tools/ab_shared_subtrees.py [cycles=6] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.operators.curation import (  # noqa: E402
    contamination_overlap,
    remove_duplicate_segments,
    remove_duplicate_spans,
    segment_docs,
)
from azure_etl_spark.operators.dedup import (  # noqa: E402
    normalized_text,
    word_shingles,
)
from azure_etl_spark.operators.sketch import (  # noqa: E402
    _kll_meta,
    _shl1,
    kll_quantiles,
    kll_table,
)
from azure_etl_spark.plans.queries import QUERIES  # noqa: E402
from azure_etl_spark.session import session_builder  # noqa: E402
from azure_etl_spark.sources.files import (  # noqa: E402
    ensure_min_partitions,
    load_table,
)

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 6


# ---------------------------------------------------------------- OLD


def old_kll_quantiles(sketch: DataFrame, quantiles) -> DataFrame:
    spark = sketch.sparkSession
    ranked = sketch.select(
        "v", "n", "lvl",
        F.row_number().over(Window.orderBy("v", "p")).alias("rank"),
    )
    qs = spark.createDataFrame(
        [(int(a), int(c)) for a, c in quantiles], "q_num int, q_den int"
    )
    reached = (
        F.col("rank") * _shl1(F.col("lvl")) * F.col("q_den")
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


def old_kll_bucket(df, col, key, quantiles, bucket_col="bucket", k=1024):
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("bigint")
    cut = old_kll_quantiles(kll_table(df, col, key, k=k), quantiles)
    cuts = cut.agg(F.array_sort(F.collect_set("est")).alias("__cuts"))
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            bucket_col,
            (F.lit(1) + F.size(F.filter(F.col("__cuts"), lambda x: x < v))).cast("int"),
        )
        .drop("__cuts")
    )


def old_remove_duplicate_spans(df, k=8, min_dup=2, by="docs",
                               id_col="doc_id", text_col="text"):
    t = df.select(F.col(id_col), F.split(normalized_text(text_col), " ").alias("__w"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("__w") - k, F.lit(0)))
    pos_grams = t.select(
        id_col,
        F.posexplode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__w", i + 1, k)))
        ).alias("pos", "gram"),
    )
    freq = F.count_distinct(F.col(id_col)) if by == "docs" else F.count(F.lit(1))
    dup_grams = (
        pos_grams.groupBy("gram").agg(freq.alias("__nd"))
        .filter(F.col("__nd") >= min_dup).select("gram")
    )
    starts = (
        pos_grams.join(dup_grams, "gram")
        .groupBy(id_col).agg(F.collect_set("pos").alias("__starts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + k - 1),
            )
        )
    )
    kept = F.filter(F.col("__w"), lambda w, i: ~F.array_contains(F.col("__covered"), i))
    return (
        t.join(starts, id_col, "left")
        .withColumn("__covered", covered)
        .select(
            id_col,
            F.array_join(kept, " ").alias("cleaned_text"),
            F.size(kept).alias("n_words_kept"),
            (F.size("__w") - F.size(kept)).alias("n_words_removed"),
        )
    )


def old_contamination_overlap(train, eval_docs, n=8, id_col="doc_id",
                              text_col="text", flag_threshold=1):
    eval_grams = (
        eval_docs.select(F.explode(word_shingles(text_col, n)).alias("ngram")).distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("ngram")
    )
    hits = (
        train_grams.join(F.broadcast(eval_grams), "ngram")
        .groupBy(id_col).agg(F.count("*").alias("overlap_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("overlap_ngrams", F.coalesce(F.col("overlap_ngrams"), F.lit(0)))
        .withColumn("contaminated", F.col("overlap_ngrams") >= flag_threshold)
    )


def old_remove_duplicate_segments(df, words_col, id_col="doc_id",
                                  seg_len=3, max_occurrences=4):
    segs = segment_docs(df, words_col, id_col, seg_len)
    freq = segs.groupBy("segment").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs_with")
    )
    tagged = segs.join(freq, "segment")
    kept = F.when(F.col("n_docs_with") <= max_occurrences, 1).otherwise(0)
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("n_docs_with") <= max_occurrences,
                                F.struct("seg_idx", "segment"),
                            )
                        )
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("cleaned_text"),
            F.sum(kept).alias("n_seg_kept"),
            F.sum(1 - kept).alias("n_seg_dropped"),
        )
    )


# ------------------------------------------------------- query shapes


def _td(spark):
    return ensure_min_partitions(load_table(spark, SF, "documents"))


def _orders_kll(spark):
    return ensure_min_partitions(
        load_table(spark, SF, "orders").select(
            (F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            F.col("o_orderkey"),
        )
    )


def _orders_bucket(spark):
    return ensure_min_partitions(
        load_table(spark, SF, "orders").select(
            "o_totalprice",
            (F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            "o_orderkey",
        )
    )


QS = [(50, 100), (90, 100), (99, 100)]
BQ = [(25, 100), (50, 100), (75, 100)]


def build(spark, name, variant):
    old = variant == "old"
    if name == "kll_quantiles_orders":
        fn = old_kll_quantiles if old else kll_quantiles
        return fn(kll_table(_orders_kll(spark), "v", "o_orderkey", k=1024), QS).orderBy("q_num")
    if name == "kll_bucket_orders":
        if old:
            b = old_kll_bucket(_orders_bucket(spark), "v", "o_orderkey", BQ)
        else:
            from azure_etl_spark.operators.sketch import kll_bucket
            b = kll_bucket(_orders_bucket(spark), "v", "o_orderkey", BQ)
        return (
            b.groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.min("o_totalprice").cast("decimal(18,2)").alias("lo"),
                 F.max("o_totalprice").cast("decimal(18,2)").alias("hi"))
            .orderBy("bucket")
        )
    if name == "dedup_duplicate_spans_docs":
        fn = old_remove_duplicate_spans if old else remove_duplicate_spans
        return fn(_td(spark), k=8).orderBy("doc_id")
    if name == "remove_dup_segments_docs":
        fn = old_remove_duplicate_segments if old else remove_duplicate_segments
        return fn(_td(spark), F.split(normalized_text("text"), " "),
                  seg_len=3, max_occurrences=4).orderBy("doc_id")
    if name == "contamination_ngram_overlap":
        docs = _td(spark)
        fn = old_contamination_overlap if old else contamination_overlap
        return fn(docs.filter(F.col("source") != "src0"),
                  docs.filter(F.col("source") == "src0"), n=8)
    raise ValueError(name)


NAMES = [
    "kll_quantiles_orders",
    "kll_bucket_orders",
    "dedup_duplicate_spans_docs",
    "remove_dup_segments_docs",
    "contamination_ngram_overlap",
]


def main():
    spark = session_builder(app_name="ab-shared-subtrees", master="local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # parity first (and warms both shapes)
    for nm in NAMES:
        a = build(spark, nm, "old").collect()
        b = build(spark, nm, "new").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), f"PARITY FAIL {nm}"
        print(f"parity OK {nm} ({len(a)} rows)")

    res = {nm: {"old": [], "new": []} for nm in NAMES}
    shapes = {nm: {} for nm in NAMES}
    for cyc in range(CYCLES):
        for nm in NAMES:
            for variant in ("old", "new") if cyc % 2 == 0 else ("new", "old"):
                st = spark.sparkContext.statusTracker()
                before = set(st.getJobIdsForGroup(None) or [])
                # timed region includes CONSTRUCTION: with AQE a lazy
                # localCheckpoint materializes upstream stages inside
                # Dataset.checkpoint's toRdd, i.e. at build time — the
                # same honest boundary bench.py uses (round 13 fix)
                t0 = time.perf_counter()
                df = build(spark, nm, variant)
                df.write.format("noop").mode("overwrite").save()
                res[nm][variant].append(round(time.perf_counter() - t0, 3))
                if cyc == 0:
                    st = spark.sparkContext.statusTracker()
                    jobs = [j for j in (st.getJobIdsForGroup(None) or []) if j not in before]
                    seen, tasks, big = set(), 0, 0
                    for j in jobs:
                        ji = st.getJobInfo(j)
                        if ji:
                            for sid in ji.stageIds:
                                if sid in seen:
                                    continue
                                seen.add(sid)
                                si = st.getStageInfo(sid)
                                if si and si.numCompletedTasks > 0:
                                    tasks += si.numCompletedTasks
                                    if si.numCompletedTasks >= 16:
                                        big += 1
                    shapes[nm][variant] = {"done_tasks": tasks, "corpus_stages": big}

    out = {}
    for nm in NAMES:
        o, n = sorted(res[nm]["old"]), sorted(res[nm]["new"])
        out[nm] = {
            "old_min": o[0], "new_min": n[0],
            "old_med": o[len(o) // 2], "new_med": n[len(n) // 2],
            "old_runs": res[nm]["old"], "new_runs": res[nm]["new"],
            "shape": shapes[nm],
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
