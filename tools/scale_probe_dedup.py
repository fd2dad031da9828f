#!/usr/bin/env python
"""Dedup/ANN scale probe: grow documents/embeddings Nx with DISTINCT
content and measure wall time AND candidate-pair counts.

Why not reuse tools/scale_probe.py's replication here: re-keying ids
while copying text/vectors verbatim plants N exact clones per base row,
so any CORRECT near-dup op must emit O(N^2) true pairs — quadratic
output by construction, which says nothing about plan health, and the
registry near-dup queries additionally filter to a fixed doc_id range
(oracle-sized), so timing them at Nx measures constant work. This probe
drives the OPERATORS over the full replicated tables and perturbs each
replica into distinct content:

- documents: every word gets a per-replica suffix tag — every shingle
  differs across replicas for ANY replica count (a letter-rotation
  scheme collides past 26 replicas and was measured doing so: cloned
  content inflated 32x minhash pairs 164x), so near-dup candidate
  growth reflects bucketing behavior, not planted duplicates;
- embeddings: circular shift by ``i mod dim`` — norms preserved,
  replicas near-orthogonal to their base vectors.

The claim under test is "O(bands x docs) / O(bucket-collision)
candidates, never all-pairs": candidate counts should grow ~linearly
with rows (ratio candidates/rows roughly flat), and wall time well
under Nx on a fixed-core box. Super-linear candidate growth or time
growth >> Nx exposes a plan that would not survive 100 TB.

    python tools/scale_probe_dedup.py [factor ...]   # default: 1 8 32
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.session import session_builder  # noqa: E402
from azure_etl_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _perturb_text(col, i: int):
    """Replica-unique content: suffix every word with the replica tag.
    Structure (word count, segmentation) is preserved while every
    shingle differs across replicas — valid for any replica count."""
    if i == 0:
        return col
    return F.array_join(
        F.transform(F.split(col, r"\s+"), lambda w: F.concat(w, F.lit(f"~r{i}"))),
        " ",
    )


def _shift_vec(col, i: int, dim: int = 64):
    s = i % dim
    if s == 0:
        return col
    return F.concat(F.slice(col, s + 1, dim - s), F.slice(col, 1, s))


def build(spark, out_dir: str, n: int) -> tuple[str, str]:
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    d_parts, e_parts = [], []
    for i in range(n):
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "source",
                _perturb_text(F.col("text"), i).alias("text"),
            )
        )
        e_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                _shift_vec(F.col("embedding"), i).alias("embedding"),
            )
        )
    dbig, ebig = d_parts[0], e_parts[0]
    for p in d_parts[1:]:
        dbig = dbig.unionByName(p)
    for p in e_parts[1:]:
        ebig = ebig.unionByName(p)
    dpath = os.path.join(out_dir, "documents.parquet")
    epath = os.path.join(out_dir, "embeddings.parquet")
    dbig.repartition(max(4, n)).write.mode("overwrite").parquet(dpath)
    ebig.repartition(max(4, n)).write.mode("overwrite").parquet(epath)
    return dpath, epath


def timed(action) -> tuple[float, int]:
    t0 = time.perf_counter()
    out = action()
    return round(time.perf_counter() - t0, 2), out


def probe_factor(spark, n: int) -> dict:
    from azure_etl_spark.operators.curation import (
        contamination_overlap,
        remove_duplicate_segments,
    )
    from azure_etl_spark.operators.dedup import (
        _banded_candidates,
        minhash_verified_near_dup,
        normalized_text,
        with_minhash,
    )
    from azure_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        ivf_topk,
        kmeans_fit,
        lsh_bucketed_topk,
        with_lsh_signature,
    )

    tmp = tempfile.mkdtemp(prefix=f"dedup_probe_{n}x_")
    out: dict = {"factor": n}
    try:
        dpath, epath = build(spark, tmp, n)
        docs = spark.read.parquet(dpath)
        emb = spark.read.parquet(epath).select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
        )
        out["doc_rows"] = docs.count()
        out["emb_rows"] = emb.count()

        # --- MinHash: candidate count (sum of C(bucket,2) over band
        # buckets — the banding join's output size without materializing
        # pairs) + full verified pipeline wall time
        sig = with_minhash(docs, "text", num_hashes=64, shingle_n=2)
        t, n_cand = timed(
            lambda: _banded_candidates(sig, "doc_id", 64, 16).count()
        )
        out["minhash_candidates"] = {"sec": t, "pairs": n_cand}
        t, n_pairs = timed(
            lambda: minhash_verified_near_dup(
                docs, num_hashes=64, bands=16, threshold=0.2
            ).count()
        )
        out["minhash_verified"] = {"sec": t, "pairs": n_pairs}

        # --- Embedding near-dup: bucket-collision candidate count (per
        # table sum C(bucket,2)) + pair-mining wall time. Measured twice:
        # at the FIXED base plane count (8 — collisions grow ~n^2/2^planes
        # when the bucket space stays fixed) and at the ADAPTIVE count
        # planes = 8 + log2(factor) that keeps expected bucket occupancy
        # constant — the provisioning rule for a growing corpus.
        import math

        adaptive_planes = 8 + max(0, round(math.log2(n)))
        for label, planes in (("fixed8", 8), ("adaptive", adaptive_planes)):
            cand_total = 0
            t0 = time.perf_counter()
            for tbl in range(4):
                sizes = (
                    with_lsh_signature(emb, 64, planes, tbl, "embedding", "__sig")
                    .groupBy("__sig")
                    .count()
                )
                cand_total += int(
                    sizes.agg(
                        F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long")
                    ).collect()[0][0]
                )
            out[f"lsh_bucket_candidates_{label}"] = {
                "sec": round(time.perf_counter() - t0, 2),
                "planes": planes,
                "pairs": cand_total,
            }
        # pair-mining wall time at the fixed base planes (skipped past
        # 32x where quadratic collisions make it pointlessly slow — the
        # candidate counts above already tell that story) and at the
        # adaptive count (the provisioned-for-scale configuration)
        mine_variants = [("adaptive", adaptive_planes)]
        if n <= 32:
            mine_variants.insert(0, ("fixed8", 8))
        for label, planes in mine_variants:
            nd = embedding_near_dup_pairs(
                emb, dim=64, threshold=0.9, n_planes=planes, n_tables=4
            )
            t, _ = timed(
                lambda: nd.write.format("noop").mode("overwrite").save()
            )
            out[f"embedding_near_dup_{label}"] = {"sec": t, "planes": planes}

        # --- LSH top-k (4 fixed queries vs the grown candidate set)
        queries = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
        t, n_rows = timed(
            lambda: lsh_bucketed_topk(
                queries, emb, dim=64, k=5, n_planes=8, n_tables=4
            ).count()
        )
        out["lsh_topk"] = {"sec": t, "rows": n_rows}

        # --- IVF: fit (3 Lloyd rounds) + probe
        t0 = time.perf_counter()
        assign, cent = kmeans_fit(emb, k=8, max_iter=3)
        n_rows = ivf_topk(queries, emb, assign, cent, k=5, nprobe=2).count()
        out["ivf_fit_probe"] = {"sec": round(time.perf_counter() - t0, 2), "rows": n_rows}

        # --- Corpus-wide segment dedup (the one unavoidable shuffle);
        # noop sink so the reassembly expressions are actually evaluated
        # (count() would let column pruning drop the collect_list work)
        seg = remove_duplicate_segments(
            docs, F.split(normalized_text("text"), " "), seg_len=3, max_occurrences=4
        )
        t, _ = timed(lambda: seg.write.format("noop").mode("overwrite").save())
        out["remove_dup_segments"] = {"sec": t}

        # --- Exact-substring dedup (sliding-window ExactSubstr): the
        # gram-frequency shuffle is the cost driver; the duplicated-gram
        # count is the join-back size driver — replicas have DISTINCT
        # words, so it must stay ~flat (base-corpus duplicates only)
        # while rows grow Nx
        from azure_etl_spark.operators.curation import remove_duplicate_spans

        spans = remove_duplicate_spans(docs, k=8)
        t, _ = timed(lambda: spans.write.format("noop").mode("overwrite").save())
        w = F.split(normalized_text("text"), " ")
        idx = F.sequence(F.lit(0), F.greatest(F.size(w) - 8, F.lit(0)))
        n_dup = (
            docs.select(
                "doc_id",
                F.explode(
                    F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, 8)))
                ).alias("gram"),
            )
            .groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .count()
        )
        out["remove_dup_spans"] = {"sec": t, "dup_grams": n_dup}

        # --- Decontamination: eval side stays BASE-sized (the realistic
        # asymmetry — benchmarks don't grow with the corpus)
        eval_docs = load_table(spark, SF_DIR, "documents").filter(
            F.col("source") == "src0"
        )
        # noop sink, not count(): the op's left join has a unique-keyed
        # right side, so Catalyst would eliminate the whole n-gram plan
        # under count() and time nothing
        cont = contamination_overlap(docs, eval_docs, n=8)
        t, _ = timed(
            lambda: cont.write.format("noop").mode("overwrite").save()
        )
        out["contamination"] = {"sec": t}
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    spark = (
        session_builder(app_name="dedup-scale-probe", master="local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in factors:
        print(json.dumps(probe_factor(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
