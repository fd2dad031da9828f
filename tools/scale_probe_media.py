#!/usr/bin/env python
"""Measured scaling for the multimodal perceptual dedup stack
(round 6): hash + pair-join wall time and candidate counts for the
image dhash pipeline at 1x / 4x / 8x item counts.

The synthetic media corpora are generated from ids, so the probe
scales item count directly with ``spark.range`` — the claim under test
is the SCALING SHAPE, not absolute speed: hashing should grow ~linear
in items (one Arrow pass), and the chunk-join candidate count should
grow ~linearly too (planted groups are constant-size; cross-group
16-bit chunk collisions admit ~n/65536 expected candidates per chunk
per item, far from n^2). A super-linear candidate curve would flag a
bucketing defect like the multi-probe LSH blowup round 5 caught.

    python tools/scale_probe_media.py [base_n]   # default 4000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.session import session_builder  # noqa: E402


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    spark = session_builder(app_name="media-scale-probe", master="local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from azure_etl_spark.operators.imagehash import (
        attach_synth_pnm,
        hash64_near_dup_pairs,
        image_perceptual_hash,
    )

    out = {"metric": "media_dedup_scaling", "base_n": base_n, "points": []}
    for mult in (1, 4, 8):
        n = base_n * mult
        docs = spark.range(n).select(F.col("id").cast("int").alias("doc_id")).repartition(32)
        hashed = image_perceptual_hash(attach_synth_pnm(docs), "media", "__ph")
        t0 = time.perf_counter()
        sig = hashed.select("doc_id", "__ph").localCheckpoint(eager=True)
        t_hash = time.perf_counter() - t0

        # candidate volume BEFORE the hamming verify: the scale-shape metric
        chunked = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("cidx"),
                            F.shiftrightunsigned(F.col("__ph"), 16 * c)
                            .bitwiseAND(F.lit(0xFFFF))
                            .alias("cval"),
                        )
                        for c in range(4)
                    ]
                )
            ).alias("ch"),
        ).select("doc_id", "ch.cidx", "ch.cval")
        a = chunked.withColumnRenamed("doc_id", "id_a")
        b = chunked.withColumnRenamed("doc_id", "id_b")
        candidates = (
            a.join(b, ["cidx", "cval"]).filter(F.col("id_a") < F.col("id_b")).count()
        )

        t0 = time.perf_counter()
        n_pairs = hash64_near_dup_pairs(hashed, "doc_id", "__ph").count()
        t_pairs = time.perf_counter() - t0

        # the 128-bit / 32-bit-chunk scale path: candidate volume should
        # collapse to ~exact-bucket-mates only (collision rate n/2^32)
        from azure_etl_spark.operators.imagehash import (
            hash128_near_dup_pairs,
            image_perceptual_hash128,
        )

        h128 = image_perceptual_hash128(attach_synth_pnm(docs), "media", "dh")
        sig128 = h128.select("doc_id", "dh0", "dh1").localCheckpoint(eager=True)
        chunk32 = sig128.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("cidx"),
                            F.shiftrightunsigned(F.col(w), s)
                            .bitwiseAND(F.lit(0xFFFFFFFF))
                            .alias("cval"),
                        )
                        for c, (w, s) in enumerate(
                            [("dh0", 0), ("dh0", 32), ("dh1", 0), ("dh1", 32)]
                        )
                    ]
                )
            ).alias("ch"),
        ).select("doc_id", "ch.cidx", "ch.cval")
        a1 = chunk32.withColumnRenamed("doc_id", "id_a")
        b1 = chunk32.withColumnRenamed("doc_id", "id_b")
        cand128 = (
            a1.join(b1, ["cidx", "cval"]).filter(F.col("id_a") < F.col("id_b")).count()
        )
        pairs128 = hash128_near_dup_pairs(h128, "doc_id", "dh0", "dh1").count()

        out["points"].append(
            {
                "n": n,
                "hash_sec": round(t_hash, 3),
                "pair_sec": round(t_pairs, 3),
                "candidates": candidates,
                "pairs": n_pairs,
                "cand_per_item": round(candidates / n, 2),
                "candidates_128": cand128,
                "cand128_per_item": round(cand128 / n, 2),
                "pairs_128": pairs128,
            }
        )

    # ---- adversarial skew probe (round 7): 10% of the corpus is ONE
    # constant signature (blank-image attack). The uncapped pair join
    # is quadratic in the hot bucket (C(0.1n, 2) verified pairs nobody
    # wants materialized); the capped variant stays bounded and
    # REPORTS the bucket + occupancy instead of silently degrading.
    from azure_etl_spark.operators.imagehash import (
        hash64_near_dup_pairs_with_overflow,
    )

    out["skew_points"] = []
    for mult in (1, 4, 8):
        n = base_n * mult
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0, F.lit(0x5A5A_5A5A_5A5A_5A5A))
            .otherwise(F.xxhash64(F.col("id")))
            .alias("sig"),
        ).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        n_unc = hash64_near_dup_pairs(base, "doc_id", "sig").count()
        t_unc = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs_c, overflow = hash64_near_dup_pairs_with_overflow(
            base, "doc_id", "sig", bucket_cap=256
        )
        n_cap = pairs_c.count()
        rep = overflow.count()
        t_cap = time.perf_counter() - t0

        out["skew_points"].append(
            {
                "n": n,
                "hot_rows": n // 10,
                "uncapped_pairs": n_unc,
                "uncapped_sec": round(t_unc, 3),
                "capped_pairs": n_cap,
                "capped_sec": round(t_cap, 3),
                "overflow_buckets": rep,
            }
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
