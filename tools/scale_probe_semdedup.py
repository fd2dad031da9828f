#!/usr/bin/env python
"""Measured scaling for the round-5 additions: semantic_dedup (SemDeDup)
and BPE tokenizer training/encoding.

Replicates the sf0.1 fixtures with per-replica perturbed content (same
scheme as scale_probe_dedup: circular-shifted embeddings, word-suffix
tagged text so the vocabulary grows with the corpus), then times:

- semantic_dedup with the SemDeDup provisioning rule k ~ k0*sqrt(N):
  assignment work is rows*k = O(N^1.5) and intra-cluster pair work is
  O(N^2/k) = O(N^1.5) — balanced, never corpus-quadratic. A fixed k is
  ALSO probed at the largest factor to show the quadratic trap the rule
  avoids (mirrors the fixed-vs-adaptive LSH planes finding).
- bpe_train (word count shuffle + per-merge vocab passes) and
  bpe_encode (single corpus pass) at fixed 8 merges.

    python tools/scale_probe_semdedup.py [factor ...]   # default: 1 8 32
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from azure_etl_spark.session import session_builder  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(action) -> tuple[float, object]:
    t0 = time.perf_counter()
    out = action()
    return round(time.perf_counter() - t0, 2), out


def _alpha_tag(i: int) -> str:
    """Replica tag in [a-z]+ (build()'s '~r{i}' scheme would be rejected
    by word_frequencies' ^[a-z]+$ gate, freezing the vocabulary)."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i, 26)
        s += chr(ord("a") + r)
    return s


def _alpha_perturbed_docs(spark, n: int):
    """Replica-suffixed words that STAY alphabetic, so the vocabulary
    (and therefore BPE's per-round working set) grows ~n-fold."""
    from azure_etl_spark.sources.files import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = []
    for i in range(n):
        suf = "" if i == 0 else _alpha_tag(i)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.concat(w, F.lit(suf)),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(max(4, n)).localCheckpoint(eager=True)


def probe_factor(spark, n: int, fixed_k: bool = False) -> dict:
    from azure_etl_spark.operators.similarity import semantic_dedup
    from azure_etl_spark.operators.tokenize import (
        bpe_encode,
        bpe_train,
        word_frequencies,
    )

    from azure_etl_spark.sources.files import load_table
    from scale_probe_dedup import _shift_vec

    out: dict = {"factor": n}
    base = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            _shift_vec(F.col("embedding"), i).alias("embedding"),
        )
        for i in range(n)
    ]
    emb = parts[0]
    for p in parts[1:]:
        emb = emb.unionByName(p)
    emb = emb.repartition(max(4, n)).localCheckpoint(eager=True)
    docs = _alpha_perturbed_docs(spark, n)
    out["doc_rows"] = docs.count()
    out["emb_rows"] = emb.count()

    k = 8 if fixed_k else max(8, int(8 * (n ** 0.5)))
    out["k"] = k
    t, _ = timed(
        lambda: semantic_dedup(emb, k=k, max_iter=3, threshold=0.95)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["semantic_dedup_s"] = t

    t, wf = timed(lambda: word_frequencies(docs).localCheckpoint(eager=True))
    out["word_count_s"] = t
    out["vocab_rows"] = wf.count()
    t, trained = timed(lambda: bpe_train(wf, n_merges=8))
    out["bpe_train_s"] = t
    _, rounds = trained
    t, _ = timed(
        lambda: bpe_encode(docs, rounds)
        .select("doc_id", "n_bpe_tokens")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["bpe_encode_s"] = t
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    spark = session_builder(
        app_name="semdedup-scale-probe", master="local[32]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in factors:
        rows.append(probe_factor(spark, n))
        print(json.dumps(rows[-1]))
    # the quadratic trap: fixed k at the largest factor
    trap = probe_factor(spark, factors[-1], fixed_k=True)
    trap["note"] = "fixed_k"
    print(json.dumps(trap))


if __name__ == "__main__":
    main()
