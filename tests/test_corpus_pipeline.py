"""End-to-end curation funnel (plans/corpus_pipeline.py): the training-
data analogue of the medallion pipeline test — monotone funnel, planted
duplicates removed, contamination dropped, deterministic output."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from azure_etl_spark.plans.corpus_pipeline import CurationPipeline
from azure_etl_spark.sources.files import load_table


def _corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # plant an exact clone and a near clone of doc 0 under fresh ids
    base = docs.filter(F.col("doc_id") == 0).select("doc_id", "text", "lang")
    clone = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    near = base.select(
        (F.col("doc_id") + 100001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang",
    )
    return docs.select("doc_id", "text", "lang").unionByName(clone).unionByName(near)


def test_funnel_monotone_and_dedups_planted_clones(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    evald = spark.createDataFrame(
        [(900001, corpus.filter(F.col("doc_id") == 5).head()["text"])],
        "doc_id long, text string",
    )
    p = CurationPipeline()
    out = p.run(corpus, eval_docs=evald)
    c = p.stage_counts
    order = ["input", "lang_gate", "quality_gate", "exact_dedup",
             "near_dedup", "decontaminated", "packed"]
    vals = [c[k] for k in order]
    assert vals == sorted(vals, reverse=True), c  # monotone funnel
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 100000 not in ids        # exact clone of doc 0 dropped
    assert 5 not in ids             # eval-contaminated doc dropped
    assert c["near_dedup"] < c["exact_dedup"]  # near clone caught too
    # packing produced sequences within budget per (shard, seq)
    seq_tokens = out.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("t")
    )
    assert seq_tokens.filter(F.col("t") > 512 * 2).count() == 0


def test_funnel_is_deterministic(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    a = CurationPipeline().run(corpus).orderBy("doc_id").collect()
    b = (
        CurationPipeline()
        .run(corpus.repartition(13))
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


@pytest.mark.slow
def test_funnel_chunked_variant_packs_chunks(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    p = CurationPipeline(chunk_words=16, chunk_stride=12, token_budget=64)
    out = p.run(corpus)
    c = p.stage_counts
    # chunking expands rows: more packable units than surviving docs
    assert c["chunked"] >= c["near_dedup"]
    assert c["packed"] == c["chunked"]
    # every chunk respects the window bound and packing the budget
    assert out.filter(F.col("n_tokens") > 16).count() == 0
    seq_tokens = out.groupBy("shard", "seq_id").agg(F.sum("n_tokens").alias("t"))
    assert seq_tokens.filter(F.col("t") > 64 * 2).count() == 0
    # determinism under repartitioning (chunk ids are content-derived)
    q = CurationPipeline(chunk_words=16, chunk_stride=12, token_budget=64)
    b = q.run(corpus.repartition(7))
    cols = ["doc_id", "chunk_idx", "shard", "seq_id"]
    assert sorted(map(tuple, out.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )


def test_funnel_semantic_stage_drops_embedding_twin(spark, sf_dir):
    """A doc whose TEXT is unique but whose EMBEDDING clones doc 3's
    survives every text stage and is caught only by the SemDeDup stage."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    twin = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 100002).alias("doc_id"),
        F.concat(F.lit("entirely different words here "), F.reverse("text")).alias("text"),
        "lang",
    )
    corpus = docs.unionByName(twin)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    emb = emb.unionByName(
        emb.filter(F.col("doc_id") == 3).select(
            (F.col("doc_id") + 100002).alias("doc_id"), "embedding"
        )
    )
    p = CurationPipeline()
    out = p.run(corpus, embeddings=emb)
    c = p.stage_counts
    assert c["semantic_dedup"] == c["near_dedup"] - 1, c
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 3 in ids and (3 + 100002) not in ids  # keep-lowest-id policy


def test_funnel_multimodal_media_dedup_stage(spark, sf_dir):
    """Round-6 multimodal stage: docs whose ATTACHED media (image /
    audio / video) is a planted near-duplicate of a lower-id survivor's
    media are dropped, across all three modalities, while docs with
    unique media survive."""
    import pandas as pd

    from azure_etl_spark.operators.audiohash import synth_audio_array
    from azure_etl_spark.operators.codecs import encode_pnm, encode_wav
    from azure_etl_spark.operators.imagehash import (
        synth_image_array,
        synth_video_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    ).filter(F.col("doc_id") < 60)

    # media for ids 0..59: synth groups of 4 -> ids {0..3}, {4..7}, ...
    # are near-identical within each modality block
    rows = []
    for d in range(60):
        if d < 20:
            payload = encode_pnm(synth_image_array(d))
            mtype = "image/pnm"
        elif d < 40:
            payload = encode_wav(8000, synth_audio_array(d))
            mtype = "audio/wav"
        else:
            payload = b"".join(
                encode_pnm(f) for f in synth_video_frames(d)
            )
            mtype = "video/pnm-stream"
        rows.append((d, bytearray(payload), mtype))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "media", "media_type"]),
        "doc_id long, media binary, media_type string",
    )

    p = CurationPipeline()
    p.run(docs, media=media)
    c = p.stage_counts
    assert "media_dedup" in c
    # each group of 4 collapses to 1 survivor for every id group that
    # survived the earlier text gates — media dedup must remove a
    # substantial, strictly positive count
    assert c["media_dedup"] < c["near_dedup"]
    removed = c["near_dedup"] - c["media_dedup"]
    assert removed >= 20  # ~3 of every 4 media-grouped survivors drop


def test_media_routes_declared_matches_probed(spark):
    """Round 13: declaring media_routes skips the _present_routes probe
    job (which executes an opaque media producer end-to-end once just
    to list types) and must produce IDENTICAL pairs — both for a full
    declaration and for a declaration that includes an absent modality
    (whose plan branch is simply empty). Unknown route names raise."""
    import pandas as pd
    import pytest

    from azure_etl_spark.operators.codecs import encode_pnm
    from azure_etl_spark.operators.imagehash import synth_image_array
    from azure_etl_spark.plans.corpus_pipeline import media_near_dup_pairs

    rows = [
        (d, bytearray(encode_pnm(synth_image_array(d))), "image/pnm")
        for d in range(16)
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "media", "media_type"]),
        "doc_id long, media binary, media_type string",
    )
    probed = {tuple(r) for r in media_near_dup_pairs(media).collect()}
    declared = {
        tuple(r)
        for r in media_near_dup_pairs(media, routes=("image/pnm",)).collect()
    }
    over_declared = {
        tuple(r)
        for r in media_near_dup_pairs(
            media, routes=("image/pnm", "audio/wav")
        ).collect()
    }
    assert declared == probed
    assert over_declared == probed
    assert len(probed) > 0  # synth groups of 4 plant real near-dups
    with pytest.raises(ValueError, match="unknown media route"):
        media_near_dup_pairs(media, routes=("image/jpeg",)).collect()


def test_media_keep_best_chain_keeps_exactly_one_best(spark):
    """Chain fixture (VERDICT r6 #2): dhash chain a~b (ham 2), b~c
    (ham 2), a!~c (ham 4). Keep-min-id would drop BOTH b and c (each
    pairs with a lower id) even though c is no dup of a; component
    resolution keeps exactly ONE member per chain — and with keep_by,
    the BEST one, not the first."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.codecs import encode_pnm
    from azure_etl_spark.operators.imagehash import dhash64
    from azure_etl_spark.plans.corpus_pipeline import media_near_dup_keep_best

    def img_with_bits(bits64: int) -> np.ndarray:
        """9x8 grayscale whose dhash is exactly bits64: walk each row
        left-to-right, stepping down iff the bit is set (g[y,x] >
        g[y,x+1] <=> bit y*8+x)."""
        g = np.zeros((8, 9), dtype=np.uint8)
        for y in range(8):
            g[y, 0] = 128
            for x in range(8):
                bit = (bits64 >> (y * 8 + x)) & 1
                g[y, x + 1] = g[y, x] - 1 if bit else g[y, x] + 1
        return g

    base = 0x0123456789ABCDEF
    h_a = base
    h_b = base ^ 0b11  # ham(a,b)=2
    h_c = base ^ 0b1111  # ham(b,c)=2, ham(a,c)=4 > 3
    for h in (h_a, h_b, h_c):
        assert dhash64(img_with_bits(h)) == h  # the fixture is exact

    rows = [
        (1, bytearray(encode_pnm(img_with_bits(h_a))), "image/pnm", 10),
        (2, bytearray(encode_pnm(img_with_bits(h_b))), "image/pnm", 30),
        (3, bytearray(encode_pnm(img_with_bits(h_c))), "image/pnm", 20),
        (9, bytearray(encode_pnm(img_with_bits(0)))  , "image/pnm", 1),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "media", "media_type", "res"]),
        "doc_id long, media binary, media_type string, res int",
    )
    kept = media_near_dup_keep_best(media, keep_by=F.col("res"))
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # exactly one survivor from the chain {1,2,3}: the highest-res
    # member (id 2) — keep-min-id would have produced {1} and dropped
    # a non-duplicate-of-1 (id 3) with it
    assert ids == {2, 9}


def test_funnel_counts_off_fuses_and_matches(spark, sf_dir):
    """Round 13 (VERDICT r12 #6): ``counts="off"`` fuses the funnel —
    no persists, no count jobs, ``stage_counts`` stays empty, and the
    packed output is IDENTICAL to the observed-mode run (the counts
    are pure observation; dropping them must not move a row)."""
    import pytest

    corpus = _corpus(spark, sf_dir)
    evald = spark.createDataFrame(
        [(900001, corpus.filter(F.col("doc_id") == 5).head()["text"])],
        "doc_id long, text string",
    )
    p_obs = CurationPipeline()
    want = [tuple(r) for r in p_obs.run(corpus, eval_docs=evald)
            .orderBy("doc_id", "seq_id").collect()]
    assert p_obs.stage_counts  # observed mode records the funnel

    p_off = CurationPipeline(counts="off")
    out = p_off.run(corpus, eval_docs=evald)
    assert p_off.stage_counts == {}  # nothing ran yet: fully lazy
    got = [tuple(r) for r in out.orderBy("doc_id", "seq_id").collect()]
    assert got == want
    assert p_off.stage_counts == {}

    with pytest.raises(ValueError, match="observed"):
        CurationPipeline(counts="bogus").run(corpus)
