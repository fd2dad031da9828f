"""Perceptual image hashing + near-dup (operators/imagehash.py): hash
kernels vs an independent bit-by-bit reference, planted near-identical
recall through the full Spark byte path, and the chunk-bucket join's
completeness at hamming <= 3."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from azure_etl_spark.operators.codecs import decode_pnm, encode_pnm, resize_nearest
from azure_etl_spark.operators.imagehash import (
    SYNTH_GROUP,
    ahash64,
    attach_synth_pnm,
    dhash64,
    hash64_near_dup_pairs,
    image_perceptual_hash,
    synth_image_array,
)


def _ref_dhash(arr: np.ndarray) -> int:
    """Independent reference: explicit per-bit loop."""
    g = arr.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    g = resize_nearest(g, 9, 8)
    h = 0
    for y in range(8):
        for x in range(8):
            if g[y][x] > g[y][x + 1]:
                h |= 1 << (y * 8 + x)
    return h - (1 << 64) if h >= 1 << 63 else h


def _ref_ahash(arr: np.ndarray) -> int:
    g = arr.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    g = resize_nearest(g, 8, 8)
    mu = float(g.mean())
    h = 0
    for y in range(8):
        for x in range(8):
            if g[y][x] > mu:
                h |= 1 << (y * 8 + x)
    return h - (1 << 64) if h >= 1 << 63 else h


def test_hash_kernels_match_reference_loops():
    rng = np.random.default_rng(7)
    for _ in range(25):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert dhash64(img) == _ref_dhash(img)
        assert ahash64(img) == _ref_ahash(img)
    # color path: channel-mean grayscale
    img3 = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    assert dhash64(img3) == _ref_dhash(img3)
    assert ahash64(img3) == _ref_ahash(img3)


def test_synth_images_roundtrip_pnm():
    for d in (0, 3, 17, 255):
        arr = synth_image_array(d)
        assert arr.shape == (16, 24) and arr.dtype == np.uint8
        assert np.array_equal(decode_pnm(encode_pnm(arr)), arr)


def test_planted_near_dup_recall_through_spark_path(spark):
    """Groups of 4 single-pixel-perturbed images: the bucketed join
    must recover EVERY intra-group pair (pigeonhole completeness at
    hamming <= 3) and, on this fixture, nothing across groups."""
    n = 120
    docs = spark.range(n).select(F.col("id").cast("int").alias("doc_id"))
    hashed = image_perceptual_hash(attach_synth_pnm(docs), "media", "__ph", "dhash")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hash64_near_dup_pairs(hashed, "doc_id", "__ph").collect()
    }
    # expectation from a local brute force over the same kernels
    hs = {d: dhash64(synth_image_array(d)) for d in range(n)}
    want = {}
    for a, b in itertools.combinations(range(n), 2):
        ham = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want[(a, b)] = ham
    assert pairs == want
    # every intra-group pair found, none across groups (fixture design)
    groups = {(a, b) for g in range(n // SYNTH_GROUP)
              for a, b in itertools.combinations(
                  range(g * SYNTH_GROUP, (g + 1) * SYNTH_GROUP), 2)}
    assert set(pairs) == groups


def test_non_pnm_payload_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG fake"))], "doc_id int, media binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        image_perceptual_hash(df, "media", "__ph", "dhash").collect()


def test_single_pixel_edit_stays_within_small_hamming():
    """The perceptual property itself: a one-pixel edit of bounded
    magnitude moves the dhash by at most a couple of bits, while an
    unrelated texture is far away."""
    base = synth_image_array(0)
    edited = base.copy()
    edited[5, 5] = (int(edited[5, 5]) + 3) % 256
    d = bin((dhash64(base) ^ dhash64(edited)) & ((1 << 64) - 1)).count("1")
    assert d <= 4
    other = synth_image_array(400)  # different base texture
    far = bin((dhash64(base) ^ dhash64(other)) & ((1 << 64) - 1)).count("1")
    assert far > 3


# ------------------------------------------------------------------
# Video: temporally-pooled clip dhash (third modality, round 6)
# ------------------------------------------------------------------


def test_video_synth_roundtrip_pnm_stream():
    from azure_etl_spark.operators.codecs import decode_pnm_stream, encode_pnm
    from azure_etl_spark.operators.imagehash import (
        VIDEO_FRAMES,
        synth_video_frames,
    )

    frames = synth_video_frames(13)
    assert len(frames) == VIDEO_FRAMES
    payload = b"".join(encode_pnm(f) for f in frames)
    back = decode_pnm_stream(payload)
    assert len(back) == VIDEO_FRAMES
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_video_planted_near_dup_recall_through_spark_path(spark):
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.imagehash import (
        attach_synth_pnm_stream,
        synth_video_frames,
        video_pooled_dhash,
    )

    def local_hash(d):
        frames = synth_video_frames(d)
        pooled = sum(f.astype(np.int64) for f in frames) // len(frames)
        return dhash64(pooled)

    n = 100
    docs = spark.range(n).select(F.col("id").cast("int").alias("doc_id"))
    hashed = video_pooled_dhash(attach_synth_pnm_stream(docs), "media", "__ph")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hash64_near_dup_pairs(hashed, "doc_id", "__ph").collect()
    }
    hs = {d: local_hash(d) for d in range(n)}
    want = {}
    for a, b in itertools.combinations(range(n), 2):
        ham = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want[(a, b)] = ham
    assert pairs == want and len(pairs) > 0
    groups = {(a, b) for g in range(n // SYNTH_GROUP)
              for a, b in itertools.combinations(
                  range(g * SYNTH_GROUP, (g + 1) * SYNTH_GROUP), 2)}
    assert set(pairs) == groups  # every planted pair, nothing else


def test_video_single_frame_edit_small_hamming():
    from azure_etl_spark.operators.imagehash import synth_video_frames

    def pooled_hash(frames):
        pooled = sum(f.astype(np.int64) for f in frames) // len(frames)
        return dhash64(pooled)

    base = synth_video_frames(0)
    edited = [f.copy() for f in base]
    edited[2][5, 5] = (int(edited[2][5, 5]) + 120) % 256  # one frame, one pixel
    d = bin(
        (pooled_hash(base) ^ pooled_hash(edited)) & ((1 << 64) - 1)
    ).count("1")
    assert d <= 4


def test_dhash128_planted_recall_and_collision_resistance(spark):
    """The billion-item scale path: 128-bit dhash + 32-bit chunks must
    find exactly the brute-force pair set, and its candidate buckets
    must not blow up where 16-bit buckets do."""
    from azure_etl_spark.operators.imagehash import (
        dhash128,
        hash128_near_dup_pairs,
        image_perceptual_hash128,
    )

    n = 120
    docs = spark.range(n).select(F.col("id").cast("int").alias("doc_id"))
    hashed = image_perceptual_hash128(attach_synth_pnm(docs), "media", "dh")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hash128_near_dup_pairs(hashed, "doc_id", "dh0", "dh1").collect()
    }

    def h(d):
        lo, hi = dhash128(synth_image_array(d))
        return (lo & (1 << 64) - 1) | ((hi & (1 << 64) - 1) << 64)

    hs = {d: h(d) for d in range(n)}
    want = {}
    for a, b in itertools.combinations(range(n), 2):
        ham = bin(hs[a] ^ hs[b]).count("1")
        if ham <= 3:
            want[(a, b)] = ham
    assert pairs == want and len(pairs) == (n // SYNTH_GROUP) * 6


def test_hash64_pairs_scope_cols_partition_the_join(spark):
    """scope_cols puts extra columns in the candidate equi-join key:
    identical signatures in DIFFERENT scope groups never pair, while
    pairing within a group is unchanged (the one-join equivalent of
    media_near_dup_pairs' per-modality loop)."""
    rows = [
        (1, "image/pnm", 0x1234),
        (2, "image/pnm", 0x1234),  # same sig, same scope -> pair
        (3, "audio/wav", 0x1234),  # same sig, other scope -> NO pair
        (4, "audio/wav", 0x1235),  # hamming 1 from id 3 within scope
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, sig long")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hash64_near_dup_pairs(
            df, "doc_id", "sig", scope_cols=("media_type",)
        ).collect()
    }
    assert pairs == {(1, 2), (3, 4)}
    # without the scope the cross-group identical sigs DO pair — the
    # scope column is what carries the invariant
    unscoped = {
        (r["id_a"], r["id_b"])
        for r in hash64_near_dup_pairs(df, "doc_id", "sig").collect()
    }
    assert (1, 3) in unscoped and (2, 3) in unscoped


def test_bucket_cap_triggers_and_reports_overflow(spark):
    """Adversarial hot bucket (VERDICT r6 #5): many rows with the SAME
    signature blow up the pigeonhole self-join quadratically; with
    bucket_cap only the cap's lowest ids pair, and the overflow report
    names every capped bucket with its true occupancy and an id sample
    — nothing is dropped silently."""
    from azure_etl_spark.operators.imagehash import (
        hash64_near_dup_pairs_with_overflow,
    )

    hot = [(i, 0x42) for i in range(40)]  # one signature, 40 rows
    cold = [(100, 0x1111_0000), (101, 0x1111_0001)]  # normal near-pair
    df = spark.createDataFrame(hot + cold, "doc_id long, sig long")
    pairs, overflow = hash64_near_dup_pairs_with_overflow(
        df, "doc_id", "sig", bucket_cap=8
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # cold pair unaffected
    assert (100, 101) in got
    # hot bucket pairs only among the 8 lowest ids: C(8,2) = 28 pairs
    hot_pairs = {p for p in got if p[0] < 100 and p[1] < 100}
    assert hot_pairs == {(a, b) for a in range(8) for b in range(8) if a < b}
    rep = overflow.collect()
    # the constant signature fills one bucket per chunk position -> 4
    # capped-bucket rows; the zero-valued chunks of the cold sigs land
    # in two of them (40 hot + 2 cold occupants)
    assert len(rep) == 4
    assert sorted(r["n_rows"] for r in rep) == [40, 40, 42, 42]
    for r in rep:
        assert r["sample_ids"] == [8, 9, 10, 11, 12]  # first overflowed ids


def test_bucket_cap_keeps_pairs_reachable_via_cold_chunk(spark):
    """A pair sharing BOTH a hot and a cold chunk must survive the cap
    on the hot bucket (pigeonhole completeness degrades only for pairs
    whose ONLY shared chunk is capped)."""
    from azure_etl_spark.operators.imagehash import (
        hash64_near_dup_pairs_with_overflow,
    )

    # chunk 0 (low 16 bits) = 0x7 for everyone -> hot; rows 50/51 also
    # share the distinctive chunk 3 -> still pair after chunk-0 caps
    rows = [(i, (i << 16) | 0x7) for i in range(30)]
    rows += [(50, (0xABC << 48) | 0x7), (51, (0xABC << 48) | (1 << 16) | 0x7)]
    df = spark.createDataFrame(rows, "doc_id long, sig long")
    pairs, overflow = hash64_near_dup_pairs_with_overflow(
        df, "doc_id", "sig", bucket_cap=4
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (50, 51) in got  # found via the un-capped chunk-3 bucket
    # capped: the shared chunk-0 bucket plus the all-zero high chunks
    # of the small ints; the distinctive chunk-3 bucket is NOT capped
    capped = {(r["cidx"], r["cval"]) for r in overflow.collect()}
    assert (0, 0x7) in capped and (3, 0xABC) not in capped
