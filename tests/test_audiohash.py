"""Perceptual audio fingerprint + near-dup (operators/audiohash.py):
kernel vs an independent per-bit reference, WAV roundtrip, planted
near-identical recall through the full Spark byte path, robustness of
the difference-of-difference bits."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from azure_etl_spark.operators.audiohash import (
    AF_BANDS,
    AF_FRAMES,
    AF_K,
    AF_N,
    SYNTH_GROUP,
    SYNTH_RATE,
    attach_synth_wav,
    audio_fingerprint64,
    audio_perceptual_hash,
    synth_audio_array,
)
from azure_etl_spark.operators.codecs import decode_wav, encode_wav
from azure_etl_spark.operators.imagehash import hash64_near_dup_pairs


def _ref_fingerprint(samples: np.ndarray) -> int:
    """Independent reference: explicit loops over frames/bands."""
    x = [int(v) for v in np.asarray(samples).reshape(-1)[:AF_N]]
    E = [[0] * AF_BANDS for _ in range(AF_FRAMES)]
    for i, v in enumerate(x):
        E[i // (AF_BANDS * AF_K)][(i % (AF_BANDS * AF_K)) % AF_BANDS] += v * v
    h = 0
    for t in range(AF_FRAMES - 1):
        for b in range(AF_BANDS - 1):
            d_lo = E[t][b] - E[t][b + 1]
            d_hi = E[t + 1][b] - E[t + 1][b + 1]
            if d_hi > d_lo:
                h |= 1 << (t * 8 + b)
    return h - (1 << 64) if h >= 1 << 63 else h


def test_fingerprint_matches_reference_loops():
    rng = np.random.default_rng(5)
    for _ in range(20):
        s = rng.integers(-32768, 32767, size=AF_N, dtype=np.int64).astype(np.int16)
        assert audio_fingerprint64(s) == _ref_fingerprint(s)
    # 2-D (frames, channels) input uses channel 0
    st = np.stack([s, np.zeros_like(s)], axis=1)
    assert audio_fingerprint64(st) == _ref_fingerprint(s)


def test_synth_clips_roundtrip_wav():
    for d in (0, 7, 99):
        s = synth_audio_array(d)
        assert s.shape == (AF_N,) and s.dtype == np.int16
        sr, back = decode_wav(encode_wav(SYNTH_RATE, s))
        assert sr == SYNTH_RATE
        assert np.array_equal(back[:, 0], s)


@pytest.mark.slow
def test_planted_near_dup_recall_through_spark_path(spark):
    """Bucketed pairs over the real WAV byte path must equal the local
    brute force exactly — pigeonhole completeness at hamming <= 3."""
    n = 120
    docs = spark.range(n).select(F.col("id").cast("int").alias("doc_id"))
    hashed = audio_perceptual_hash(attach_synth_wav(docs), "media", "__ph")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hash64_near_dup_pairs(hashed, "doc_id", "__ph").collect()
    }
    fps = {d: audio_fingerprint64(synth_audio_array(d)) for d in range(n)}
    want = {}
    for a, b in itertools.combinations(range(n), 2):
        ham = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want[(a, b)] = ham
    assert pairs == want and len(pairs) > 0
    # all found pairs are intra-group on this fixture
    assert all(a // SYNTH_GROUP == b // SYNTH_GROUP for a, b in pairs)


def test_non_wav_payload_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"OggS fake"))], "doc_id int, media binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|requires ffmpeg"):
        audio_perceptual_hash(df, "media", "__ph").collect()


def test_local_edit_small_hamming_global_offset_invariant():
    """The Haitsma-Kalker property set: a single-sample click moves few
    bits; a constant DC offset cancels in the band differences only
    partially (energies are quadratic) but an unrelated clip is far."""
    base = synth_audio_array(0)
    clicked = base.copy()
    clicked[100] = min(32767, int(clicked[100]) + 200)
    d = bin(
        (audio_fingerprint64(base) ^ audio_fingerprint64(clicked))
        & ((1 << 64) - 1)
    ).count("1")
    assert d <= 6
    other = synth_audio_array(400)
    far = bin(
        (audio_fingerprint64(base) ^ audio_fingerprint64(other))
        & ((1 << 64) - 1)
    ).count("1")
    assert far > 3
