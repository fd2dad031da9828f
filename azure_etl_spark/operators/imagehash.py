"""Perceptual image hashing + near-duplicate detection over binary
media columns — the multimodal arm of the dedup stack (round-6; the
reference has no multimodal ops, SURVEY.md §2 engine extension; the
text-side chunk-bucket machinery it reuses is
``operators/dedup.simhash_near_dup_pairs``).

dHash (difference hash: sign of the horizontal gradient on a 9x8
grayscale thumbnail) and aHash (average hash: above-mean bits on 8x8)
are the classic perceptual fingerprints: a near-identical image
(re-encode, slight noise, small local edit) lands within a small
Hamming distance of the original, and the whole signature is 64 bits.
Near-dup pairing therefore reuses the SimHash pigeonhole strategy:
split the 64-bit hash into 4 x 16-bit chunks — any pair with
hamming <= 3 agrees on at least one whole chunk — and candidate-join
on (chunk_idx, chunk_value), verifying with ``bit_count(xor)``.

Scale shape (100 TB of images):

- hashing is one ``mapInPandas`` pass — Arrow-batched binary in, one
  int64 out; the kernel is pure numpy per image (decode -> nearest
  resize -> vectorized comparisons), no per-pixel Python;
- the candidate join shuffles 4 tiny (chunk, id, hash) rows per image
  — pixels never shuffle, and there is no all-pairs stage;
- verification is ``bit_count(xor)`` on two longs under codegen.

Decode honesty: real kernels run for PNM payloads (the container has
no PIL/ffmpeg — JPEG/PNG raise ``NotImplementedError`` exactly like
``operators/multimodal``); everything around the kernel is the real
production plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_gray(arr: np.ndarray) -> np.ndarray:
    """(h, w[, 3]) uint8 -> (h, w) float64 grayscale (channel mean)."""
    a = arr.astype(np.float64)
    return a.mean(axis=2) if a.ndim == 3 else a


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash: resize the grayscale to 9x8 (nearest
    neighbor — deterministic everywhere), set bit ``y*8 + x`` iff
    ``g[y, x] > g[y, x + 1]``. Returned as a SIGNED int64 (two's
    complement), matching Spark's BIGINT."""
    from azure_etl_spark.operators.codecs import resize_nearest

    g = resize_nearest(_to_gray(arr), 9, 8)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64)  # (8, 8), row-major
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    return int(np.int64((bits * weights).sum(dtype=np.uint64)))


def ahash64(arr: np.ndarray) -> int:
    """64-bit average hash: resize the grayscale to 8x8, set bit
    ``y*8 + x`` iff the pixel exceeds the 64-sample mean. The mean of
    <=64 uint8 values is exact in float64 (sum <= 16320, /64 is a
    power-of-two divide), so the comparison is reproducible."""
    from azure_etl_spark.operators.codecs import resize_nearest

    g = resize_nearest(_to_gray(arr), 8, 8)
    bits = (g > g.mean()).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    return int(np.int64((bits * weights).sum(dtype=np.uint64)))


_KERNELS = {"dhash": dhash64, "ahash": ahash64}


def image_perceptual_hash(
    df: DataFrame,
    media_col: str = "media",
    out_col: str = "dhash",
    kind: str = "dhash",
) -> DataFrame:
    """Add a perceptual-hash column computed from PNM payload bytes via
    one Arrow-batched ``mapInPandas`` pass (decode -> resize -> hash,
    all numpy). Compressed formats raise — same honesty gate as
    ``multimodal.resize_images``."""
    from azure_etl_spark.operators.codecs import decode_pnm

    kernel = _KERNELS[kind]
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, {out_col} bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: bytes) -> int:
            if d[:2] not in (b"P5", b"P6"):
                raise NotImplementedError(
                    f"perceptual hash of magic {d[:2]!r} requires PIL; "
                    "not in container"
                )
            return kernel(decode_pnm(d))

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[media_col].map(lambda d: one(bytes(d)))
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def hash_chunks(hash_col: str, n_chunks: int = 4, bits: int = 16):
    """Column expressions splitting a 64-bit hash column into
    ``n_chunks`` unsigned ``bits``-wide chunk values (list of Columns).
    Logical right shift + mask, so the sign bit never leaks into a
    chunk value — identical maths on the SQL-oracle side."""
    mask = (1 << bits) - 1
    return [
        F.shiftrightunsigned(F.col(hash_col), bits * c)
        .bitwiseAND(F.lit(mask))
        .cast("int")
        .alias(f"ch{c}")
        for c in range(n_chunks)
    ]


def hash64_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    scope_cols: tuple = (),
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit signature column via the 4-chunk
    pigeonhole candidate join (``operators/dedup.simhash_near_dup_pairs``
    generalized to a precomputed hash). Returns (id_a, id_b, hamming),
    complete for hamming <= 3 by construction.

    ``scope_cols`` names extra columns of ``df`` that become part of
    the candidate equi-join key: a pair is only emitted when both rows
    agree on every scope column. The canonical use is
    ``scope_cols=("media_type",)`` over a mixed-modality table — an
    audio fingerprint that happens to land within hamming <= 3 of an
    image dhash must NOT pair ("a WAV cannot near-dup a PNM",
    plans/corpus_pipeline.media_near_dup_pairs), and putting the scope
    in the join key enforces that in ONE join instead of a per-modality
    loop."""
    if max_hamming > 3:
        raise ValueError("4-chunk bucketing guarantees recall only for hamming <= 3")
    scope = list(scope_cols)
    # cut lineage on the (id, hash) projection BEFORE the self-join:
    # a self-join re-evaluates its input lineage per side, and here the
    # lineage is the Arrow decode+hash pass over the image bytes — the
    # dominant cost at scale. The checkpointed projection is 16 bytes a
    # row; the decode then runs exactly once.
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("sig"),
        *[F.col(c) for c in scope],
    ).localCheckpoint(eager=False)
    chunked = sig.select(
        "id",
        "sig",
        *scope,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("cidx"),
                        F.shiftrightunsigned(F.col("sig"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", *scope, "ch.cidx", "ch.cval")
    a = chunked.select(
        "cidx", "cval", *scope, F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = chunked.select(
        "cidx", "cval", *scope, F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    return (
        a.join(b, ["cidx", "cval", *scope])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def hash64_near_dup_pairs_with_overflow(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    scope_cols: tuple = (),
    bucket_cap: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """:func:`hash64_near_dup_pairs` with an ADVERSARIAL-SKEW guard
    (round-7; VERDICT r6 #5): the pigeonhole candidate join assumes
    benign bucket occupancy, but one hot (cidx, cval) bucket — e.g.
    10% of a corpus being blank images that all hash to the same value
    — makes the within-bucket self-join quadratic in that bucket.

    With a cap, each bucket contributes only its ``bucket_cap``
    LOWEST-id rows to the pair join (deterministic row_number per
    bucket — one sort-shuffle, linear in the hot bucket where the
    uncapped join is quadratic), and the second return value is the
    OVERFLOW REPORT: one row per capped bucket with its total
    occupancy and a small id sample — the no-silent-caps rule: a
    bounded pipeline must SEE what it dropped. The intended handling
    for hot buckets is the linear path: identical signatures need no
    pair mining at all (``groupBy(sig)`` IS their duplicate grouping),
    so route reported buckets there instead of asking a quadratic
    join to enumerate C(n, 2) pairs nobody wants materialized.

    Recall note: a capped pair is only lost if the hot chunk was the
    pair's ONLY shared chunk; pairs also agreeing on a cold chunk
    still surface. Returns ``(pairs, overflow)`` where overflow is
    (cidx, cval, *scope_cols, n_rows, sample_ids).
    """
    from pyspark.sql import Window

    if max_hamming > 3:
        raise ValueError("4-chunk bucketing guarantees recall only for hamming <= 3")
    scope = list(scope_cols)
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("sig"),
        *[F.col(c) for c in scope],
    ).localCheckpoint(eager=False)
    chunked = sig.select(
        "id",
        "sig",
        *scope,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("cidx"),
                        F.shiftrightunsigned(F.col("sig"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", *scope, "ch.cidx", "ch.cval")
    w = Window.partitionBy("cidx", "cval", *scope).orderBy("id")
    ranked = chunked.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") <= bucket_cap).drop("__rn")
    over = ranked.filter(F.col("__rn") > bucket_cap)
    overflow = over.groupBy("cidx", "cval", *scope).agg(
        (F.count("*") + F.lit(bucket_cap)).alias("n_rows"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("__rn") <= bucket_cap + 5, F.col("id"))
            )
        ).alias("sample_ids"),
    )
    a = kept.select(
        "cidx", "cval", *scope, F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = kept.select(
        "cidx", "cval", *scope, F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    pairs = (
        a.join(b, ["cidx", "cval", *scope])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs, overflow


def image_luminance_sum(
    df: DataFrame, media_col: str = "media", out_col: str = "lum"
) -> DataFrame:
    """Add the INTEGER sum of all decoded pixel intensities (uint8,
    summed in int64 — exact, no division, so a SQL oracle replays it
    bit-for-bit). A deterministic stand-in "quality" score for media
    near-dup canonical selection (brighter/denser member wins):
    production swaps in any scorer with the same (payload -> number)
    shape. Same Arrow ``mapInPandas`` pass + PNM honesty gate as
    :func:`image_perceptual_hash`."""
    from azure_etl_spark.operators.codecs import decode_pnm

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, {out_col} bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: bytes) -> int:
            if d[:2] not in (b"P5", b"P6"):
                raise NotImplementedError(
                    f"luminance of magic {d[:2]!r} requires PIL; not in container"
                )
            return int(decode_pnm(d).astype(np.int64).sum())

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[media_col].map(lambda d: one(bytes(d)))
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# --------------------------------------------------------------------------
# Deterministic synthetic PNM corpus (oracle-replayable fixture images)
# --------------------------------------------------------------------------

SYNTH_W, SYNTH_H = 24, 16  # source image dims
SYNTH_GROUP = 4  # docs per planted near-dup group


def synth_image_array(doc_id: int) -> np.ndarray:
    """Deterministic (16, 24) uint8 grayscale image for a doc id.
    Docs sharing ``doc_id // SYNTH_GROUP`` share a base texture; each
    member perturbs ONE pixel by at most SYNTH_GROUP-1 intensity steps
    — a planted near-identical group. The texture is a quadratic-mixed
    integer hash mod a prime (dhash is invariant to constant intensity
    offsets, so the base must modulate the GRADIENT structure, not just
    shift it): measured on 400 docs, every intra-group pair lands at
    hamming <= 1 and no cross-group pair lands within hamming 3. All
    integer arithmetic, so a SQL oracle replays it bit-exactly."""
    base = doc_id - (doc_id % SYNTH_GROUP)
    x = np.arange(SYNTH_W, dtype=np.int64)[None, :]
    y = np.arange(SYNTH_H, dtype=np.int64)[:, None]
    raw = ((x * 31 + y * 17 + base * 101 + 7)
           * (x + y * 3 + (base % 89) + 1)) % 251
    raw = raw.copy()
    py, px = doc_id % SYNTH_H, doc_id % SYNTH_W
    raw[py, px] = (raw[py, px] + doc_id % SYNTH_GROUP) % 256
    return raw.astype(np.uint8)


def attach_synth_pnm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL P5 (binary grayscale PNM) payload generated from
    the id — the fixture path for the image near-dup registry queries:
    bytes are genuinely encoded here and genuinely decoded by
    ``image_perceptual_hash``, so the whole codec plumbing is on the
    hot path while staying SQL-replayable."""
    from azure_etl_spark.operators.codecs import encode_pnm

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, media binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["media"] = pdf[id_col].map(
                lambda i: encode_pnm(synth_image_array(int(i)))
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# --------------------------------------------------------------------------
# Video: temporally-pooled dhash over concatenated-PNM clips
# --------------------------------------------------------------------------

VIDEO_FRAMES = 4


def video_pooled_dhash(
    df: DataFrame, media_col: str = "media", out_col: str = "vfp"
) -> DataFrame:
    """Clip-level perceptual hash for the engine's uncompressed video
    format (concatenated self-delimiting PNM frames, the
    ``codecs.decode_pnm_stream`` payload): pool the frames into one
    INTEGER-mean image (sum // n — exact, so the SQL oracle replays
    it) and dhash the pooled thumbnail. The classic temporally-pooled
    fingerprint: editing one frame of k shifts each pooled pixel by at
    most amplitude/k, so near-identical clips land within a small
    Hamming distance while the signature stays 64 bits — the same
    chunk-bucket pair join as stills. One Arrow pass; frames never
    shuffle."""
    import numpy as _np

    from azure_etl_spark.operators.codecs import decode_pnm_stream

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, {out_col} bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: bytes) -> int:
            if d[:2] not in (b"P5", b"P6"):
                raise NotImplementedError(
                    f"video hash of magic {d[:2]!r} requires ffmpeg; "
                    "not in container"
                )
            frames = decode_pnm_stream(bytes(d))
            pooled = sum(f.astype(_np.int64) for f in frames) // len(frames)
            return dhash64(pooled)

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pdf[media_col].map(lambda d: one(bytes(d)))
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def synth_video_frames(doc_id: int) -> list[np.ndarray]:
    """Deterministic VIDEO_FRAMES-frame grayscale clip: frames share
    the doc's group texture (modulated per frame index), and each group
    member perturbs ONE pixel of ONE frame by (doc_id % SYNTH_GROUP)*40
    intensity steps — after integer-mean pooling that is a planted
    near-identical clip group. Measured over 400 docs: every
    intra-group pair within hamming 2 (561/600 exact), none across
    groups. Pure integer arithmetic, SQL-replayable."""
    base = doc_id - (doc_id % SYNTH_GROUP)
    x = np.arange(SYNTH_W, dtype=np.int64)[None, :]
    y = np.arange(SYNTH_H, dtype=np.int64)[:, None]
    frames = []
    for f in range(VIDEO_FRAMES):
        p = (
            (x * 31 + y * 17 + base * 101 + f * 59 + 7)
            * (x + y * 3 + f + (base % 89) + 1)
        ) % 251
        frames.append(p)
    pf = doc_id % VIDEO_FRAMES
    py, px = doc_id % SYNTH_H, doc_id % SYNTH_W
    frames[pf] = frames[pf].copy()
    frames[pf][py, px] = (
        frames[pf][py, px] + (doc_id % SYNTH_GROUP) * 40
    ) % 256
    return [fr.astype(np.uint8) for fr in frames]


def attach_synth_pnm_stream(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL concatenated-PNM clip payload generated from the
    id (the video twin of :func:`attach_synth_pnm`)."""
    from azure_etl_spark.operators.codecs import encode_pnm

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, media binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["media"] = pdf[id_col].map(
                lambda i: b"".join(
                    encode_pnm(fr) for fr in synth_video_frames(int(i))
                )
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# --------------------------------------------------------------------------
# 128-bit dhash: the measured scale path for billion-item corpora
# --------------------------------------------------------------------------
#
# The 64-bit/4x16-bit-chunk design's candidate volume carries a
# birthday term ~4*n^2/2^17 (measured: tools/scale_probe_media.py) —
# negligible per-candidate cost at 10^4-10^5 items, dominant at 10^9.
# Multi-index hashing's sizing rule (Norouzi et al. 2012): to keep
# buckets collision-free, bits-per-chunk must be >= log2(n). A 128-bit
# dhash over a 9x16 thumbnail pairs with 4 x 32-BIT chunks — the same
# pigeonhole completeness at hamming <= 3 (a local edit flips the same
# few bits regardless of signature length), with per-chunk collision
# rate n/2^32: collision-free to ~4e9 items. Same machinery, wider
# chunks.


def dhash128(arr: np.ndarray) -> tuple[int, int]:
    """128-bit difference hash: 9x16 grayscale thumbnail, bit
    ``y*8 + x`` iff ``g[y, x] > g[y, x+1]`` — returned as two SIGNED
    int64 words (bits 0..63, 64..127)."""
    from azure_etl_spark.operators.codecs import resize_nearest

    g = resize_nearest(_to_gray(arr), 9, 16)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64)  # (16, 8)
    w = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    lo = int(np.int64((bits[:8] * w).sum(dtype=np.uint64)))
    hi = int(np.int64((bits[8:] * w).sum(dtype=np.uint64)))
    return lo, hi


def image_perceptual_hash128(
    df: DataFrame, media_col: str = "media", out_prefix: str = "dh"
) -> DataFrame:
    """Add ``{out_prefix}0``/``{out_prefix}1`` int64 columns holding the
    128-bit dhash of PNM payloads (one Arrow pass, numpy kernel)."""
    from azure_etl_spark.operators.codecs import decode_pnm

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, {out_prefix}0 bigint, {out_prefix}1 bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: bytes) -> tuple[int, int]:
            if d[:2] not in (b"P5", b"P6"):
                raise NotImplementedError(
                    f"perceptual hash of magic {d[:2]!r} requires PIL; "
                    "not in container"
                )
            return dhash128(decode_pnm(d))

        for pdf in it:
            pdf = pdf.copy()
            pair = pdf[media_col].map(lambda d: one(bytes(d)))
            pdf[f"{out_prefix}0"] = pair.map(lambda t: t[0])
            pdf[f"{out_prefix}1"] = pair.map(lambda t: t[1])
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def hash128_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    lo_col: str,
    hi_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over a 128-bit signature held as two int64 words:
    4 x 32-BIT chunk pigeonhole join (complete at hamming <= 3, chunk
    collision rate n/2^32 — buckets stay collision-free to billions of
    items), verify with two bit_counts. Same lineage cut as the 64-bit
    variant: the decode pass runs once."""
    if max_hamming > 3:
        raise ValueError("4-chunk bucketing guarantees recall only for hamming <= 3")
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(lo_col).alias("lo"),
        F.col(hi_col).alias("hi"),
    ).localCheckpoint(eager=False)
    mask = F.lit(0xFFFFFFFF)
    chunk_exprs = [
        F.shiftrightunsigned(F.col("lo"), 0).bitwiseAND(mask),
        F.shiftrightunsigned(F.col("lo"), 32).bitwiseAND(mask),
        F.shiftrightunsigned(F.col("hi"), 0).bitwiseAND(mask),
        F.shiftrightunsigned(F.col("hi"), 32).bitwiseAND(mask),
    ]
    chunked = sig.select(
        "id",
        "lo",
        "hi",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("cidx"), e.alias("cval"))
                    for c, e in enumerate(chunk_exprs)
                ]
            )
        ).alias("ch"),
    ).select("id", "lo", "hi", "ch.cidx", "ch.cval")
    a = chunked.select(
        "cidx", "cval", F.col("id").alias("id_a"),
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
    )
    b = chunked.select(
        "cidx", "cval", F.col("id").alias("id_b"),
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
    )
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("int")
    return (
        a.join(b, ["cidx", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
