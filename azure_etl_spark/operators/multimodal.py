"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata columns.
Everything Spark-side — schema, Arrow batch shape, ``mapInPandas``
plumbing, partition sizing — is real and tested. Codec kernels come in
three tiers:

- **REAL for uncompressed formats** (operators/codecs.py, pure
  numpy/stdlib): PNM images (P5/P6) decode/resize/features, PCM WAV
  audio decode/features — ``fake=False`` runs these end-to-end.
- **Deterministic fakes** (``fake=True``, the default in tests) for
  exercising the plumbing without real payloads.
- **Honestly gated** for compressed formats: JPEG/PNG/MP4 need
  PIL/opencv/ffmpeg, absent in this container -> NotImplementedError.

Scale notes: media rows are large, so the per-partition byte budget (not
row count) is what matters — ``repartition_for_payload`` sizes
partitions by estimated bytes. Feature extraction is `mapInPandas`
(Arrow batches; amortized Python crossing), never per-row UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_COLS = ("media_type", "width", "height", "n_frames", "sample_rate")


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: derive a deterministic binary payload + metadata from
    a text column (stands in for real image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return (
        df.withColumn("media", payload)
        .withColumn("media_type", F.lit("image/fake"))
        .withColumn("width", (F.length(payload) % 640 + 1).cast("int"))
        .withColumn("height", (F.length(payload) % 480 + 1).cast("int"))
        .withColumn("n_frames", F.lit(1))
        .withColumn("sample_rate", F.lit(None).cast("int"))
    )


def media_byte_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Metadata pass that never leaves the JVM: payload sizes/prefixes."""
    return df.select(
        "*",
        F.length(F.col(media_col)).alias("media_bytes"),
        F.hex(F.substring(F.col(media_col), 1, 4)).alias("magic_hex"),
    )


def repartition_for_payload(
    df: DataFrame, approx_row_bytes: int, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition so each task holds ~target bytes of media. At 100 TB
    this is the difference between streaming batches through Arrow and
    OOMing executors on row-count-balanced partitions."""
    n_rows = df.count()
    parts = max(1, (n_rows * approx_row_bytes) // target_partition_bytes)
    return df.repartition(int(parts))


def decode_image(data: bytes) -> "object":
    """Decode an image payload to a numpy array. REAL for binary PNM
    (P5 grayscale / P6 RGB — pure numpy); compressed formats are gated
    on PIL/opencv, absent in this container."""
    if data[:2] in (b"P5", b"P6"):
        from azure_etl_spark.operators.codecs import decode_pnm

        return decode_pnm(data)
    raise NotImplementedError(
        f"decode of magic {data[:2]!r} requires PIL/opencv; not in container"
    )


def _real_feature(data: bytes, n: int) -> list[float]:
    """Real descriptor kernel: dispatch on payload magic (PNM image /
    RIFF WAV audio)."""
    from azure_etl_spark.operators import codecs

    if data[:2] in (b"P5", b"P6"):
        return codecs.image_features(codecs.decode_pnm(data), n)
    if data[:4] == b"RIFF":
        return codecs.audio_features(*codecs.decode_wav(data), n=n)
    raise NotImplementedError(
        f"feature kernel for magic {data[:4]!r} requires PIL/av; not in container"
    )


def _fake_feature(data: bytes, n: int = 8) -> list[float]:
    """Deterministic fake feature vector from payload bytes (test stand-in
    for a real embedding/thumbnail kernel)."""
    acc = [0] * n
    for i, b in enumerate(data):
        acc[i % n] = (acc[i % n] * 31 + b) % 100003
    return [a / 100003.0 for a in acc]


def extract_features(
    df: DataFrame, media_col: str = "media", n_features: int = 8, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched binary in, fixed-size
    float array out. ``fake=False`` runs the REAL kernels for PNM/WAV
    payloads (compressed formats raise — see module docstring)."""
    out_fields = ", ".join(f"{c} {t}" for c, t in zip(df.columns, _spark_ddl_types(df)))
    schema = f"{out_fields}, features array<float>"
    kernel = _fake_feature if fake else _real_feature

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = pdf[media_col].map(
                lambda d: kernel(bytes(d), n_features)
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def _spark_ddl_types(df: DataFrame) -> list[str]:
    return [f.dataType.simpleString() for f in df.schema.fields]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """Image resize through mapInPandas: binary in, binary out, metadata
    updated. ``fake=False`` runs the REAL kernel for PNM payloads
    (decode -> nearest-neighbor resize -> re-encode, pure numpy);
    compressed formats raise. The fake kernel is deterministic — it
    re-hashes the payload with the target dims — and everything around
    either kernel (Arrow batching, schema preservation, metadata
    rewrite) is the same production plumbing."""
    schema = ", ".join(
        f"{c} {t}" for c, t in zip(df.columns, _spark_ddl_types(df))
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def real(d: bytes) -> bytes:
            from azure_etl_spark.operators import codecs

            if d[:2] not in (b"P5", b"P6"):
                raise NotImplementedError(
                    f"resize of magic {d[:2]!r} requires PIL/opencv; "
                    "not in container"
                )
            return codecs.encode_pnm(
                codecs.resize_nearest(codecs.decode_pnm(d), width, height)
            )

        for pdf in it:
            pdf = pdf.copy()
            pdf[media_col] = pdf[media_col].map(
                (
                    lambda d: hashlib.sha256(
                        bytes(d) + f"|{width}x{height}".encode()
                    ).digest()
                )
                if fake
                else (lambda d: real(bytes(d)))
            )
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling through mapInPandas: ONE media row expands to
    ceil(n_frames / every_n) frame rows — the 1->N shape (decode +
    per-frame emit) that explode can't express over opaque binary.
    ``fake=False`` runs the REAL kernel for concatenated-PNM streams
    (each frame self-delimits via its header — the uncompressed
    MJPEG-style layout; frame count comes from the actual stream, and
    each sampled frame re-encodes as standalone PNM); container formats
    (MP4 etc.) stay gated on av/ffmpeg. Output partitioning note: frame
    rows inherit the input partition, so follow with
    ``repartition_for_payload`` before heavy per-frame work.
    """
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in zip(df.columns, _spark_ddl_types(df)))
        + ", frame_idx int, frame binary"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                if fake:
                    n = int(rec.get("n_frames") or 1)
                    for i in range(0, n, every_n):
                        out = dict(rec)
                        out["frame_idx"] = i
                        out["frame"] = hashlib.sha256(
                            bytes(rec[media_col]) + f"|frame{i}".encode()
                        ).digest()
                        rows.append(out)
                else:
                    from azure_etl_spark.operators import codecs

                    data = bytes(rec[media_col])
                    if data[:2] not in (b"P5", b"P6"):
                        raise NotImplementedError(
                            f"frame extraction from magic {data[:2]!r} "
                            "requires av/ffmpeg; not in container"
                        )
                    frames = codecs.decode_pnm_stream(data)
                    for i in range(0, len(frames), every_n):
                        out = dict(rec)
                        out["frame_idx"] = i
                        out["frame"] = codecs.encode_pnm(frames[i])
                        rows.append(out)
            yield pd.DataFrame(rows, columns=list(pdf.columns) + ["frame_idx", "frame"])

    return df.mapInPandas(batches, schema=out_schema)


def media_stats_arrow(df: DataFrame, media_col: str = "media") -> DataFrame:
    """mapInArrow variant of per-media stats: operates on raw Arrow
    RecordBatches (no pandas materialization) -> (n_bytes, head_byte)
    per row. For binary-heavy columns this skips the Arrow->pandas
    object-boxing step that makes mapInPandas allocate a Python object
    per cell, which is the dominant cost when rows carry megabyte
    payloads; prefer it when the kernel can consume Arrow buffers
    directly (decoders, hashing, tensor libs with Arrow interop).
    """
    import pyarrow as pa

    def batches(it):
        for rb in it:
            col = rb.column(rb.schema.get_field_index(media_col))
            n_bytes = pa.array(
                [len(v.as_py() or b"") for v in col], type=pa.int64()
            )
            head = pa.array(
                [
                    (v.as_py()[0] if v.as_py() else None)
                    for v in col
                ],
                type=pa.int32(),
            )
            yield pa.RecordBatch.from_arrays([n_bytes, head], ["n_bytes", "head_byte"])

    return df.mapInArrow(batches, schema="n_bytes long, head_byte int")
