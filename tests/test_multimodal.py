"""Multimodal plumbing: binary columns + metadata + mapInPandas feature
extraction (codec kernels stubbed; Spark-side machinery real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    extract_features,
    media_byte_stats,
    repartition_for_payload,
)
from azure_etl_spark.sources.files import load_table


def test_media_schema_and_stats(spark, sf_dir):
    d = attach_fake_media(load_table(spark, sf_dir, "documents").limit(50))
    assert dict(d.dtypes)["media"] == "binary"
    s = media_byte_stats(d)
    row = s.filter(F.col("doc_id") == 0).head()
    assert row["media_bytes"] == len(row["media"])
    assert row["magic_hex"] == row["media"][:4].hex().upper()


def test_extract_features_mapinpandas(spark, sf_dir):
    d = attach_fake_media(load_table(spark, sf_dir, "documents").limit(20))
    out = extract_features(d, n_features=8)
    rows = out.select("doc_id", "features", "media").collect()
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same payload -> same features
    from azure_etl_spark.operators.multimodal import _fake_feature

    for r in rows[:5]:
        expect = _fake_feature(bytes(r["media"]), 8)
        assert [pytest.approx(x) for x in expect] == list(r["features"])


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_repartition_for_payload(spark, sf_dir):
    d = attach_fake_media(load_table(spark, sf_dir, "documents"))
    out = repartition_for_payload(d, approx_row_bytes=64 << 20, target_partition_bytes=128 << 20)
    assert out.rdd.getNumPartitions() >= 100  # ~2 rows per partition at 64MB rows


def test_resize_images_plumbing(spark, sf_dir):
    from azure_etl_spark.operators.multimodal import attach_fake_media, resize_images

    d = attach_fake_media(load_table(spark, sf_dir, "documents").limit(20))
    out = resize_images(d, 224, 224)
    # schema preserved through the Arrow roundtrip (nullability aside)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in d.schema
    ]
    rows = out.select("width", "height", "media").collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert all(len(r["media"]) == 32 for r in rows)  # fake kernel output
    # deterministic: same input -> same bytes
    again = {bytes(r["media"]) for r in resize_images(d, 224, 224).select("media").collect()}
    assert {bytes(r["media"]) for r in rows} == again


def test_sample_frames_expands_rows(spark, sf_dir):
    from azure_etl_spark.operators.multimodal import attach_fake_media, sample_frames

    d = attach_fake_media(load_table(spark, sf_dir, "documents").limit(10)).withColumn(
        "n_frames", F.lit(10)
    )
    out = sample_frames(d, every_n=3)
    # ceil(10/3) = 4 frames per video row
    assert out.count() == 10 * 4
    idx = sorted(
        r["frame_idx"] for r in out.filter(F.col("doc_id") == 0).collect()
    )
    assert idx == [0, 3, 6, 9]
    assert "frame" in out.columns and out.schema["frame"].dataType.simpleString() == "binary"


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile ingest (sources/files.py:read_binary_files): content
    bytes round-trip exactly, glob pushdown filters non-matching files,
    and the content column feeds the media plumbing ops."""
    import os

    from azure_etl_spark.sources.files import read_binary_files

    payloads = {f"img_{i}.fakejpg": bytes([i] * (10 + i)) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "notes.txt").write_text("not media")

    df = read_binary_files(spark, str(tmp_path), glob="*.fakejpg")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 5  # .txt filtered by pushed glob, not post-hoc
    for r in rows:
        name = os.path.basename(r["path"])
        assert bytes(r["content"]) == payloads[name]
        assert r["length"] == len(payloads[name])

    stats = df.select(
        F.length("content").alias("n_bytes"),
        F.crc32("content").alias("checksum"),
    ).collect()
    assert all(s["n_bytes"] > 0 and s["checksum"] is not None for s in stats)


def test_interpolate_linear_known_values(spark):
    """Hand-checked ramp: gap between (t=1,v=10) and (t=4,v=40) fills
    20/30 at t=2/3; leading/trailing gaps take the nearest neighbor."""
    from azure_etl_spark.operators.windows import interpolate_linear

    df = spark.createDataFrame(
        [
            ("u", 0.5, None),
            ("u", 1.0, 10.0),
            ("u", 2.0, None),
            ("u", 3.0, None),
            ("u", 4.0, 40.0),
            ("u", 5.0, None),
        ],
        "k string, t double, v double",
    )
    out = {
        r["t"]: r["value_filled"]
        for r in interpolate_linear(df, ["k"], "t", "v").collect()
    }
    assert out[0.5] == 10.0  # NOCB at the leading edge
    assert out[2.0] == 20.0 and out[3.0] == 30.0  # linear ramp
    assert out[5.0] == 40.0  # LOCF at the trailing edge
    assert out[1.0] == 10.0 and out[4.0] == 40.0  # observed pass through


def test_media_stats_arrow_matches_builtin(spark, sf_dir):
    """mapInArrow path: per-row byte stats equal the JVM-side
    F.length/F.expr computation over the same binary column."""
    from azure_etl_spark.operators.multimodal import attach_fake_media, media_stats_arrow

    df = attach_fake_media(load_table(spark, sf_dir, "documents").limit(200))
    got = sorted(
        (r["n_bytes"], r["head_byte"])
        for r in media_stats_arrow(df, "media").collect()
    )
    want = sorted(
        (r["n"], r["h"])
        for r in df.select(
            F.length("media").cast("long").alias("n"),
            F.conv(F.hex(F.substring("media", 1, 1)), 16, 10).cast("int").alias("h"),
        ).collect()
    )
    assert got == want and len(got) == 200


def _ppm(w, h):
    """Deterministic RGB gradient P6 image."""
    import numpy as np

    from azure_etl_spark.operators.codecs import encode_pnm

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = ((x * 37) % 256, (y * 91) % 256, (x + y) % 256)
    return encode_pnm(arr), arr


def _wav(sr=8000, n=400):
    import numpy as np

    from azure_etl_spark.operators.codecs import encode_wav

    t = np.arange(n)
    samples = (np.sin(2 * np.pi * 440 * t / sr) * 12000).astype("<i2")
    return encode_wav(sr, samples), sr, samples


def test_pnm_codec_roundtrip_and_resize():
    import numpy as np

    from azure_etl_spark.operators.codecs import (
        decode_pnm,
        encode_pnm,
        resize_nearest,
    )

    data, arr = _ppm(8, 6)
    back = decode_pnm(data)
    assert np.array_equal(back, arr)
    assert decode_pnm(encode_pnm(back[:, :, 0])).shape == (6, 8)  # P5 path
    small = resize_nearest(arr, 4, 3)
    assert small.shape == (3, 4, 3)
    # nearest-neighbor at exact 2x downscale samples pixel centers
    assert np.array_equal(small, arr[1::2, 1::2])


def test_real_image_kernels_through_spark(spark):
    """fake=False drives the REAL PNM kernels through the same
    mapInPandas plumbing; outputs must equal the numpy reference."""
    import numpy as np

    from azure_etl_spark.operators.codecs import decode_pnm, image_features
    from azure_etl_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    data, arr = _ppm(8, 6)
    df = spark.createDataFrame(
        [(1, bytearray(data), "image/x-ppm", 8, 6, 1, None)],
        "id long, media binary, media_type string, width int, height int,"
        " n_frames int, sample_rate int",
    )
    out = resize_images(df, 4, 3, fake=False).collect()[0]
    assert np.array_equal(
        decode_pnm(bytes(out["media"])), arr[1::2, 1::2]
    )
    assert (out["width"], out["height"]) == (4, 3)

    feats = extract_features(df, fake=False).collect()[0]["features"]
    want = image_features(arr, 8)
    assert [round(float(x), 5) for x in feats] == [round(w, 5) for w in want]


def test_real_audio_kernel_through_spark(spark):
    from azure_etl_spark.operators.codecs import audio_features
    from azure_etl_spark.operators.multimodal import extract_features

    data, sr, samples = _wav()
    df = spark.createDataFrame(
        [(1, bytearray(data), "audio/wav", None, None, 1, sr)],
        "id long, media binary, media_type string, width int, height int,"
        " n_frames int, sample_rate int",
    )
    feats = extract_features(df, fake=False).collect()[0]["features"]
    want = audio_features(sr, samples.reshape(-1, 1), 8)
    assert [round(float(x), 5) for x in feats] == [round(w, 5) for w in want]
    assert abs(feats[0] - 400 / 8000) < 1e-6  # duration


def test_unknown_magic_still_gated(spark):
    import pytest as _pytest

    from azure_etl_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n"), "image/png", 1, 1, 1, None)],
        "id long, media binary, media_type string, width int, height int,"
        " n_frames int, sample_rate int",
    )
    with _pytest.raises(Exception, match="PIL|NotImplemented"):
        resize_images(df, 2, 2, fake=False).collect()


def test_real_frame_sampling_pnm_stream(spark):
    """A 5-frame concatenated-PNM stream sampled every 2 frames yields
    frames 0, 2, 4 — each decoding back to the exact source frame."""
    import numpy as np

    from azure_etl_spark.operators.codecs import decode_pnm, decode_pnm_stream
    from azure_etl_spark.operators.multimodal import sample_frames

    frames = []
    stream = b""
    for f in range(5):
        data, arr = _ppm(4, 3)
        arr = (arr.astype(np.int64) + f) % 256
        from azure_etl_spark.operators.codecs import encode_pnm

        stream += encode_pnm(arr.astype(np.uint8))
        frames.append(arr.astype(np.uint8))
    assert len(decode_pnm_stream(stream)) == 5

    df = spark.createDataFrame(
        [(1, bytearray(stream), "video/x-pnm-stream", 4, 3, 5, None)],
        "id long, media binary, media_type string, width int, height int,"
        " n_frames int, sample_rate int",
    )
    out = sample_frames(df, every_n=2, fake=False).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        assert np.array_equal(decode_pnm(bytes(r["frame"])), frames[r["frame_idx"]])
