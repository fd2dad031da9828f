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
