"""Positional merge-on-read deletes on the snapshot format — the
Delta deletion-vector / Iceberg position-delete shape: physical row
indexes within named data files, applied at read via a LEFT ANTI join
on the scan's ``_metadata`` (file, row_index). These are the entry
kind real Delta deletion vectors lower into on convert and raise back
out of on export."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_spark.sources.snapshot import (
    SnapshotVersionError,
    _load_manifest,
    _manifest_files,
    compact_snapshot,
    delete_from_snapshot,
    delete_keys_from_snapshot,
    delete_positions_from_snapshot,
    read_snapshot,
    snapshot_changes,
    vacuum_snapshots,
    write_snapshot,
)


def _three_file_table(spark, path):
    """Three single-file commits of 10 rows each (ids 0-9 / 10-19 /
    20-29), each file's physical row order = ascending id. Returns the
    manifest-relative file paths in id order."""
    for lo, mode in ((0, "overwrite"), (10, "append"), (20, "append")):
        df = (
            spark.range(lo, lo + 10)
            .select(F.col("id"), (F.col("id") * 2).alias("val"))
            .coalesce(1)
            .sortWithinPartitions("id")
        )
        write_snapshot(df, path, mode=mode)
    m = _load_manifest(spark, path, 2)
    files = _manifest_files(spark, path, m)[0]
    # map each file to the id range it holds via a stats-free read
    by_lo = {}
    for f in files:
        lo = (
            spark.read.parquet(f"{path}/{f}")
            .agg(F.min("id"))
            .collect()[0][0]
        )
        by_lo[lo] = f
    return [by_lo[0], by_lo[10], by_lo[20]]


def test_positional_delete_basic(spark, tmp_path):
    path = str(tmp_path / "tbl")
    f0, f1, _f2 = _three_file_table(spark, path)
    res = delete_positions_from_snapshot(
        spark, path, {f0: [0, 3], f1: [9]}
    )
    assert res["files_covered"] == 2 and res["n_positions"] == 3
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(30)) - {0, 3, 19})
    # time travel to the pre-delete version still sees every row
    assert read_snapshot(spark, path, version=2).count() == 30


def test_positional_delete_validates_and_noops(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    assert delete_positions_from_snapshot(spark, path, {})["files_covered"] == 0
    with pytest.raises(SnapshotVersionError, match="not live"):
        delete_positions_from_snapshot(spark, path, {"data/nope.parquet": [1]})


def test_positional_mixes_with_other_entry_kinds(spark, tmp_path):
    """A file covered by a positional AND a predicate AND an equality
    entry applies all three; deletes commute so the result is the set
    difference regardless of entry order."""
    path = str(tmp_path / "tbl")
    f0, _f1, _f2 = _three_file_table(spark, path)
    delete_positions_from_snapshot(spark, path, {f0: [1]})  # id 1
    delete_from_snapshot(
        spark, path, [("id", "between", (4, 5))], mode="merge_on_read"
    )
    keys = spark.createDataFrame([(8,), (25,)], "id long")
    delete_keys_from_snapshot(spark, path, keys, ["id"])
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(30)) - {1, 4, 5, 8, 25})


def test_positional_materializes_on_compact_and_cow(spark, tmp_path):
    path = str(tmp_path / "tbl")
    f0, f1, _f2 = _three_file_table(spark, path)
    delete_positions_from_snapshot(spark, path, {f0: [2], f1: [0, 1]})
    compact_snapshot(spark, path, target_file_bytes=1 << 30)
    m = _load_manifest(spark, path, 4)
    assert m.get("deletes") == []
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(30)) - {2, 10, 11})


def test_positional_delete_in_change_feed(spark, tmp_path):
    """table_changes emits the masked rows as ``delete`` changes for
    the positional commit — same contract as predicate/equality MOR."""
    path = str(tmp_path / "tbl")
    f0, _f1, _f2 = _three_file_table(spark, path)
    delete_positions_from_snapshot(spark, path, {f0: [0, 7]})
    ch = snapshot_changes(spark, path, 2).filter("_change_type = 'delete'")
    assert sorted(r["id"] for r in ch.collect()) == [0, 7]
    assert "__snap_pos" not in ch.columns and "__snap_file" not in ch.columns


def test_positional_sidecar_survives_vacuum(spark, tmp_path):
    import os

    path = str(tmp_path / "tbl")
    f0, _f1, _f2 = _three_file_table(spark, path)
    delete_positions_from_snapshot(spark, path, {f0: [5]})
    write_snapshot(
        spark.range(100, 102).select(F.col("id"), (F.col("id") * 2).alias("val")),
        path,
        mode="append",
    )
    vacuum_snapshots(spark, path, keep_last=1, min_age_s=0)
    # the tip still applies the entry: id 5 stays deleted
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert 5 not in got and 6 in got and 101 in got
    m = _load_manifest(spark, path, 4)
    pos_dir = next(e["positions_dir"] for e in m["deletes"])
    assert os.path.isdir(os.path.join(path, pos_dir))


def test_positional_streaming_source_applies_mask(spark, tmp_path):
    """The snapshot-tailing Python Data Source masks positional deletes
    executor-side (arrow), before row-dropping entries shift indexes."""
    from azure_etl_spark.streaming import snapshot_source

    snapshot_source.register(spark)
    path = str(tmp_path / "tbl")
    f0, _f1, _f2 = _three_file_table(spark, path)
    delete_positions_from_snapshot(spark, path, {f0: [0, 9]})
    delete_from_snapshot(
        spark, path, [("id", "=", 3)], mode="merge_on_read"
    )
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName("snap_posdel")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.table("snap_posdel").collect())
    assert got == sorted(set(range(30)) - {0, 9, 3})


def test_two_positional_entries_same_file_streaming(spark, tmp_path):
    """Two positional delete commits on the SAME file: the streaming
    arrow mask must address ORIGINAL physical indexes for both — the
    first entry's filter must not shift what the second one masks."""
    from azure_etl_spark.streaming import snapshot_source

    snapshot_source.register(spark)
    path = str(tmp_path / "tbl")
    f0, _f1, _f2 = _three_file_table(spark, path)
    delete_positions_from_snapshot(spark, path, {f0: [0]})  # id 0
    delete_positions_from_snapshot(spark, path, {f0: [5]})  # id 5 (NOT 6)
    # batch read path
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == sorted(set(range(30)) - {0, 5})
    # streaming path
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName("snap_pos2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.table("snap_pos2").collect())
    assert got == sorted(set(range(30)) - {0, 5})


def test_positional_delete_on_special_char_partition(spark, tmp_path):
    """Partition values with spaces/specials: the manifest's relative
    paths are URI-encoded (space -> %20, recorded from task-commit
    URIs) and so is _metadata.file_path — the position match relies on
    that byte-for-byte agreement, pinned here. The on-disk directory
    is the literal decoded name."""
    import os

    from azure_etl_spark.sources.snapshot import _manifest_files

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "North America" if i < 5 else "EMEA+APAC", i * 2) for i in range(10)],
        "id long, region string, val long",
    ).coalesce(1).sortWithinPartitions("id")
    write_snapshot(df, path, partition_by=["region"])
    m = _load_manifest(spark, path, 0)
    files = _manifest_files(spark, path, m)[0]
    na_file = next(f for f in files if "North%20America" in f)
    plus_file = next(f for f in files if "EMEA+APAC" in f)
    data_dir = os.path.join(path, na_file.split("/")[0], na_file.split("/")[1])
    assert os.path.isdir(os.path.dirname(os.path.join(path, na_file))) is False
    assert any("North America" in d for d in os.listdir(data_dir))
    # physical row 0 of each partition file = its lowest id
    delete_positions_from_snapshot(spark, path, {na_file: [0], plus_file: [0]})
    got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
    assert got == [1, 2, 3, 4, 6, 7, 8, 9]


def test_file_delete_entries_leave_manifest_pristine():
    """ADVICE r10: planning used to cache the decoded coverage set ON
    the manifest's delete-entry dict (``e["_lit_files"] = set``), which
    broke any later json.dumps of the manifest (sets aren't JSON) and
    dict-equality of entries. The cache now lives in a caller-owned
    per-planning-pass dict; the entry must come back byte-identical
    under json re-serialization, while repeated calls still hit the
    cache."""
    import json

    from azure_etl_spark.streaming.snapshot_source import _file_delete_entries

    m = {
        "deletes": [
            {"files": ["part%20a.parquet"], "predicate": [["x", "=", 1]]},
            {"files": ["other.parquet"], "positions_dir": "deletes/p0"},
        ]
    }
    before = json.dumps(m, sort_keys=True)
    cache: dict[int, set] = {}
    hit = _file_delete_entries("/tbl", m, "part a.parquet", cache)
    assert hit and hit[0]["predicate"] == [["x", "=", 1]]
    pos = _file_delete_entries("/tbl", m, "other.parquet", cache)
    assert pos and pos[0]["positions_path"].endswith("deletes/p0")
    assert json.dumps(m, sort_keys=True) == before
    assert len(cache) == 2  # both entries' coverage decoded exactly once
