"""Snapshot table format: atomic overwrite + time travel (the Delta
semantics the parquet fallback lacks, emulated with a manifest log —
S6/K3, silverToGold.scala:27)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_etl_spark.sources.files import read_table_format, write_partitioned
from azure_etl_spark.sources.snapshot import (
    SnapshotConflictError,
    SnapshotVersionError,
    _try_commit_manifest,
    read_snapshot,
    snapshot_history,
    vacuum_snapshots,
    write_snapshot,
)


def _df(spark, tag, n=10):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") % 3).alias("bucket")
    )


def test_overwrite_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    assert write_snapshot(_df(spark, "v0"), path) == 0
    assert write_snapshot(_df(spark, "v1", n=7), path) == 1

    latest = read_snapshot(spark, path)
    assert latest.count() == 7
    assert {r["tag"] for r in latest.collect()} == {"v1"}

    old = read_snapshot(spark, path, version=0)
    assert old.count() == 10
    assert {r["tag"] for r in old.collect()} == {"v0"}

    hist = snapshot_history(spark, path).orderBy("version").collect()
    assert [(r["version"], r["mode"]) for r in hist] == [(0, "overwrite"), (1, "overwrite")]

    with pytest.raises(SnapshotVersionError):
        read_snapshot(spark, path, version=99)


def test_overwrite_is_atomic_for_concurrent_readers(spark, tmp_path):
    """A reader that resolved its scan against version N must return
    version-N rows even if version N+1 commits before the action runs —
    the property a delete-before-write parquet overwrite breaks."""
    path = str(tmp_path / "tbl")
    write_snapshot(_df(spark, "v0"), path)
    reader = read_snapshot(spark, path)  # plan resolved against v0
    write_snapshot(_df(spark, "v1"), path)  # commit lands mid-"query"
    assert {r["tag"] for r in reader.collect()} == {"v0"}
    # and a fresh reader sees only the new version
    assert {r["tag"] for r in read_snapshot(spark, path).collect()} == {"v1"}


def test_append_chains_without_rewrite(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(_df(spark, "base", n=5), path)
    write_snapshot(_df(spark, "extra", n=3), path, mode="append")
    out = read_snapshot(spark, path)
    assert out.count() == 8
    assert {r["tag"] for r in out.collect()} == {"base", "extra"}
    # time travel to pre-append
    assert read_snapshot(spark, path, version=0).count() == 5
    # append dir holds only the appended rows (no rewrite of base data)
    hist = {r["version"]: r["n_data_dirs"] for r in snapshot_history(spark, path).collect()}
    assert hist == {0: 1, 1: 2}


def test_conflict_retries_next_version(spark, tmp_path):
    """If another writer claims the version first, the commit retries on
    the next version instead of clobbering the winner."""
    path = str(tmp_path / "tbl")
    write_snapshot(_df(spark, "v0"), path)
    # simulate a racing writer owning version 1
    assert _try_commit_manifest(
        spark, path, 1, {"version": 1, "mode": "overwrite",
                         "data_dirs": ["data/v0"], "partition_by": [],
                         "committed_at_unix": 0.0}
    )
    v = write_snapshot(_df(spark, "mine"), path)
    assert v == 2
    assert {r["tag"] for r in read_snapshot(spark, path).collect()} == {"mine"}
    # the raced version is still intact (points at v0's data)
    assert {r["tag"] for r in read_snapshot(spark, path, version=1).collect()} == {"v0"}
    # and a direct second claim of an existing version reports the loss
    assert not _try_commit_manifest(
        spark, path, 2, {"version": 2, "mode": "overwrite", "data_dirs": [],
                         "partition_by": [], "committed_at_unix": 0.0}
    )
    with pytest.raises(SnapshotConflictError):
        write_snapshot(_df(spark, "x"), path, max_retries=0)


def test_vacuum_drops_old_versions_keeps_shared_dirs(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(_df(spark, "v0", n=4), path)
    write_snapshot(_df(spark, "v1", n=3), path)
    write_snapshot(_df(spark, "v2", n=2), path, mode="append")  # shares v1's dir
    removed = vacuum_snapshots(spark, path, keep_last=2)
    assert removed == [0]
    with pytest.raises(SnapshotVersionError):
        read_snapshot(spark, path, version=0)
    # v1's data dir is shared with retained v2's append chain — must survive
    assert read_snapshot(spark, path, version=1).count() == 3
    assert read_snapshot(spark, path).count() == 5
    assert not os.path.exists(os.path.join(path, "data", "v0"))


def test_table_format_api_routes_snapshot(spark, tmp_path):
    """write_partitioned/read_table_format expose the snapshot format
    (fmt='snapshot' or auto-detected), including partitioned layouts."""
    path = str(tmp_path / "tbl")
    write_partitioned(_df(spark, "a", n=12), path, ["bucket"], fmt="snapshot")
    write_partitioned(_df(spark, "b", n=6), path, ["bucket"], fmt="snapshot")

    # auto-detect on read (no fmt), latest version
    out = read_table_format(spark, path)
    assert out.count() == 6
    assert {r["tag"] for r in out.collect()} == {"b"}
    # time travel through the same API
    assert read_table_format(spark, path, version=0).count() == 12

    # hive partitioning preserved: bucket is a real column and filters
    # prune to the partition directories
    pruned = out.filter(F.col("bucket") == 1)
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan
