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


# ---------------------------------------------------------------------------
# Round-5 Delta-parity DML: stats/file-skipping, COW delete/update, merge,
# compaction, transactional idempotence.

from azure_etl_spark.sources.snapshot import (  # noqa: E402
    compact_snapshot,
    delete_from_snapshot,
    merge_snapshot,
    resolve_scan,
    update_snapshot,
)


def _keyed(spark, lo, hi, tag="t"):
    """Rows with id in [lo, hi) in a SINGLE file, so per-file min/max
    stats give each append a disjoint key interval."""
    return (
        spark.range(lo, hi)
        .select(
            F.col("id"),
            F.lit(tag).alias("tag"),
            (F.col("id") * 10).alias("val"),
        )
        .coalesce(1)
    )


def _three_file_table(spark, path):
    """id ranges [0,100), [100,200), [200,300) — one file each."""
    write_snapshot(_keyed(spark, 0, 100, "a"), path)
    write_snapshot(_keyed(spark, 100, 200, "b"), path, mode="append")
    write_snapshot(_keyed(spark, 200, 300, "c"), path, mode="append")


def test_stats_collected_and_file_skipping(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    all_files, _ = resolve_scan(spark, path)
    assert len(all_files) == 3

    # predicate inside one file's interval: 2 of 3 files skipped
    read, skipped = resolve_scan(spark, path, where=[("id", "between", (120, 130))])
    assert len(read) == 1 and len(skipped) == 2

    out = read_snapshot(spark, path, where=[("id", "between", (120, 130))])
    assert out.count() == 11
    assert {r["tag"] for r in out.collect()} == {"b"}

    # predicate matching nothing anywhere: all files pruned, schema kept
    read, skipped = resolve_scan(spark, path, where=[("id", ">", 10_000)])
    assert read == [] and len(skipped) == 3
    empty = read_snapshot(spark, path, where=[("id", ">", 10_000)])
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "tag", "val"}

    # string-column stats prune too
    read, skipped = resolve_scan(spark, path, where=[("tag", "=", "c")])
    assert len(read) == 1 and len(skipped) == 2


def test_delete_rewrites_only_touched_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    before_files, _ = resolve_scan(spark, path)

    res = delete_from_snapshot(spark, path, [("id", "between", (150, 250))])
    # files [100,200) and [200,300) touched; [0,100) carried untouched
    assert res["files_rewritten"] == 2 and res["files_kept"] == 1

    out = read_snapshot(spark, path)
    ids = {r["id"] for r in out.collect()}
    assert ids == set(range(0, 150)) | set(range(251, 300))

    # the untouched file is literally the same file (no rewrite)
    after_files, _ = resolve_scan(spark, path)
    kept = set(before_files) & set(after_files)
    assert len(kept) == 1 and next(iter(kept)).startswith("data/v0/")

    # old version still time-travels to the pre-delete rows
    assert read_snapshot(spark, path, version=2).count() == 300


def test_update_applies_only_to_matching_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    res = update_snapshot(
        spark, path, [("id", "between", (0, 9))], {"val": "val + 1", "tag": F.lit("upd")}
    )
    assert res["files_rewritten"] == 1 and res["files_kept"] == 2
    out = read_snapshot(spark, path)
    assert out.count() == 300
    rows = {r["id"]: (r["val"], r["tag"]) for r in out.collect()}
    assert rows[5] == (51, "upd")
    assert rows[9] == (91, "upd")
    assert rows[10] == (100, "a")  # outside predicate, same file: untouched
    assert rows[250] == (2500, "c")  # untouched file


def test_merge_upsert_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    # source: update ids 190..199, insert ids 1000..1009 — key range
    # [190, 1009] overlaps files 2 and 3, not file 1
    source = (
        spark.range(190, 200)
        .union(spark.range(1000, 1010))
        .select(
            F.col("id"), F.lit("src").alias("tag"), (F.col("id") * -1).alias("val")
        )
    )
    res = merge_snapshot(spark, path, source, ["id"])
    assert res["files_kept"] == 1 and res["files_rewritten"] == 2
    out = read_snapshot(spark, path)
    assert out.count() == 310
    rows = {r["id"]: (r["val"], r["tag"]) for r in out.collect()}
    assert rows[195] == (-195, "src")  # matched -> replaced
    assert rows[150] == (1500, "b")  # unmatched target in touched file
    assert rows[1005] == (-1005, "src")  # inserted
    assert rows[50] == (500, "a")  # untouched file

    # duplicate source keys are an error, not a nondeterministic merge
    dup = source.union(source.limit(1))
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_snapshot(spark, path, dup, ["id"])


def test_merge_disjoint_keys_is_pure_insert(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    source = _keyed(spark, 5000, 5010, "new")
    res = merge_snapshot(spark, path, source, ["id"])
    assert res["files_kept"] == 3 and res["files_rewritten"] == 0
    assert read_snapshot(spark, path).count() == 310


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(_keyed(spark, 0, 50, "a").repartition(8), path)
    write_snapshot(_keyed(spark, 50, 100, "b").repartition(8), path, mode="append")
    files_before, _ = resolve_scan(spark, path)
    assert len(files_before) > 8
    before = sorted(
        (r["id"], r["tag"], r["val"]) for r in read_snapshot(spark, path).collect()
    )
    res = compact_snapshot(spark, path, target_file_bytes=1 << 30)
    files_after, _ = resolve_scan(spark, path)
    assert len(files_after) == 1
    after = sorted(
        (r["id"], r["tag"], r["val"]) for r in read_snapshot(spark, path).collect()
    )
    assert before == after
    # old (pre-compaction) version still readable until vacuum
    assert read_snapshot(spark, path, version=res["version"] - 1).count() == 100
    hist = {r["version"]: r["operation"] for r in snapshot_history(spark, path).collect()}
    assert hist[res["version"]] == "compact"


def test_vacuum_keeps_dirs_referenced_by_cow_files(spark, tmp_path):
    """After a COW delete, the new manifest references individual files
    inside OLD version dirs — vacuum must keep those dirs even when the
    old versions' manifests are dropped."""
    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)
    delete_from_snapshot(spark, path, [("id", "between", (150, 250))])
    removed = vacuum_snapshots(spark, path, keep_last=1)
    assert removed == [0, 1, 2]
    # data/v0 (untouched file carried by the delete manifest) survives
    out = read_snapshot(spark, path)
    assert out.count() == 199  # 300 - 101 deleted (between is inclusive)
    assert {r["id"] for r in out.collect()} == set(range(0, 150)) | set(range(251, 300))


def test_partitioned_cow_preserves_partition_columns(spark, tmp_path):
    """COW on a Hive-partitioned snapshot: partition columns survive
    file-granular reads (basePath grouping) and land back partitioned."""
    path = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket"), (F.col("id") * 2).alias("val")
    )
    write_snapshot(df, path, partition_by=["bucket"])
    # partition-column predicate: only bucket=2 files touched
    res = delete_from_snapshot(spark, path, [("bucket", "=", 2), ("id", "<", 50)])
    assert res["files_kept"] > 0
    out = read_snapshot(spark, path)
    assert "bucket" in out.columns
    assert out.count() == 100 - 12  # ids 2,6,...,46 in bucket 2 below 50
    assert out.filter("bucket = 2").count() == 25 - 12


def test_txn_idempotent_replay_skipped(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v = write_snapshot(
        _keyed(spark, 0, 10), path, mode="append", txn_app_id="app", txn_version=0
    )
    assert v == 0
    # replay of the same (app, batch) is detected and skipped
    assert (
        write_snapshot(
            _keyed(spark, 0, 10), path, mode="append", txn_app_id="app", txn_version=0
        )
        == -1
    )
    assert read_snapshot(spark, path).count() == 10
    # next batch commits; txns map carries forward so an old replay
    # arriving late is STILL rejected
    write_snapshot(
        _keyed(spark, 10, 20), path, mode="append", txn_app_id="app", txn_version=1
    )
    assert (
        write_snapshot(
            _keyed(spark, 0, 10), path, mode="append", txn_app_id="app", txn_version=0
        )
        == -1
    )
    assert read_snapshot(spark, path).count() == 20
    # a different app id is independent
    assert (
        write_snapshot(
            _keyed(spark, 100, 105), path, mode="append", txn_app_id="other",
            txn_version=0,
        )
        > 0
    )
    assert read_snapshot(spark, path).count() == 25


def test_cluster_by_arms_file_skipping(spark, tmp_path):
    """A uniformly-shuffled key gives every file a whole-domain [min,max]
    interval (nothing skippable); cluster_by range-sorts the write so a
    narrow predicate prunes almost everything — the property that makes
    stats skipping pay off at scale, not just exist."""
    df = spark.range(10_000).select(
        # decorrelate from insertion order so unclustered files span the domain
        F.xxhash64("id").alias("key"), F.col("id").alias("payload")
    )
    lo = df.agg(F.expr("percentile(key, 0.50)")).collect()[0][0]
    hi = df.agg(F.expr("percentile(key, 0.52)")).collect()[0][0]
    pred = [("key", "between", (int(lo), int(hi)))]

    unclustered = str(tmp_path / "flat")
    write_snapshot(df.repartition(8), unclustered)
    read_u, skip_u = resolve_scan(spark, unclustered, where=pred)
    assert len(skip_u) == 0 and len(read_u) == 8  # every file may match

    clustered = str(tmp_path / "clustered")
    write_snapshot(df, clustered, cluster_by=["key"], cluster_files=8)
    read_c, skip_c = resolve_scan(spark, clustered, where=pred)
    assert len(read_c) <= 2 and len(skip_c) >= 6  # 2% range -> ~1 file

    # identical answers either way
    a = sorted(r["payload"] for r in read_snapshot(spark, unclustered, where=pred).collect())
    b = sorted(r["payload"] for r in read_snapshot(spark, clustered, where=pred).collect())
    assert a == b and len(a) > 0


def test_compact_with_cluster_by_rearms_skipping(spark, tmp_path):
    """An append chain of unordered micro-batches erodes skipping;
    compact_snapshot(cluster_by=...) is OPTIMIZE-with-clustering — fewer
    files AND narrow per-file intervals again."""
    path = str(tmp_path / "tbl")
    df = spark.range(4000).select(F.xxhash64("id").alias("key"), F.col("id").alias("v"))
    for i in range(4):
        part = df.filter(F.col("v") % 4 == i).repartition(3)
        write_snapshot(part, path, mode="append" if i else "overwrite")
    pred = [("key", "between", (0, 1 << 40))]  # tiny slice of int64 domain
    read_b, _ = resolve_scan(spark, path, where=pred)
    assert len(read_b) == 12  # every file spans the domain: no pruning

    before = sorted(r["v"] for r in read_snapshot(spark, path).collect())
    compact_snapshot(spark, path, target_file_bytes=16 << 10, cluster_by=["key"])
    after = sorted(r["v"] for r in read_snapshot(spark, path).collect())
    assert before == after
    files, _ = resolve_scan(spark, path)
    read_a, skip_a = resolve_scan(spark, path, where=pred)
    assert len(files) > 1 and len(read_a) <= 2 and len(skip_a) >= len(files) - 2


def test_snapshot_append_writer_stream_exactly_once(spark, sf_dir, tmp_path):
    """End-to-end availableNow stream through snapshot_append_writer:
    the corpus lands as snapshot versions, and a crash-replay of an
    already-committed batch id is rejected by the txns map."""
    from azure_etl_spark.sources.files import load_table
    from azure_etl_spark.sources.snapshot import read_snapshot as read_snap
    from azure_etl_spark.streaming.sinks import snapshot_append_writer

    src_dir = str(tmp_path / "src")
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    events.write.mode("overwrite").parquet(src_dir)
    table = str(tmp_path / "tbl")
    writer = snapshot_append_writer(table, app_id="ingest-test")

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = events.count()
    assert read_snap(spark, table).count() == total

    # simulate an at-least-once replay of batch 0 after a crash: the
    # foreachBatch function is re-invoked with the same batch_id
    writer(spark.read.parquet(src_dir).limit(50), 0)
    assert read_snap(spark, table).count() == total


def test_schema_enforcement_and_evolution(spark, tmp_path):
    """Appends with drifted columns are rejected unless merge_schema
    opts in; evolved reads null-fill old files and keep the recorded
    column order (Delta mergeSchema semantics)."""
    path = str(tmp_path / "tbl")
    write_snapshot(_keyed(spark, 0, 10, "a"), path)  # id, tag, val

    drifted = spark.range(5).select(F.col("id"), F.lit("x").alias("extra"))
    with pytest.raises(ValueError, match="schema drift"):
        write_snapshot(drifted, path, mode="append")

    evolved = spark.range(10, 15).select(
        F.col("id"), F.lit("b").alias("tag"), (F.col("id") * 10).alias("val"),
        F.lit("new").alias("extra"),
    )
    write_snapshot(evolved, path, mode="append", merge_schema=True)
    out = read_snapshot(spark, path)
    assert out.columns == ["id", "tag", "val", "extra"]
    rows = {r["id"]: r["extra"] for r in out.collect()}
    assert rows[3] is None and rows[12] == "new"
    # post-evolution append of the OLD shape also needs merge_schema
    with pytest.raises(ValueError, match="schema drift"):
        write_snapshot(_keyed(spark, 20, 25), path, mode="append")
    write_snapshot(_keyed(spark, 20, 25), path, mode="append", merge_schema=True)
    assert read_snapshot(spark, path).count() == 20


def test_snapshot_change_feed(spark, tmp_path):
    from azure_etl_spark.sources.snapshot import snapshot_changes

    path = str(tmp_path / "tbl")
    _three_file_table(spark, path)  # v0..v2: appends of [0,100) [100,200) [200,300)

    # append commit -> pure inserts
    ch = snapshot_changes(spark, path, from_version=1, to_version=2)
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}
    assert {r["id"] for r in ch.collect()} == set(range(200, 300))
    assert {r["_commit_version"] for r in ch.collect()} == {2}

    # COW delete -> deletes for the touched file's removed rows, plus
    # rewrite churn (delete+insert) for surviving rows of that file
    delete_from_snapshot(spark, path, [("id", "between", (100, 150))])  # v3
    ch = snapshot_changes(spark, path, from_version=2).cache()
    assert {r["_commit_version"] for r in ch.collect()} == {3}
    dels = {r["id"] for r in ch.filter("_change_type = 'delete'").collect()}
    ins = {r["id"] for r in ch.filter("_change_type = 'insert'").collect()}
    assert dels == set(range(100, 200))  # whole touched file leaves
    assert ins == set(range(151, 200))  # survivors re-enter
    # net deletes = exactly the deleted keys
    assert dels - ins == set(range(100, 151))
    # untouched files ([0,100), [200,300)) generate NO churn
    assert not (dels | ins) & (set(range(0, 100)) | set(range(200, 300)))

    # compaction is layout-only: invisible to the feed
    compact_snapshot(spark, path, target_file_bytes=1 << 30)  # v4
    assert snapshot_changes(spark, path, from_version=3).count() == 0

    # multi-commit range stitches per-commit tags
    write_snapshot(_keyed(spark, 500, 510, "z"), path, mode="append")  # v5
    ch = snapshot_changes(spark, path, from_version=3)
    assert {r["_commit_version"] for r in ch.collect()} == {5}
    assert {r["id"] for r in ch.collect()} == set(range(500, 510))


def test_maintain_agg_from_changes_equals_recompute(spark, tmp_path):
    """Incrementally-maintained SUM/COUNT state tracks a snapshot table
    through append, COW delete, and COW update commits, matching a full
    recompute at every step."""
    from azure_etl_spark.operators.aggregate import maintain_agg_from_changes
    from azure_etl_spark.sources.snapshot import snapshot_changes

    path = str(tmp_path / "tbl")

    def full(df):
        return {
            (r["tag"]): (r["s"], r["n"])
            for r in df.groupBy("tag")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        }

    def state_dict(st):
        return {r["tag"]: (r["val"], r["n"]) for r in st.collect()}

    base = _keyed(spark, 0, 100, "a").union(_keyed(spark, 100, 200, "b"))
    write_snapshot(base.coalesce(1), path)  # v0
    state = maintain_agg_from_changes(
        None, base.withColumn("_change_type", F.lit("insert")), ["tag"], ["val"]
    )
    assert state_dict(state) == full(read_snapshot(spark, path))

    last = 0
    for commit in (
        lambda: write_snapshot(_keyed(spark, 200, 250, "c").coalesce(1), path, mode="append"),
        lambda: delete_from_snapshot(spark, path, [("id", "between", (150, 220))]),
        lambda: update_snapshot(spark, path, [("id", "<", 10)], {"val": "val + 1000"}),
    ):
        commit()
        from azure_etl_spark.sources.snapshot import _list_versions
        cur = _list_versions(spark, path)[-1]
        ch = snapshot_changes(spark, path, from_version=last, to_version=cur).select(
            "tag", "val", "_change_type"
        )
        state = maintain_agg_from_changes(state, ch, ["tag"], ["val"])
        assert state_dict(state) == full(read_snapshot(spark, path)), f"at v{cur}"
        last = cur

    # a fully-deleted group drops out of the state
    delete_from_snapshot(spark, path, [("tag", "=", "c")])
    cur = _list_versions(spark, path)[-1]
    ch = snapshot_changes(spark, path, from_version=last, to_version=cur).select(
        "tag", "val", "_change_type"
    )
    state = maintain_agg_from_changes(state, ch, ["tag"], ["val"])
    assert "c" not in state_dict(state)
    assert state_dict(state) == full(read_snapshot(spark, path))


def test_snapshot_table_streaming_source(spark, tmp_path):
    """Tail a snapshot table as a stream (Python Data Source): initial
    load = current version, then one micro-batch per commit; compaction
    emits nothing; a COW delete fails the tail unless ignorechanges."""
    from azure_etl_spark.streaming import snapshot_source

    snapshot_source.register(spark)
    path = str(tmp_path / "tbl")
    write_snapshot(_keyed(spark, 0, 100, "a"), path)
    write_snapshot(_keyed(spark, 100, 150, "b"), path, mode="append")

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    out = drain()
    assert out.count() == 150  # initial load covers both commits
    assert set(out.columns) == {"id", "tag", "val"}

    # tail: only the new commit's rows arrive in the next run
    write_snapshot(_keyed(spark, 150, 170, "c"), path, mode="append")
    out = drain()
    assert out.count() == 170
    assert out.filter("tag = 'c'").count() == 20

    # compaction is invisible to the tail
    compact_snapshot(spark, path, target_file_bytes=1 << 30)
    assert drain().count() == 170

    # a COW delete breaks the append-only tail loudly
    delete_from_snapshot(spark, path, [("id", "between", (0, 10))])
    import pyspark.errors

    with pytest.raises(pyspark.errors.StreamingQueryException, match="removes files"):
        drain()


def test_snapshot_stream_source_partitioned(spark, tmp_path):
    """Hive partition columns are reconstructed from per-file stats."""
    from azure_etl_spark.streaming import snapshot_source

    snapshot_source.register(spark)
    path = str(tmp_path / "tbl")
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 3).alias("bucket"), (F.col("id") * 2).alias("val")
    )
    write_snapshot(df, path, partition_by=["bucket"])
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName("snap_part")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("snap_part")
    assert out.count() == 40
    got = {(r["id"], r["bucket"], r["val"]) for r in out.collect()}
    want = {(i, i % 3, i * 2) for i in range(40)}
    assert got == want


def test_snapshot_stream_source_ignore_changes(spark, tmp_path):
    """With ignorechanges=true a COW commit's rewrite files are emitted
    (re-delivering surviving rows — Delta's documented ignoreChanges
    trade) instead of failing the tail."""
    from azure_etl_spark.streaming import snapshot_source

    snapshot_source.register(spark)
    path = str(tmp_path / "tbl")
    write_snapshot(_keyed(spark, 0, 100, "a"), path)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", path)
            .option("ignorechanges", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    assert drain().count() == 100
    delete_from_snapshot(spark, path, [("id", "<", 20)])
    out = drain()
    # rewrite file re-delivers the 80 survivors; deletes are not replayed
    assert out.count() == 180
    assert out.filter("id < 20").count() == 20  # only the original delivery
