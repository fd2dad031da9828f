"""Versioned snapshot tables: atomic overwrite + time travel on plain
parquet, emulating the two Delta Lake semantics the environment-blocked
``delta-spark`` package would otherwise provide (S6/K3 —
silverToGold.scala:27 ``format("delta")``, goldToCosmosdb.scala:24-25
delta scan; the runtime has no delta jars, see README).

Protocol (a deliberately minimal version of the Delta log):

- Table root holds immutable data directories ``data/v{N}`` and a
  ``_manifest/`` directory with one JSON file per committed version.
- A commit IS the atomic create-if-not-exists of ``_manifest/v{N}.json``
  (Hadoop ``FileSystem.create(path, overwrite=false)`` — the same
  primitive Delta's log relies on). Data files are fully written BEFORE
  the manifest exists, so readers can never observe a partial version;
  a crashed writer leaves an orphan data dir that the next writer of
  that version number overwrites and ``vacuum`` cleans up.
- Two writers racing to commit the same version: exactly one wins the
  manifest create; the loser re-reads the log and retries against the
  next version number (optimistic concurrency, bounded retries).
- Readers resolve a version (latest by default, or any retained N for
  time travel) and load only the data dirs its manifest lists. Old
  version dirs are retained until ``vacuum``, so a reader that planned
  its scan against version N is unaffected by version N+1 committing
  mid-query — atomic overwrite WITHOUT delete-before-write.
- ``append`` commits a version whose manifest lists the parent's data
  dirs plus one new dir (no rewrite of existing data — the 100 TB
  append is sized by the appended rows only).

Scale notes: the manifest is metadata-sized (one small JSON per commit,
listing O(appends) directory names, not per-file entries — file listing
within a dir is delegated to the parquet reader). All filesystem access
goes through the Hadoop FS API, so the same code runs on HDFS/ABFS/S3A,
where ``create(overwrite=false)`` is the documented atomic primitive.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


class SnapshotConflictError(RuntimeError):
    """All optimistic-concurrency retries lost the manifest-create race."""


class SnapshotVersionError(ValueError):
    """Requested version does not exist (never committed, or vacuumed)."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jpath(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(p.rstrip("/") for p in parts))


def _read_small_file(jvm, fs, jpath) -> bytes:
    # py4j copies (never mutates) Python buffers passed to
    # InputStream.read, so drain the stream JVM-side and ship the
    # resulting byte[] back whole — manifests are metadata-sized.
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    fs, jvm = _fs(spark, path)
    mdir = _jpath(jvm, path, MANIFEST_DIR)
    if not fs.exists(mdir):
        return []
    versions = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            versions.append(int(name[1:-5]))
    return sorted(versions)


def _load_manifest(spark: SparkSession, path: str, version: int) -> dict:
    fs, jvm = _fs(spark, path)
    mpath = _jpath(jvm, path, MANIFEST_DIR, f"v{version}.json")
    if not fs.exists(mpath):
        raise SnapshotVersionError(
            f"snapshot version {version} not found under {path} "
            f"(available: {_list_versions(spark, path)})"
        )
    return json.loads(_read_small_file(jvm, fs, mpath).decode("utf-8"))


def _try_commit_manifest(
    spark: SparkSession, path: str, version: int, manifest: dict
) -> bool:
    """Atomically create ``_manifest/v{N}.json``; False if another
    writer committed this version first (the optimistic-concurrency
    loss), any other failure propagates."""
    fs, jvm = _fs(spark, path)
    fs.mkdirs(_jpath(jvm, path, MANIFEST_DIR))
    mpath = _jpath(jvm, path, MANIFEST_DIR, f"v{version}.json")
    try:
        stream = fs.create(mpath, False)  # overwrite=False -> atomic claim
    except Exception as exc:  # py4j wraps FileAlreadyExistsException
        if "exists" in str(exc).lower():
            return False
        raise
    try:
        stream.write(bytearray(json.dumps(manifest, sort_keys=True).encode("utf-8")))
    finally:
        stream.close()
    return True


def write_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_retries: int = 5,
) -> int:
    """Commit ``df`` as a new version of the snapshot table at ``path``.

    ``mode='overwrite'``: the new version's manifest lists only the new
    data dir — a full logical replace, atomic because old readers keep
    resolving their already-read manifest and old data dirs survive
    until :func:`vacuum_snapshots`. ``mode='append'``: the manifest
    lists the parent version's dirs plus the new one. Returns the
    committed version number.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"snapshot mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        version = (versions[-1] + 1) if versions else 0
        data_rel = f"{DATA_DIR}/v{version}"
        writer = df.write.mode("overwrite")  # reclaim a crashed writer's orphan dir
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(f"{path.rstrip('/')}/{data_rel}")
        dirs = [data_rel]
        if mode == "append" and versions:
            dirs = _load_manifest(spark, path, versions[-1])["data_dirs"] + dirs
        manifest = {
            "version": version,
            "mode": mode,
            "data_dirs": dirs,
            "partition_by": list(partition_by or []),
            "committed_at_unix": time.time(),
        }
        if _try_commit_manifest(spark, path, version, manifest):
            return version
        # lost the race: another writer owns this version — retry on top
        # of the new log state (our orphan data dir is vacuumable)
    raise SnapshotConflictError(
        f"lost the manifest-create race {max_retries} times at {path}"
    )


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the snapshot table at ``path`` — latest version by default,
    or any retained ``version`` (time travel)."""
    if version is None:
        versions = _list_versions(spark, path)
        if not versions:
            raise SnapshotVersionError(f"no committed snapshot versions under {path}")
        version = versions[-1]
    manifest = _load_manifest(spark, path, version)
    root = path.rstrip("/")
    dfs = [spark.read.parquet(f"{root}/{d}") for d in manifest["data_dirs"]]
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other)
    return out


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """Commit log as a DataFrame (version, mode, n_data_dirs,
    committed_at_unix) — the time-travel catalog."""
    rows = [
        (
            m["version"],
            m["mode"],
            len(m["data_dirs"]),
            float(m["committed_at_unix"]),
        )
        for m in (
            _load_manifest(spark, path, v) for v in _list_versions(spark, path)
        )
    ]
    return spark.createDataFrame(
        rows, "version int, mode string, n_data_dirs int, committed_at_unix double"
    )


def vacuum_snapshots(spark: SparkSession, path: str, keep_last: int = 2) -> list[int]:
    """Drop manifests and data dirs of all but the ``keep_last`` newest
    versions, plus orphan data dirs no retained manifest references
    (crashed or race-losing writers). Returns removed version numbers.

    Data dirs still referenced by a retained manifest are kept even if
    their own version's manifest is dropped (append chains share dirs).
    """
    versions = _list_versions(spark, path)
    if len(versions) <= keep_last:
        keep = set(versions)
    else:
        keep = set(versions[-keep_last:])
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_load_manifest(spark, path, v)["data_dirs"])
    fs, jvm = _fs(spark, path)
    removed = [v for v in versions if v not in keep]
    for v in removed:
        fs.delete(_jpath(jvm, path, MANIFEST_DIR, f"v{v}.json"), False)
    ddir = _jpath(jvm, path, DATA_DIR)
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            rel = f"{DATA_DIR}/{st.getPath().getName()}"
            if rel not in referenced:
                fs.delete(st.getPath(), True)
    return removed


def is_snapshot_table(spark: SparkSession, path: str) -> bool:
    fs, jvm = _fs(spark, path)
    return fs.exists(_jpath(jvm, path, MANIFEST_DIR))
