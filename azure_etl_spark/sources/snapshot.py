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

Round-5 extensions (Delta-parity DML on the same log protocol):

- **Per-file min/max stats** (``manifest["stats"]``): one extra pass
  over each *newly written* data dir groups by ``input_file_name`` and
  records row count + min/max per atomic-typed column — the same
  metadata Delta keeps in its log. Readers prune files whose
  [min, max] interval cannot satisfy a conjunctive predicate
  (:func:`read_snapshot` ``where=``), so a selective scan of a 100 TB
  table opens only the files that can match.
- **Copy-on-write DELETE / UPDATE** (:func:`delete_from_snapshot`,
  :func:`update_snapshot`): stats split the current version's files
  into *untouched* (interval disjoint from the predicate — carried into
  the new manifest verbatim, zero IO) and *touched* (read, rewritten
  without / with the change into a fresh data dir). The rewrite cost is
  sized by the touched files, not the table.
- **MERGE upsert** (:func:`merge_snapshot`): source key range prunes
  target files the same way; matched rows are replaced, unmatched
  source rows inserted. Unique-key source enforced (Delta's multiple-
  match error).
- **Compaction** (:func:`compact_snapshot`): rewrites the current
  version's many small files/dirs into one right-sized dir as a new
  version — OPTIMIZE without delta-spark; readers on old versions are
  unaffected.
- **Idempotent transactional writes** (``txn_app_id``/``txn_version``
  on :func:`write_snapshot`): the manifest carries a ``txns`` map
  (carried forward commit-to-commit, like Delta's SetTransaction), so
  a replayed streaming micro-batch (same app id, same batch id) is
  detected and skipped — exactly-once ``foreachBatch`` sinks.

Scale notes: the manifest is one small JSON per commit; with stats it
lists O(files) entries, exactly the granularity Delta's log keeps, and
vacuum bounds retained versions. All filesystem access goes through the
Hadoop FS API, so the same code runs on HDFS/ABFS/S3A, where
``create(overwrite=false)`` is the documented atomic primitive.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import re
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"

_DATA_V_RE = re.compile(rf"^({DATA_DIR}/v\d+)/")

# Atomic types whose min/max order DuckDB, Spark, and JSON agree on;
# stats are collected only for these (arrays/maps/binary are skipped —
# pruning on them is not meaningful).
_STATS_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.StringType,
    T.DateType, T.TimestampType, T.BooleanType,
)


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


def _json_safe(v):
    """Normalize a stats/predicate value so JSON round-trips preserve
    ordering comparability: dates/timestamps -> ISO strings (ISO order ==
    chronological order), Decimal -> float, numpy scalars -> Python."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def _stats_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _STATS_TYPES)]


def _list_parquet_files(spark: SparkSession, root: str, rel_dir: str) -> list[str]:
    """Recursive parquet-file listing under ``root/rel_dir`` (descends
    Hive partition subdirs), returned as paths relative to ``root``."""
    fs, jvm = _fs(spark, root)
    base = _jpath(jvm, root, rel_dir)
    if not fs.exists(base):
        return []
    prefix = fs.makeQualified(_jpath(jvm, root)).toString().rstrip("/") + "/"
    out = []
    it = fs.listFiles(base, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(p[len(prefix):] if p.startswith(prefix) else p)
    return sorted(out)


def _collect_file_stats(
    spark: SparkSession, root: str, rel_dir: str
) -> dict[str, dict]:
    """One pass over a newly written data dir: per-file row count and
    min/max for every atomic-typed column (partition columns included —
    Hive-dir discovery surfaces them as constant per file). This is the
    same per-file metadata Delta records in its log, and the input to
    all file skipping below."""
    df = spark.read.option("basePath", f"{root}/{rel_dir}").parquet(f"{root}/{rel_dir}")
    cols = _stats_columns(df)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = df.groupBy(F.input_file_name().alias("__file")).agg(*aggs).collect()
    prefix = f"{root.rstrip('/')}/"
    stats: dict[str, dict] = {}
    for r in rows:
        d = r.asDict()
        fpath = d["__file"]
        # input_file_name returns a URI (file:///...); strip scheme+root
        fpath = re.sub(r"^[a-z0-9+.-]+://?", "/", fpath).replace("//", "/")
        rel = fpath.split(prefix, 1)[1] if prefix in fpath else fpath
        stats[rel] = {
            "rows": d["__rows"],
            "min": {c: _json_safe(d[f"__min_{c}"]) for c in cols
                    if d[f"__min_{c}"] is not None},
            "max": {c: _json_safe(d[f"__max_{c}"]) for c in cols
                    if d[f"__max_{c}"] is not None},
        }
    return stats


Predicate = list[tuple]  # [(col, op, value)] conjunctive; op in =,<,<=,>,>=,between


def _file_may_match(file_stats: dict | None, where: Predicate) -> bool:
    """Conservative interval check: False only when the file's [min,max]
    for some conjunct provably excludes every row. Missing stats (column
    absent, all-null file, no stats collected) => may match. Null rows
    never satisfy a comparison predicate, so null-skipping min/max are
    safe bounds."""
    if not file_stats or not where:
        return True
    for col, op, val in where:
        lo = file_stats.get("min", {}).get(col)
        hi = file_stats.get("max", {}).get(col)
        if lo is None or hi is None:
            continue
        if op == "between":
            a, b = (_json_safe(val[0]), _json_safe(val[1]))
            if hi < a or lo > b:
                return False
            continue
        v = _json_safe(val)
        if (
            (op == "=" and (v < lo or v > hi))
            or (op == "<" and lo >= v)
            or (op == "<=" and lo > v)
            or (op == ">" and hi <= v)
            or (op == ">=" and hi < v)
        ):
            return False
    return True


def _where_to_column(where: Predicate) -> Column:
    cond = F.lit(True)
    for col, op, val in where:
        c = F.col(col)
        if op == "between":
            part = c.between(F.lit(val[0]), F.lit(val[1]))
        elif op == "=":
            part = c == F.lit(val)
        elif op == "<":
            part = c < F.lit(val)
        elif op == "<=":
            part = c <= F.lit(val)
        elif op == ">":
            part = c > F.lit(val)
        elif op == ">=":
            part = c >= F.lit(val)
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        cond = cond & part
    return cond


def _base_dir_of(rel_file: str) -> str:
    m = _DATA_V_RE.match(rel_file)
    if not m:
        raise ValueError(f"data file {rel_file!r} not under a {DATA_DIR}/vN dir")
    return m.group(1)


def _manifest_files(
    spark: SparkSession, path: str, manifest: dict
) -> tuple[list[str], dict[str, dict]]:
    """Expand a manifest to its full relative file list + stats map
    (dirs listed on demand; explicit data_files taken verbatim)."""
    root = path.rstrip("/")
    files: list[str] = list(manifest.get("data_files", []))
    for d in manifest["data_dirs"]:
        files.extend(_list_parquet_files(spark, root, d))
    return files, manifest.get("stats", {})


def _read_files(
    spark: SparkSession, root: str, rel_files: list[str]
) -> DataFrame:
    """Read an explicit file subset, grouping by data/vN base so Hive
    partition columns survive (``basePath`` per group).
    allowMissingColumns: dirs written before a schema-evolving append
    lack the new columns — they read back null-filled, Delta's
    mergeSchema read semantics."""
    groups: dict[str, list[str]] = {}
    for f in rel_files:
        groups.setdefault(_base_dir_of(f), []).append(f)
    out = None
    for base, fl in sorted(groups.items()):
        part = (
            spark.read.option("basePath", f"{root}/{base}")
            .parquet(*[f"{root}/{f}" for f in fl])
        )
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    return out


def _cluster_for_skipping(
    df: DataFrame, cluster_by: list[str], num_files: int | None = None
) -> DataFrame:
    """Clustered write = layout.sort_for_skipping applied at commit
    time: each written file covers a narrow [min,max] interval, which is
    what makes the manifest's stats-based file skipping effective
    (Delta's OPTIMIZE ZORDER serves the same purpose; compose with
    layout.morton_key for two-dimensional clustering). Without this, a
    uniformly-shuffled column's per-file interval spans the whole domain
    and no file is ever skippable."""
    from azure_etl_spark.operators.layout import sort_for_skipping

    return sort_for_skipping(df, cluster_by, partitions=num_files)


def write_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_retries: int = 5,
    collect_stats: bool = True,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    cluster_by: list[str] | None = None,
    cluster_files: int | None = None,
    merge_schema: bool = False,
) -> int:
    """Commit ``df`` as a new version of the snapshot table at ``path``.

    ``mode='overwrite'``: the new version's manifest lists only the new
    data dir — a full logical replace, atomic because old readers keep
    resolving their already-read manifest and old data dirs survive
    until :func:`vacuum_snapshots`. ``mode='append'``: the manifest
    lists the parent version's dirs plus the new one. Returns the
    committed version number.

    ``collect_stats`` (default on) records per-file min/max for file
    skipping — one extra scan of the *new* data only.

    ``txn_app_id``/``txn_version`` make the commit idempotent: if the
    current manifest's ``txns`` map already shows ``>= txn_version`` for
    this app id, the write is a replay (e.g. a restarted streaming
    micro-batch) and is skipped, returning ``-1``. The check re-runs
    inside the optimistic-concurrency retry loop, so a racing writer of
    the same transaction cannot double-commit.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"snapshot mode must be overwrite|append, got {mode!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    if cluster_by:
        df = _cluster_for_skipping(df, cluster_by, cluster_files)
    spark = df.sparkSession
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        parent = _load_manifest(spark, path, versions[-1]) if versions else None
        txns = dict(parent.get("txns", {})) if parent else {}
        if txn_app_id is not None and txns.get(txn_app_id, -1) >= txn_version:
            return -1  # replayed transaction: already durable, skip
        if mode == "append" and parent is not None and "columns" in parent:
            # Delta-style schema enforcement: appends must match the
            # table's columns unless merge_schema opts into evolution
            # (new columns null-fill old files on read; dropped columns
            # null-fill new files)
            drift = set(df.columns) ^ set(parent["columns"])
            if drift and not merge_schema:
                raise ValueError(
                    f"append schema drift {sorted(drift)} vs table columns "
                    f"{parent['columns']}; pass merge_schema=True to evolve"
                )
        version = (versions[-1] + 1) if versions else 0
        data_rel = f"{DATA_DIR}/v{version}"
        writer = df.write.mode("overwrite")  # reclaim a crashed writer's orphan dir
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        root = path.rstrip("/")
        writer.parquet(f"{root}/{data_rel}")
        dirs = [data_rel]
        carried_files: list[str] = []
        stats: dict[str, dict] = {}
        if collect_stats:
            stats = _collect_file_stats(spark, root, data_rel)
        if mode == "append" and parent is not None:
            dirs = parent["data_dirs"] + dirs
            carried_files = list(parent.get("data_files", []))
            # carry parent's stats for every file it still references
            stats = {**parent.get("stats", {}), **stats}
        if txn_app_id is not None:
            txns[txn_app_id] = txn_version
        columns = list(df.columns)
        if mode == "append" and parent is not None and "columns" in parent:
            # evolved table schema = parent's order, new columns appended
            columns = parent["columns"] + [
                c for c in df.columns if c not in parent["columns"]
            ]
        manifest = {
            "version": version,
            "mode": mode,
            "data_dirs": dirs,
            "data_files": carried_files,
            "partition_by": list(partition_by or []),
            "committed_at_unix": time.time(),
            "stats": stats,
            "txns": txns,
            "columns": columns,
        }
        if _try_commit_manifest(spark, path, version, manifest):
            return version
        # lost the race: another writer owns this version — retry on top
        # of the new log state (our orphan data dir is vacuumable)
    raise SnapshotConflictError(
        f"lost the manifest-create race {max_retries} times at {path}"
    )


def _resolve_version(spark: SparkSession, path: str, version: int | None) -> int:
    if version is not None:
        return version
    versions = _list_versions(spark, path)
    if not versions:
        raise SnapshotVersionError(f"no committed snapshot versions under {path}")
    return versions[-1]


def resolve_scan(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: Predicate | None = None,
) -> tuple[list[str], list[str]]:
    """File-skipping planner: returns ``(files_to_read, files_skipped)``
    (paths relative to the table root) for a version + conjunctive
    predicate, using the manifest's per-file min/max stats. Exposed so
    tests and scale probes can assert *how much* a predicate prunes,
    independent of reading the data."""
    manifest = _load_manifest(spark, path, _resolve_version(spark, path, version))
    files, stats = _manifest_files(spark, path, manifest)
    if not where:
        return files, []
    read = [f for f in files if _file_may_match(stats.get(f), where)]
    skipped = [f for f in files if f not in set(read)]
    return read, skipped


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: Predicate | None = None,
) -> DataFrame:
    """Read the snapshot table at ``path`` — latest version by default,
    or any retained ``version`` (time travel).

    ``where`` is an optional conjunctive predicate
    ``[(col, op, value), ...]`` (op in ``= < <= > >= between``). It is
    applied twice: file skipping via manifest stats (files whose
    [min,max] cannot match are never opened — the 100 TB win), then as a
    normal row filter Catalyst pushes into the surviving scans."""
    version = _resolve_version(spark, path, version)
    manifest = _load_manifest(spark, path, version)
    root = path.rstrip("/")
    if where:
        rel_files, _ = resolve_scan(spark, path, version, where)
        if not rel_files:
            # all files pruned: empty frame with the table schema
            probe = _manifest_files(spark, path, manifest)[0]
            if not probe:
                raise SnapshotVersionError(
                    f"version {version} at {path} lists no data files"
                )
            return _project(
                _read_files(spark, root, probe).filter(F.lit(False)), manifest
            )
        return _project(
            _read_files(spark, root, rel_files).filter(_where_to_column(where)),
            manifest,
        )
    out = None
    for d in manifest["data_dirs"]:
        part = spark.read.option("basePath", f"{root}/{d}").parquet(f"{root}/{d}")
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    extra = manifest.get("data_files", [])
    if extra:
        part = _read_files(spark, root, extra)
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    if out is None:
        raise SnapshotVersionError(f"version {version} at {path} lists no data")
    return _project(out, manifest)


def _project(df: DataFrame, manifest: dict) -> DataFrame:
    """Normalize to the manifest's recorded column order (schema-evolved
    unions put new columns wherever the first-read dir had them)."""
    cols = manifest.get("columns")
    return df.select(*cols) if cols else df


def snapshot_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """File-granularity change feed between two versions (Delta CDF
    semantics at the manifest's resolution): for each commit in
    ``(from_version, to_version]``, rows in files the commit ADDED are
    ``_change_type='insert'``, rows in files it REMOVED are
    ``'delete'``; an UPDATE surfaces as a delete+insert pair. Each row
    carries ``_commit_version``.

    Granularity caveat (same trade Delta makes without the CDF column):
    a copy-on-write commit rewrites entire touched files, so unchanged
    rows *within* a touched file appear as delete+insert churn — bounded
    by the touched-file count, which stats-based pruning already
    minimizes. Downstream consumers that need net row changes can
    anti-join the two sides on the full row.

    Scale: reads only the files that entered/left the manifest between
    the two versions — an incremental consumer processes O(changed
    data), never the table.
    """
    if to_version is None:
        to_version = _resolve_version(spark, path, None)
    if to_version <= from_version:
        raise ValueError(f"to_version {to_version} must exceed from_version {from_version}")
    root = path.rstrip("/")
    out = None
    prev_manifest = _load_manifest(spark, path, from_version)
    prev_files = set(_manifest_files(spark, path, prev_manifest)[0])
    for v in range(from_version + 1, to_version + 1):
        manifest = _load_manifest(spark, path, v)
        cur_files = set(_manifest_files(spark, path, manifest)[0])
        if manifest.get("operation") == "compact":
            # layout-only commit (Delta's dataChange=false): same rows,
            # different files — not a change to feed consumers
            prev_files = cur_files
            continue
        for rel, tag in ((cur_files - prev_files, "insert"),
                         (prev_files - cur_files, "delete")):
            if not rel:
                continue
            part = (
                _read_files(spark, root, sorted(rel))
                .withColumn("_change_type", F.lit(tag))
                .withColumn("_commit_version", F.lit(v).cast("int"))
            )
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        prev_files = cur_files
    if out is None:
        base = read_snapshot(spark, path, version=to_version).limit(0)
        return (
            base.withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0).cast("int"))
            .filter(F.lit(False))
        )
    return out


def _commit_cow(
    spark: SparkSession,
    path: str,
    parent: dict,
    keep_files: list[str],
    rewrite_df: DataFrame | None,
    operation: str,
    max_retries: int = 5,
) -> int:
    """Shared copy-on-write commit: write ``rewrite_df`` (if any rows) to
    a fresh data dir, then commit a manifest listing the untouched files
    plus the new dir. Retries the manifest-create race like
    write_snapshot (data dirs are version-named, so a retry rewrites)."""
    root = path.rstrip("/")
    partition_by = parent.get("partition_by", [])
    parent_stats = parent.get("stats", {})
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        version = (versions[-1] + 1) if versions else 0
        data_rel = f"{DATA_DIR}/v{version}"
        dirs: list[str] = []
        stats = {f: parent_stats[f] for f in keep_files if f in parent_stats}
        if rewrite_df is not None:
            writer = rewrite_df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(f"{root}/{data_rel}")
            # a fully-deleted touched set writes an empty dir (no parquet
            # files when partitioned) — then the new version simply
            # carries the untouched files
            if _list_parquet_files(spark, root, data_rel):
                dirs = [data_rel]
                stats.update(_collect_file_stats(spark, root, data_rel))
        manifest = {
            "version": version,
            "mode": "overwrite",
            "operation": operation,
            "data_dirs": dirs,
            "data_files": sorted(keep_files),
            "partition_by": partition_by,
            "committed_at_unix": time.time(),
            "stats": stats,
            "txns": dict(parent.get("txns", {})),
            # COW ops never change the table schema
            **({"columns": parent["columns"]} if "columns" in parent else {}),
        }
        if _try_commit_manifest(spark, path, version, manifest):
            return version
    raise SnapshotConflictError(
        f"lost the manifest-create race {max_retries} times at {path}"
    )


def delete_from_snapshot(
    spark: SparkSession,
    path: str,
    where: Predicate,
    version: int | None = None,
) -> dict:
    """Copy-on-write DELETE: files whose stats prove no row matches are
    carried into the new version untouched (zero IO); only files that
    *may* contain matches are read and rewritten without the matching
    rows. Returns ``{"version", "files_kept", "files_rewritten"}`` —
    the rewrite cost is sized by the touched files, not the table."""
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    touched, keep = resolve_scan(spark, path, version, where)
    root = path.rstrip("/")
    rewrite = None
    if touched:
        rewrite = _read_files(spark, root, touched).filter(~_where_to_column(where))
    new_version = _commit_cow(spark, path, parent, keep, rewrite, "delete")
    return {
        "version": new_version,
        "files_kept": len(keep),
        "files_rewritten": len(touched),
    }


def update_snapshot(
    spark: SparkSession,
    path: str,
    where: Predicate,
    set_exprs: dict[str, Column | str],
    version: int | None = None,
) -> dict:
    """Copy-on-write UPDATE: same file-skipping split as DELETE; touched
    files are rewritten with ``set_exprs`` applied to matching rows
    (non-matching rows in a touched file pass through unchanged)."""
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    touched, keep = resolve_scan(spark, path, version, where)
    root = path.rstrip("/")
    rewrite = None
    if touched:
        df = _read_files(spark, root, touched)
        cond = _where_to_column(where)
        updates = {
            c: F.when(cond, F.expr(e) if isinstance(e, str) else e)
            .otherwise(F.col(c))
            .cast(df.schema[c].dataType)
            for c, e in set_exprs.items()
        }
        rewrite = df.withColumns(updates)
    new_version = _commit_cow(spark, path, parent, keep, rewrite, "update")
    return {
        "version": new_version,
        "files_kept": len(keep),
        "files_rewritten": len(touched),
    }


def merge_snapshot(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    version: int | None = None,
) -> dict:
    """MERGE upsert (WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT
    ALL): target files whose key-range is disjoint from the source's
    [min,max] per key column are untouched; the rest are rewritten with
    matched rows replaced by their source row, and source rows matching
    no target key are inserted. Duplicate keys in the source raise (the
    Delta multiple-match error) — a nondeterministic merge is a bug, not
    a result. Source and target schemas must agree by name."""
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    source = source.localCheckpoint(eager=True)  # stable across the 2 uses below
    dup = source.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"merge source has duplicate keys on {key_cols}")
    # key-range pruning predicate from the source's own min/max
    bounds = source.agg(
        *[F.min(k).alias(f"lo_{k}") for k in key_cols],
        *[F.max(k).alias(f"hi_{k}") for k in key_cols],
    ).collect()[0]
    where: Predicate = [
        (k, "between", (bounds[f"lo_{k}"], bounds[f"hi_{k}"])) for k in key_cols
        if bounds[f"lo_{k}"] is not None
    ]
    touched, keep = resolve_scan(spark, path, version, where or None)
    root = path.rstrip("/")
    cols = None
    if touched:
        target = _read_files(spark, root, touched)
        cols = target.columns
        # matched: replace with source row; keep: target rows with no match
        unmatched_target = target.join(source.select(*key_cols), key_cols, "left_anti")
        matched_source = source.join(target.select(*key_cols), key_cols, "left_semi")
        rewrite = unmatched_target.select(*cols).unionByName(
            matched_source.select(*cols)
        )
        inserts = source.join(target.select(*key_cols), key_cols, "left_anti")
    else:
        # key ranges disjoint from every file: pure insert
        sample = _manifest_files(spark, path, parent)[0]
        cols = _read_files(spark, root, sample).columns if sample else source.columns
        rewrite = None
        inserts = source
    ins = inserts.select(*cols)
    rewrite = ins if rewrite is None else rewrite.unionByName(ins)
    new_version = _commit_cow(spark, path, parent, keep, rewrite, "merge")
    return {
        "version": new_version,
        "files_kept": len(keep),
        "files_rewritten": len(touched),
    }


def compact_snapshot(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    version: int | None = None,
    cluster_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE: rewrite the current version's (possibly many small)
    files into one right-sized data dir, committed as a new version —
    bit-identical rows, fewer files. Readers pinned to old versions are
    unaffected; vacuum reclaims the small files once retention allows.
    File count is computed from actual on-disk bytes of the current
    version, so a long append chain of micro-batches collapses to
    ~target-sized files."""
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    files, _ = _manifest_files(spark, path, parent)
    root = path.rstrip("/")
    fs, jvm = _fs(spark, root)
    total = sum(fs.getFileStatus(_jpath(jvm, root, f)).getLen() for f in files)
    n = max(1, -(-total // max(1, target_file_bytes)))  # ceil-div
    df = read_snapshot(spark, path, version=version)
    partition_by = parent.get("partition_by", [])
    if cluster_by:
        # OPTIMIZE + cluster: rewritten files get narrow [min,max]
        # intervals on the clustering columns, re-arming file skipping
        # that a long append chain of unordered batches has eroded
        df = _cluster_for_skipping(df, cluster_by, int(n))
    elif partition_by:
        # spread within partitions without a global shuffle key collision
        df = df.repartition(int(n), *partition_by)
    else:
        df = df.repartition(int(n))
    new_version = _commit_cow(spark, path, parent, [], df, "compact")
    return {
        "version": new_version,
        "files_before": len(files),
        "target_files": int(n),
    }


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """Commit log as a DataFrame (version, mode, n_data_dirs,
    committed_at_unix) — the time-travel catalog."""
    rows = [
        (
            m["version"],
            m["mode"],
            m.get("operation", m["mode"]),
            len(m["data_dirs"]),
            len(m.get("data_files", [])),
            float(m["committed_at_unix"]),
        )
        for m in (
            _load_manifest(spark, path, v) for v in _list_versions(spark, path)
        )
    ]
    return spark.createDataFrame(
        rows,
        "version int, mode string, operation string, n_data_dirs int, "
        "n_kept_files int, committed_at_unix double",
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
        m = _load_manifest(spark, path, v)
        referenced.update(m["data_dirs"])
        # COW manifests reference individual untouched files inside old
        # version dirs — those dirs must survive vacuum too
        referenced.update(_base_dir_of(f) for f in m.get("data_files", []))
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
