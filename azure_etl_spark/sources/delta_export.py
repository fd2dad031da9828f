"""Delta-transaction-log EXPORT for snapshot tables (round 9).

The reference pipeline writes its gold layer with ``.format("delta")``
(silverToGold.scala:27). ``delta-spark`` itself is environment-blocked
(no delta jars, installs disabled — re-verified each round), so the
engine's snapshot format emulates the semantics. What remained missing
was pure INTEROP: a real Delta reader cannot open a snapshot table.

This module closes that gap from the write side using only the OPEN
Delta transaction-log protocol (the published PROTOCOL.md of the
delta-io project): a ``_delta_log/`` directory of JSON commit files,
each a list of actions — ``protocol``, ``metaData`` (Spark schema
JSON), ``add`` (file + partitionValues + stats), ``remove``. Writing
that log needs no delta jars at all, and the snapshot manifest chain
already records exactly the inputs: every version's live file list,
per-file rows/min/max stats, partition layout, and schema.

Design:

- :func:`export_delta_log` is INCREMENTAL and idempotent: it emits
  ``_delta_log/{N:020d}.json`` for every snapshot version not yet
  exported, one log version per manifest version (same numbering, so
  Delta time travel == snapshot time travel). Log files are created
  with the same O_EXCL create-new primitive as manifest commits —
  concurrent exporters race harmlessly (content is a pure function of
  the immutable manifest, the loser skips).
- Once ``_delta_log/`` exists, every subsequent snapshot commit
  auto-extends it (a post-commit hook in ``_try_commit_manifest`` —
  the single commit chokepoint, so appends, COW DML, compaction,
  restore, and WAP publishes all mirror). The mirror is derived state:
  a crashed writer leaves the log behind by a version and the next
  export call catches up — the snapshot manifest remains the source
  of truth.
- ``add`` actions carry Delta-format per-file stats
  (``numRecords``/``minValues``/``maxValues``) straight from the
  manifest's stats sidecars; compaction exports as
  ``dataChange=false`` add/remove pairs (Delta's OPTIMIZE contract,
  so streaming Delta readers skip it), every other operation as
  ``dataChange=true``.
- Merge-on-read delete entries CANNOT be expressed at
  ``minReaderVersion 1`` (Delta needs deletion vectors / reader v3):
  exporting a version that still carries them refuses with the fix
  (``compact_snapshot`` materializes MOR deletes).
- :func:`convert_from_delta_log` is the reverse migration: adopt an
  existing Delta table directory as a snapshot table by replaying its
  log (O(metadata) renames of the LIVE files, stats lifted from the
  ``add`` actions — no data read or rewritten, the CONVERT story at
  100 TB).
"""

from __future__ import annotations

import json
import re
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import SparkSession

from .snapshot import (
    DATA_DIR,
    MANIFEST_DIR,
    SnapshotConflictError,
    SnapshotVersionError,
    _fs,
    _jpath,
    _list_versions,
    _load_manifest,
    _manifest_files,
    _read_small_file,
    _try_commit_manifest,
    _write_stats_ref,
    is_snapshot_table,
    read_snapshot,
)

DELTA_LOG_DIR = "_delta_log"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# snapshot operation -> Delta commitInfo operation name
_DELTA_OPS = {
    "append": "WRITE",
    "overwrite": "WRITE",
    "convert": "CONVERT",
    "delete": "DELETE",
    "update": "UPDATE",
    "merge": "MERGE",
    "compact": "OPTIMIZE",
    "restore": "RESTORE",
    "wap_publish": "WRITE",
}


def _log_name(version: int) -> str:
    return f"{version:020d}.json"


_LOG_RE = re.compile(r"^(\d{20})\.json$")
_OFFSET_NAME = ".snapshot_offset"


def _exported_versions(spark: SparkSession, path: str) -> list[int]:
    fs, jvm = _fs(spark, path)
    ldir = _jpath(jvm, path, DELTA_LOG_DIR)
    if not fs.exists(ldir):
        return []
    out = []
    for st in fs.listStatus(ldir):
        m = _LOG_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _load_offset(spark: SparkSession, path: str) -> int | None:
    """Delta-log version = snapshot version - offset. A fresh table
    exports with offset 0 (numbering identical, Delta time travel ==
    snapshot time travel); a table whose early manifests were vacuumed
    before the log was armed pins offset = first surviving version, so
    the log still starts at the 0 Delta readers require."""
    fs, jvm = _fs(spark, path)
    p = _jpath(jvm, path, DELTA_LOG_DIR, _OFFSET_NAME)
    if not fs.exists(p):
        return None
    return int(json.loads(_read_small_file(jvm, fs, p).decode("utf-8"))["offset"])


def _store_offset(spark: SparkSession, path: str, offset: int) -> None:
    fs, jvm = _fs(spark, path)
    fs.mkdirs(_jpath(jvm, path, DELTA_LOG_DIR))
    stream = fs.create(_jpath(jvm, path, DELTA_LOG_DIR, _OFFSET_NAME), True)
    try:
        stream.write(bytearray(json.dumps({"offset": offset}).encode("utf-8")))
    finally:
        stream.close()


def _create_log_exclusive(
    spark: SparkSession, path: str, version: int, payload: bytes
) -> bool:
    """Create ``_delta_log/N.json`` with create-new semantics — the
    same O_EXCL discipline as manifest commits (java.io.File on
    file://, server-side overwrite=false elsewhere). False = another
    exporter already owns this version; content is derived from the
    immutable manifest, so the loser's payload was identical."""
    fs, jvm = _fs(spark, path)
    fs.mkdirs(_jpath(jvm, path, DELTA_LOG_DIR))
    lpath = _jpath(jvm, path, DELTA_LOG_DIR, _log_name(version))
    if fs.getUri().getScheme() == "file":
        local = fs.makeQualified(lpath).toUri().getPath()
        if not jvm.java.io.File(local).createNewFile():
            return False
        stream = fs.create(lpath, True)
    else:
        try:
            stream = fs.create(lpath, False)
        except Exception as exc:
            if "exists" in str(exc).lower():
                return False
            raise
    try:
        stream.write(bytearray(payload))
    finally:
        stream.close()
    return True


def _partition_values(rel_file: str, partition_cols: list[str]) -> dict:
    """Recover a file's Hive partition values from its path segments
    (``col=val`` dirs between the base data dir and the file name);
    Spark %-escapes special characters and writes nulls as the Hive
    default token. Returns only the columns actually present as path
    segments — a partition column with NO segment means the file was
    written under a DIFFERENT layout (snapshot partition evolution),
    which the caller must detect: a null partition value always gets
    its ``__HIVE_DEFAULT_PARTITION__`` segment, so absence is never
    null."""
    vals: dict[str, str | None] = {}
    for seg in rel_file.split("/")[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in partition_cols:
                vals[k] = None if v == _HIVE_NULL else unquote(v)
    return vals


def _file_meta(spark: SparkSession, path: str, rel_files: list[str]) -> dict:
    """(size, modificationTime-ms) per relative file, via ONE recursive
    listing per referenced base directory — never a per-file FS call
    (py4j round-trips cost ~5 ms each; export stays O(dirs) + one
    iterator walk)."""
    fs, jvm = _fs(spark, path)
    root = path.rstrip("/")
    bases = sorted({f.rsplit("/", 1)[0] for f in rel_files})
    # collapse to top-level data dirs so each is listed once
    tops = sorted({b.split("/")[0] + "/" + b.split("/")[1] if "/" in b else b
                   for b in bases})
    meta: dict[str, tuple[int, int]] = {}
    prefix = f"{root}/"
    for top in tops:
        it = fs.listFiles(_jpath(jvm, root, top), True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toUri().getPath()
            if prefix in p:
                rel = p.split(prefix, 1)[1]
                meta[rel] = (int(st.getLen()), int(st.getModificationTime()))
    return meta


def _delta_stats(file_stats: dict | None, partition_cols: list[str]) -> str | None:
    """Manifest per-file stats -> Delta's stats JSON string (partition
    columns excluded — they live in partitionValues)."""
    if not file_stats:
        return None
    drop = set(partition_cols)
    return json.dumps(
        {
            "numRecords": file_stats.get("rows"),
            "minValues": {
                k: v for k, v in file_stats.get("min", {}).items() if k not in drop
            },
            "maxValues": {
                k: v for k, v in file_stats.get("max", {}).items() if k not in drop
            },
        },
        sort_keys=True,
    )


def _table_id(path: str) -> str:
    """Stable metaData.id: Delta requires it constant across commits;
    deriving it from the table path keeps racing exporters' payloads
    byte-identical."""
    return str(uuid.uuid5(uuid.NAMESPACE_URL, "snapshot-delta:" + path.rstrip("/")))


def export_delta_log(
    spark: SparkSession, path: str, upto_version: int | None = None
) -> list[int]:
    """Export the snapshot table's manifest chain as a Delta
    transaction log under ``<path>/_delta_log/`` so any real Delta
    reader (outside this sandbox) can open the table the reference
    writes via ``silverToGold.scala:27``. Incremental: only versions
    not yet exported are emitted; returns the list of newly written
    log versions. Creating the log also ARMS per-commit mirroring —
    every later snapshot commit appends its own log entry.

    Raises if the CURRENT version still carries merge-on-read delete
    entries (row-level state minReaderVersion 1 cannot express); run
    ``compact_snapshot`` to materialize them first. Historical MOR
    versions (already materialized later in the chain) export as
    flagged commitInfo-only no-ops — time travel to them shows the
    pre-delete file contents, and the chain reconciles at the next
    materializing commit.
    """
    versions = _list_versions(spark, path)
    if not versions:
        raise SnapshotVersionError(f"no snapshot versions to export at {path}")
    if upto_version is None:
        upto_version = versions[-1]
    offset = _load_offset(spark, path)
    if offset is None:
        # arming the mirror: pin the numbering base at the earliest
        # surviving manifest (0 for an unvacuumed table)
        offset = versions[0]
        _store_offset(spark, path, offset)
    done = {d + offset for d in _exported_versions(spark, path)}
    todo = [v for v in versions if v <= upto_version and v not in done]
    if not todo:
        return []
    table_id = _table_id(path)
    written: list[int] = []
    prev_files: dict[str, dict] = {}
    prev_manifest: dict | None = None
    start = todo[0]
    if start > offset:
        try:
            prev_manifest = _load_manifest(spark, path, start - 1)
        except SnapshotVersionError as exc:
            raise SnapshotVersionError(
                f"delta-log mirror at {path} fell behind vacuum retention "
                f"(manifest v{start - 1} is gone, cannot diff v{start}); "
                "delete _delta_log/ and re-export to restart the log from "
                "the surviving chain"
            ) from exc
        pf, ps = _manifest_files(spark, path, prev_manifest)
        prev_files = {f: ps.get(f) for f in pf}
    tip = versions[-1]
    for v in todo:
        manifest = _load_manifest(spark, path, v)
        if manifest.get("deletes"):
            # merge-on-read delete entries are row-level state the
            # minReaderVersion-1 protocol cannot express. If they are
            # the CURRENT table state, refuse — a Delta reader would
            # see the un-deleted rows as live. A historical MOR
            # version (already materialized by a later compact/COW)
            # exports as a flagged commitInfo-only no-op: Delta time
            # travel to it shows the pre-delete file contents (the
            # honest reader-v1 view of those files), and the next
            # expressible version diffs against the last EXPRESSED
            # file set, so the chain reconciles exactly.
            if v == tip:
                raise SnapshotVersionError(
                    f"version {v} at {path} (the current version) carries "
                    "merge-on-read delete entries, which the Delta "
                    "minReaderVersion-1 protocol cannot express — "
                    "compact_snapshot() materializes them, then re-export"
                )
            ts = int(manifest.get("committed_at_unix", 0) * 1000)
            noop = {
                "commitInfo": {
                    "timestamp": ts,
                    "operation": _DELTA_OPS.get(
                        manifest.get("operation", "delete"), "DELETE"
                    ),
                    "operationParameters": {
                        "snapshotUnexpressible": "merge-on-read deletes; "
                        "row-level effect lands at the next materializing "
                        "commit"
                    },
                    "engineInfo": "azure-etl-spark snapshot-export",
                }
            }
            _create_log_exclusive(
                spark, path, v - offset,
                json.dumps(noop, sort_keys=True).encode("utf-8"),
            )
            written.append(v)
            prev_manifest = manifest  # schema tracking; file set NOT advanced
            continue
        files, stats = _manifest_files(spark, path, manifest)
        cur = {f: stats.get(f) for f in files}
        pcols = list(manifest.get("partition_by", []))
        op = manifest.get("operation", manifest.get("mode", "overwrite"))
        data_change = op != "compact"
        ts = int(manifest.get("committed_at_unix", 0) * 1000)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": ts,
                    "operation": _DELTA_OPS.get(op, "WRITE"),
                    "operationParameters": {},
                    "engineInfo": "azure-etl-spark snapshot-export",
                }
            }
        ]
        if v == offset:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        if prev_manifest is not None and pcols != list(
            prev_manifest.get("partition_by", [])
        ):
            # snapshot partition evolution (append under a different —
            # or no — hive layout): Delta's metaData could be replaced,
            # but earlier files' partition values live only in their
            # dir names and later files' in-data — no single
            # partitionColumns setting reads both correctly. Refuse.
            raise SnapshotVersionError(
                f"version {v} at {path} changes the partition layout "
                f"{prev_manifest.get('partition_by', [])} -> {pcols} "
                "(snapshot partition evolution), which the Delta protocol "
                "cannot express — rewrite to a uniform layout to export"
            )
        schema_changed = prev_manifest is None or (
            manifest.get("columns") != prev_manifest.get("columns")
        )
        if schema_changed:
            schema_string = read_snapshot(spark, path, v).schema.json()
            actions.append(
                {
                    "metaData": {
                        "id": table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_string,
                        "partitionColumns": pcols,
                        "configuration": {},
                        "createdTime": ts,
                    }
                }
            )
        added = [f for f in cur if f not in prev_files]
        removed = [f for f in prev_files if f not in cur]
        meta = _file_meta(spark, path, added) if added else {}
        for f in sorted(added):
            pv = _partition_values(f, pcols)
            if pcols and set(pv) != set(pcols):
                # snapshot partition evolution: this file was written
                # under a different (or no) hive layout than the
                # manifest's partition columns. Delta has no such
                # concept — emitting partitionValues for columns the
                # file stores IN-DATA would make readers see nulls.
                raise SnapshotVersionError(
                    f"version {v} at {path}: file {f} does not carry the "
                    f"table's partition layout {pcols} (snapshot partition "
                    "evolution), which the Delta protocol cannot express — "
                    "compact or rewrite to a uniform layout to export"
                )
            size, mtime = meta.get(f, (0, ts))
            add = {
                "path": quote(f),
                "partitionValues": pv,
                "size": size,
                "modificationTime": mtime,
                "dataChange": data_change,
            }
            st_json = _delta_stats(cur[f], pcols)
            if st_json:
                add["stats"] = st_json
            actions.append({"add": add})
        for f in sorted(removed):
            actions.append(
                {
                    "remove": {
                        "path": quote(f),
                        "deletionTimestamp": ts,
                        "dataChange": data_change,
                    }
                }
            )
        payload = "\n".join(json.dumps(a, sort_keys=True) for a in actions).encode(
            "utf-8"
        )
        _create_log_exclusive(spark, path, v - offset, payload)
        written.append(v)
        prev_files, prev_manifest = cur, manifest
    return written


def maybe_mirror_delta_log(spark: SparkSession, path: str) -> None:
    """Post-commit hook (called from ``_try_commit_manifest``): if a
    ``_delta_log/`` exists — i.e. :func:`export_delta_log` armed the
    mirror — extend it with the versions the log is missing. Best
    effort by contract: the delta log is DERIVED state, so any failure
    here (e.g. a merge-on-read commit that v1 readers can't express)
    must never fail the snapshot commit; the next explicit export
    surfaces the error."""
    import warnings

    try:
        fs, jvm = _fs(spark, path)
        if not fs.exists(_jpath(jvm, path, DELTA_LOG_DIR)):
            return
        export_delta_log(spark, path)
    except Exception as exc:  # noqa: BLE001 — derived state, commit already durable
        warnings.warn(
            f"delta-log mirror at {path} fell behind: {exc}", stacklevel=2
        )


def replay_delta_log(spark: SparkSession, path: str) -> dict:
    """Parse ``<path>/_delta_log/`` and replay its actions in version
    order — the reader half of the protocol, used by round-trip tests
    and :func:`convert_from_delta_log`. Returns ``{"live": {rel_path:
    add_action}, "schema_string", "partition_columns", "versions",
    "protocol"}`` (paths URL-decoded)."""
    fs, jvm = _fs(spark, path)
    versions = _exported_versions(spark, path)
    if not versions:
        raise SnapshotVersionError(f"no _delta_log at {path}")
    live: dict[str, dict] = {}
    schema_string = None
    pcols: list[str] = []
    protocol = None
    for v in versions:
        raw = _read_small_file(
            jvm, fs, _jpath(jvm, path, DELTA_LOG_DIR, _log_name(v))
        )
        for line in raw.decode("utf-8").splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                schema_string = action["metaData"]["schemaString"]
                pcols = list(action["metaData"].get("partitionColumns", []))
            elif "protocol" in action:
                protocol = action["protocol"]
            elif "add" in action:
                a = action["add"]
                live[unquote(a["path"])] = a
            elif "remove" in action:
                live.pop(unquote(action["remove"]["path"]), None)
    return {
        "live": live,
        "schema_string": schema_string,
        "partition_columns": pcols,
        "versions": versions,
        "protocol": protocol,
    }


def convert_from_delta_log(spark: SparkSession, path: str) -> int:
    """Adopt an existing Delta table directory as a snapshot table —
    the reverse of :func:`export_delta_log` and the other half of the
    migration story (a user leaving real Delta for this engine keeps
    their data in place).

    Replays the log to the live file set, then RENAMES live files
    under an attempt-unique ``data/v0-{token}`` dir (partition ``k=v``
    subdirs rebuilt from each add action's partitionValues, file names
    uniquified by their original dir) — O(metadata) per file, no data
    read or rewritten. Per-file stats are lifted straight from the
    ``add`` actions' stats JSON into a stats sidecar, so file skipping
    works immediately. Tombstoned (removed, un-vacuumed) files are
    left where they are — they become inert orphans, exactly like a
    race loser's data dir. Refuses tables that need
    ``minReaderVersion > 1`` (deletion vectors, column mapping)."""
    if is_snapshot_table(spark, path):
        raise SnapshotConflictError(f"{path} is already a snapshot table")
    fs0, jvm0 = _fs(spark, path)
    if fs0.exists(_jpath(jvm0, path, DELTA_LOG_DIR, "_last_checkpoint")):
        raise SnapshotVersionError(
            f"{path} has a Delta checkpoint; this converter replays JSON "
            "commits only — a checkpointed log would replay incomplete. "
            "Recreate the table without a checkpoint (or vacuum+rewrite) "
            "before converting"
        )
    state = replay_delta_log(spark, path)
    if state["versions"][0] != 0:
        raise SnapshotVersionError(
            f"delta log at {path} starts at version {state['versions'][0]} "
            "(earlier commits presumably folded into a checkpoint); replay "
            "would be incomplete"
        )
    proto = state["protocol"] or {}
    if proto.get("minReaderVersion", 1) > 1:
        raise SnapshotVersionError(
            f"{path} requires Delta minReaderVersion "
            f"{proto.get('minReaderVersion')} (deletion vectors / column "
            "mapping); only reader-v1 tables convert"
        )
    if any(a.get("deletionVector") for a in state["live"].values()):
        raise SnapshotVersionError(
            f"{path} has live deletion vectors; only reader-v1 tables convert"
        )
    if not state["live"]:
        raise SnapshotVersionError(f"delta log at {path} resolves to no live files")
    fs, jvm = _fs(spark, path)
    root = path.rstrip("/")
    data_rel = f"{DATA_DIR}/v0-{uuid.uuid4().hex[:8]}"
    pcols = state["partition_columns"]
    stats: dict[str, dict] = {}
    for rel, add in sorted(state["live"].items()):
        parts = rel.split("/")
        flat = "__".join(parts) if len(parts) > 1 else parts[0]
        segs = [data_rel]
        for c in pcols:
            v = add.get("partitionValues", {}).get(c)
            segs.append(f"{c}={_HIVE_NULL if v is None else quote(str(v), safe='')}")
        target_rel = "/".join(segs + [flat])
        tpath = _jpath(jvm, root, *segs, flat)
        fs.mkdirs(_jpath(jvm, root, *segs))
        if not fs.rename(_jpath(jvm, root, rel), tpath):
            raise SnapshotConflictError(
                f"convert: rename of {rel} under {path} failed — "
                "concurrent modification during convert?"
            )
        st = json.loads(add["stats"]) if add.get("stats") else None
        if st:
            stats[target_rel] = {
                "rows": st.get("numRecords"),
                "min": st.get("minValues", {}),
                "max": st.get("maxValues", {}),
            }
    import time as _time

    df = spark.read.option("basePath", f"{root}/{data_rel}").parquet(
        f"{root}/{data_rel}"
    )
    manifest = {
        "version": 0,
        "mode": "convert",
        "operation": "convert_from_delta",
        "data_dirs": [data_rel],
        "data_files": [],
        "partition_by": pcols,
        "committed_at_unix": _time.time(),
        "stats": {},
        "stats_refs": [_write_stats_ref(spark, path, stats)] if stats else [],
        "txns": {},
        "deletes": [],
        "columns": list(df.columns),
    }
    if not _try_commit_manifest(spark, path, 0, manifest):
        raise SnapshotConflictError(
            f"convert: version 0 appeared at {path} mid-convert; moved data "
            f"is intact under {data_rel} — recover manually"
        )
    # the original log described the PRE-rename paths and must neither
    # be read by Delta readers nor arm the mirror hook — park it as
    # provenance; export_delta_log starts a fresh, correct log on the
    # converted table if interop is still wanted
    fs.rename(
        _jpath(jvm, root, DELTA_LOG_DIR), _jpath(jvm, root, "_delta_log_imported")
    )
    return 0
