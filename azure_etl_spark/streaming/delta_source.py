"""FOREIGN Delta tables as a Structured Streaming SOURCE — tail a real
``_delta_log/`` commit-by-commit without delta jars (round 11, VERDICT
r10 #5). The reference lands gold with ``.format("delta")`` writers
(silverToGold.scala:27); the engine's export/convert pair already
speaks the open protocol both directions (sources/delta_export.py), and
this source closes the streaming leg: ``spark.readStream.format(
"delta_log_table").option("path", t)`` follows the log exactly like
Delta's own streaming source —

- offsets are Delta log versions; restart/replay is exactly-once by
  construction (the action walk between two offsets is deterministic);
- the first offset snapshots the table's CURRENT version as one initial
  load — the protocol-replayed live file set **with each file's
  deletion vector applied** (arrow mask executor-side, the same path
  positional snapshot deletes use), so the initial load matches what a
  real Delta reader serves at that version;
- ``dataChange=false`` commits (OPTIMIZE) emit nothing;
- a commit that removes files (COW DELETE/UPDATE/MERGE) or re-adds a
  file under a deletion vector (DV DELETE — rows logically removed)
  breaks the append-only tail: the source raises unless
  ``ignorechanges=true``, which then emits COW rewrite files (may
  re-deliver surviving rows — Delta's documented ignoreChanges caveat)
  and emits NOTHING for DV-only commits (already-delivered rows stay
  delivered — the ignoreDeletes caveat);
- ``startingversion`` (int | ``latest``) skips the initial snapshot
  load, exactly like the snapshot-table source;
- ``maxfilespertrigger`` / ``maxbytespertrigger`` (files and/or a soft
  byte cap, at least one file per batch) pace multi-file
  commits/backlogs through the
  same sub-commit offset form ``{"version": V, "pos": K, "init": B}``
  the snapshot source uses (first planned batch uncapped — the Python
  source API plans latestOffset before the reader learns checkpoint
  position; Delta makes the same trade after restart).

Like streaming/snapshot_source.py, everything is plain-Python on
purpose (the Spark 4 Python Data Source API runs this in a dedicated
Python worker with no JVM gateway): commits parse driver-side with
``open``/``json``, each input partition is ONE parquet file read
executor-side via pyarrow, and deletion vectors decode executor-side
with the pure-Python roaring codec (sources/roaring.py) — O(DV bytes),
never row-level driver traffic.

Checkpoint seeds for the initial load read all three protocol forms
with pure local IO: classic single-file, classic multi-part (parts'
row union), and V2 manifest + ``_delta_log/_sidecars/`` parquet
sidecars. ``name``-mode FLAT column mappings stream directly (the
common real-Databricks shape): data columns resolve by physical
parquet name at the arrow boundary and partitionValues translate to
logical columns at typing time. Honest gates (raised, never silently
wrong): ``id``-mode and NESTED mappings (the batch convert verifies
and handles both) and reader features beyond {deletionVectors,
timestampNtz, v2Checkpoint}.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

DELTA_LOG_DIR = "_delta_log"
_SUPPORTED_READER_FEATURES = {"deletionVectors", "timestampNtz", "v2Checkpoint"}


def _log_versions(table: str) -> list[int]:
    d = os.path.join(table, DELTA_LOG_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.endswith(".json") and not n.startswith("_"):
            stem = n[:-5]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _tip_version(table: str) -> int | None:
    """Latest version the log describes: the newest commit JSON, or —
    for a checkpoint-only log (cleanup removed every JSON) — the
    version ``_last_checkpoint`` names."""
    vs = _log_versions(table)
    if vs:
        return vs[-1]
    lc_path = os.path.join(table, DELTA_LOG_DIR, "_last_checkpoint")
    if os.path.exists(lc_path):
        with open(lc_path) as f:
            return int(json.load(f)["version"])
    return None


def _commit_actions(table: str, v: int) -> list[dict]:
    """Parse one commit's JSON actions. Real Delta writers publish
    commits by atomic rename and this engine's exporter by O_EXCL
    write-then-publish, so a listed version is complete; retry the
    sub-millisecond window where the exporter's stream is still open
    (same contract as snapshot_source._manifest)."""
    import time

    p = os.path.join(table, DELTA_LOG_DIR, f"{v:020d}.json")
    for _ in range(40):
        try:
            with open(p) as f:
                raw = f.read()
        except FileNotFoundError:
            raise ValueError(
                f"foreign delta log at {table} has no commit {v} "
                f"({v:020d}.json missing — log cleaned up?); restart the "
                "stream from a fresh checkpoint"
            ) from None
        if raw.strip():
            try:
                return [json.loads(ln) for ln in raw.splitlines() if ln.strip()]
            except json.JSONDecodeError:
                pass
        time.sleep(0.05)
    raise ValueError(f"delta commit {v} under {table} unreadable after retries")


def _checkpoint_rows(table: str) -> tuple[list[dict], int] | None:
    """Action rows of the checkpoint ``_last_checkpoint`` names, pure
    local IO (this source never touches the JVM): classic single-file,
    classic multi-part (``parts`` in the pointer — rows are the parts'
    union), or a V2-spec manifest ``N.checkpoint.<uniqueStr>.{json|
    parquet}`` whose file actions live in ``_delta_log/_sidecars/``
    parquet sidecars. Returns None when there is no checkpoint at all;
    raises when the pointer names one that cannot be read."""
    import pyarrow.parquet as pq

    ldir = os.path.join(table, DELTA_LOG_DIR)
    lc_path = os.path.join(ldir, "_last_checkpoint")
    if not os.path.exists(lc_path):
        return None
    with open(lc_path) as f:
        lc = json.load(f)
    v = int(lc["version"])
    # a V2 manifest is preferred when it coexists with a classic form
    # at the same version (the same order sources/delta_export's batch
    # loader uses)
    import re as _re

    v2_re = _re.compile(rf"^{v:020d}\.checkpoint\.([A-Za-z0-9_-]+)\.(json|parquet)$")
    v2_name = next(
        (n for n in sorted(os.listdir(ldir)) if v2_re.match(n)), None
    )
    if v2_name is not None:
        m = v2_re.match(v2_name)
        local = os.path.join(ldir, v2_name)
        if m.group(2) == "json":
            with open(local) as f:
                mrows = [json.loads(ln) for ln in f if ln.strip()]
        else:
            mrows = pq.read_table(local).to_pylist()
        rows: list[dict] = []
        for row in mrows:
            sc = row.get("sidecar")
            if sc and sc.get("path"):
                rel = unquote(sc["path"])
                # absolute = URI form too ('s3://…', 'file:/…'), same
                # test as the batch loader's _v2_checkpoint_rows
                if "://" in rel or rel.startswith("/"):
                    sp = rel
                else:
                    sp = os.path.join(ldir, "_sidecars", rel)
                rows.extend(pq.read_table(sp).to_pylist())
            else:
                rows.append(row)
        return rows, v
    if lc.get("parts"):
        n = int(lc["parts"])
        paths = [
            os.path.join(ldir, f"{v:020d}.checkpoint.{i:010d}.{n:010d}.parquet")
            for i in range(1, n + 1)
        ]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            # stale pointer / incomplete set: fall back to the JSON walk
            # (authoritative whenever the chain is complete); if the
            # walk is impossible, _replay_state raises its own
            # chain-does-not-start-at-0 error
            return None
        rows: list[dict] = []
        for p in paths:
            rows.extend(pq.read_table(p).to_pylist())
        return rows, v
    single = os.path.join(ldir, f"{v:020d}.checkpoint.parquet")
    if os.path.exists(single):
        return pq.read_table(single).to_pylist(), v
    return None  # pointer names a checkpoint that is gone: JSON walk


def _classic_checkpoint_state(table: str) -> tuple[dict, dict | None, int] | None:
    """Seed (live adds, latest metaData, checkpoint version) from the
    table's checkpoint — classic single/multi-part or V2
    manifest+sidecars (see :func:`_checkpoint_rows`); None when the log
    has no checkpoint (callers fall back to the full JSON walk)."""
    seeded = _checkpoint_rows(table)
    if seeded is None:
        return None
    rows, v = seeded
    live: dict[str, dict] = {}
    meta: dict | None = None
    for row in rows:
        add = row.get("add")
        if add and add.get("path"):
            live[unquote(add["path"])] = add
        md = row.get("metaData")
        if md and md.get("schemaString"):
            meta = md
        proto = row.get("protocol")
        if proto and proto.get("minReaderVersion"):
            _check_protocol(table, proto)
    return live, meta, v


def _check_protocol(table: str, proto: dict) -> None:
    rv = int(proto.get("minReaderVersion", 1))
    feats = set(proto.get("readerFeatures") or [])
    if rv > 3 or (feats - _SUPPORTED_READER_FEATURES):
        raise ValueError(
            f"foreign delta log at {table} requires reader version {rv} "
            f"with features {sorted(feats)}; this source supports reader "
            f"<= 3 with {sorted(_SUPPORTED_READER_FEATURES)}"
        )


def _as_dict(v) -> dict:
    """JSON commits carry maps as dicts; classic-checkpoint parquet maps
    decode via pyarrow as lists of (key, value) tuples or {key, value}
    structs — normalize all three."""
    if not v:
        return {}
    if isinstance(v, dict):
        return v
    out = {}
    for e in v:
        if isinstance(e, dict):
            out[e.get("key")] = e.get("value")
        else:
            k, val = e
            out[k] = val
    return out


def _column_mapping(table: str, meta: dict) -> dict[str, str]:
    """physical -> logical TOP-LEVEL name map for a column-mapped table
    (round 11): ``name``-mode FLAT mappings stream directly — data
    columns and partitionValues translate at the arrow/typing boundary.
    ``id`` mode and nested mappings stay honest refusals (the batch
    convert handles both; id resolution needs the footer verification
    only the convert performs)."""
    conf = _as_dict(meta.get("configuration"))
    mode = conf.get("delta.columnMapping.mode", "none")
    if mode in ("none", ""):
        return {}
    if mode != "name":
        raise ValueError(
            f"foreign delta table at {table} uses column mapping mode "
            f"{mode!r}; the streaming source translates 'name' mode only "
            "— convert the table (sources/delta_export."
            "convert_from_delta_log verifies and handles 'id' mode) and "
            "tail the snapshot source instead"
        )
    schema = json.loads(meta.get("schemaString") or '{"fields": []}')
    out: dict[str, str] = {}
    for f in schema.get("fields", []):
        md = f.get("metadata") or {}
        phys = md.get("delta.columnMapping.physicalName", f["name"])
        if phys != f["name"]:
            out[phys] = f["name"]
        if "delta.columnMapping.physicalName" in json.dumps(f.get("type")):
            raise ValueError(
                f"foreign delta table at {table} carries NESTED column-"
                "mapping physical names; the streaming source translates "
                "flat mappings only — convert the table and tail the "
                "snapshot source instead"
            )
    return out


def _replay_state(table: str, upto: int) -> tuple[dict, dict | None]:
    """(live add-actions by decoded path, latest metaData) through
    version ``upto``. Within one version removes apply FIRST, then adds
    — which makes DV swaps (remove(path, old dv) + add(path, new dv) in
    the same commit) land on the new descriptor regardless of action
    order, and is equivalent for well-formed logs that never add and
    remove the same unrelated file in one commit."""
    seeded = _classic_checkpoint_state(table)
    versions = _log_versions(table)
    # upto == -1 with NO commit JSONs is the tip sentinel of a
    # checkpoint-only log (cleanup removed every JSON): the checkpoint
    # IS the tip state, not a too-new seed
    tip_sentinel = upto == -1 and not versions
    if seeded is not None and seeded[2] > upto and not tip_sentinel:
        # exactly-once replay: a checkpoint written AFTER the offset
        # being reconstructed must not seed it — a restart replaying
        # the recorded initial-load offset {"version": V} would
        # otherwise deliver a LATER version's live set as V, double-
        # delivering files in the next batch (round-11 self-review).
        # Fall back to the authoritative JSON walk; if the early JSONs
        # are already cleaned up, refuse rather than lie.
        seeded = None
        if not versions or versions[0] != 0:
            raise ValueError(
                f"foreign delta log at {table}: cannot reconstruct "
                f"version {upto} — the checkpoint is newer and the JSON "
                "chain no longer starts at 0; restart the stream from a "
                "fresh checkpoint"
            )
    if seeded is not None:
        live, meta, cp_v = seeded
        live = dict(live)
        start = cp_v + 1
    else:
        live, meta = {}, None
        if not versions or versions[0] != 0:
            raise ValueError(
                f"foreign delta log at {table} has no readable "
                f"checkpoint and its JSON chain does not start at 0 "
                f"(earliest: {versions[0] if versions else 'none'}) — "
                "cannot reconstruct the initial state"
            )
        start = 0
    for v in range(start, upto + 1):
        adds_this: list[dict] = []
        for a in _commit_actions(table, v):
            if "protocol" in a:
                _check_protocol(table, a["protocol"])
            elif "metaData" in a:
                meta = a["metaData"]
            elif "remove" in a:
                live.pop(unquote(a["remove"]["path"]), None)
            elif "add" in a:
                adds_this.append(a["add"])
        for add in adds_this:
            live[unquote(add["path"])] = add
    return live, meta


def _latest_metadata(table: str) -> dict | None:
    """The log's LATEST metaData action without reconstructing any live
    state: scan commit JSONs backwards from the tip (metaData is almost
    always in version 0 or the most recent schema change, so this is
    O(1) commits in practice and never builds a file map), falling back
    to the checkpoint rows for checkpoint-only logs. Used for schema
    and column-mapping discovery — tail-only streams on truncated
    chains must not require full-state reconstruction (round-11
    self-review)."""
    for v in reversed(_log_versions(table)):
        md = None
        try:
            for a in _commit_actions(table, v):
                if "metaData" in a:
                    md = a["metaData"]
        except ValueError:
            continue
        if md is not None:
            return md
    seeded = _checkpoint_rows(table)
    if seeded is not None:
        md = None
        for row in seeded[0]:
            m = row.get("metaData")
            if m and m.get("schemaString"):
                md = m
        return md
    return None


def _typed_part_values(
    pvals: dict | None,
    spark_fields: dict[str, str],
    phys2log: dict[str, str] | None = None,
) -> list[tuple[str, object]]:
    """Delta add.partitionValues are strings (null = JSON null);
    convert to typed constants per the table schema so the arrow cast
    in read() is exact. Column-mapped tables key partitionValues
    PHYSICALLY — ``phys2log`` translates to the logical column first.
    Unsupported partition types refuse loudly."""
    import datetime

    out: list[tuple[str, object]] = []
    for col, raw in _as_dict(pvals).items():
        col = (phys2log or {}).get(col, col)
        typ = spark_fields.get(col)
        if raw is None:
            out.append((col, None))
        elif typ in ("string", "varchar"):
            out.append((col, raw))
        elif typ in ("int", "integer", "smallint", "tinyint", "bigint", "long"):
            out.append((col, int(raw)))
        elif typ in ("double", "float"):
            out.append((col, float(raw)))
        elif typ == "boolean":
            out.append((col, raw == "true"))
        elif typ == "date":
            out.append((col, datetime.date.fromisoformat(raw)))
        elif typ == "timestamp_ntz":
            # Delta serializes timestamp partition values as
            # 'yyyy-MM-dd HH:mm:ss[.S...]' (no zone); fromisoformat
            # accepts the space separator
            out.append((col, datetime.datetime.fromisoformat(raw)))
        elif typ == "timestamp":
            # with-timezone TIMESTAMP partition values are rendered in
            # the WRITER's session timezone, which the log does not
            # record — stamping the naive wall clock as UTC would shift
            # values for any non-UTC writer. Refuse rather than be
            # silently hours off (timestamp_ntz is unambiguous).
            raise ValueError(
                f"partition column {col!r} is a with-timezone TIMESTAMP; "
                "its string form is writer-session-zone-ambiguous — use "
                "the batch convert (which reads values from data), or a "
                "timestamp_ntz/date partition column"
            )
        else:
            raise ValueError(
                f"unsupported Delta partition column type {typ!r} for "
                f"{col!r} in the streaming source"
            )
    return out


def _decode_dv_local(table: str, dv: dict) -> list[int]:
    """Deletion-vector descriptor -> deleted row positions, pure local
    IO (executor-safe): inline ``i`` payloads decode from Z85, ``u``
    derives the .bin path from the Z85 UUID, ``p`` is absolute — the
    [size][data][crc32] framing and cardinality are verified. Mirrors
    sources/delta_export._decode_deletion_vector minus the JVM FS."""
    from azure_etl_spark.sources.roaring import (
        decode_inline_dv,
        deserialize_dv,
        dv_relative_path,
        read_dv_from_file_bytes,
    )

    st = dv.get("storageType")
    size = int(dv["sizeInBytes"])
    if st == "i":
        data = decode_inline_dv(dv["pathOrInlineDv"], size)
    elif st in ("u", "p"):
        if st == "u":
            abs_path = os.path.join(table, dv_relative_path(dv["pathOrInlineDv"]))
        else:
            abs_path = dv["pathOrInlineDv"]
        with open(abs_path, "rb") as f:
            raw = f.read()
        data = read_dv_from_file_bytes(raw, int(dv.get("offset") or 1), size)
    else:
        raise ValueError(f"unknown deletion vector storageType {st!r}")
    positions = deserialize_dv(data)
    card = int(dv.get("cardinality", len(positions)))
    if card != len(positions):
        raise ValueError(
            f"deletion vector cardinality mismatch: descriptor says "
            f"{card}, bitmap decodes {len(positions)}"
        )
    return positions


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        part_values: list[tuple[str, object]],
        dv: dict | None,
    ):
        self.abs_path = abs_path
        self.part_values = part_values
        self.dv = dv


class DeltaLogStreamReader(DataSourceStreamReader):
    """Same offset algebra as streaming/snapshot_source.
    SnapshotStreamReader (legacy complete form ``{"version": V}`` +
    paced partial form ``{"version": V, "pos": K, "init": B}``), with
    Delta log versions as the version axis and per-commit
    dataChange-add lists as the units."""

    def __init__(self, options, schema):
        self.table = options["path"]
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        mbt = options.get("maxbytespertrigger")
        self.max_bytes = int(mbt) if mbt is not None else None
        for name, val in (("maxfilespertrigger", self.max_files),
                          ("maxbytespertrigger", self.max_bytes)):
            if val is not None and val <= 0:
                # a zero/negative budget would admit nothing and stall
                # the stream forever — refuse at option parse time
                raise ValueError(f"{name} must be positive, got {val}")
        self.starting_version = options.get("startingversion")
        self.schema = schema
        self._fields = {f.name: f.dataType.simpleString() for f in schema.fields}
        self._last_end = None
        self._unit_cache: dict[tuple[int, bool], list] = {}
        # flat name-mode column mapping (physical parquet names ->
        # logical schema names), fixed for the table's lifetime
        # (physical names are immutable); {} for unmapped tables.
        # Computed once here so executors get it with the pickled
        # reader, and read() can resolve physical columns. Backwards
        # metaData scan, NOT a full replay: tail-only streams on
        # truncated chains must construct fine.
        meta = _latest_metadata(self.table)
        self._phys2log = _column_mapping(self.table, meta) if meta else {}

    # -- units ---------------------------------------------------------
    def _unit(self, v: int, init: bool) -> list[tuple[str, list, dict | None]]:
        """The (rel_path, typed partition values, dv descriptor) list a
        version contributes: the replayed live set for the initial
        snapshot load, else the commit's data-changing plain adds
        (append-only tail; change commits raise or skip per
        ignorechanges — decided here so pacing and planning agree)."""
        key = (v, init)
        if key in self._unit_cache:
            return self._unit_cache[key]
        if init:
            live, meta = _replay_state(self.table, v)
            if meta is not None:
                _column_mapping(self.table, meta)  # raises on id/nested
            unit = []
            for rel, a in sorted(live.items()):
                # checkpoint-seeded adds may carry an all-null DV struct
                dv = a.get("deletionVector")
                if dv and not dv.get("storageType"):
                    dv = None
                unit.append(
                    (rel,
                     _typed_part_values(a.get("partitionValues"),
                                        self._fields, self._phys2log),
                     dv,
                     int(a.get("size") or 0))
                )
        else:
            adds: list[dict] = []
            removes_dc = 0
            dv_adds = 0
            for a in _commit_actions(self.table, v):
                if "metaData" in a:
                    _column_mapping(self.table, a["metaData"])  # id/nested gate
                elif "remove" in a and a["remove"].get("dataChange", True):
                    removes_dc += 1
                elif "add" in a and a["add"].get("dataChange", False):
                    if a["add"].get("deletionVector"):
                        dv_adds += 1
                    else:
                        adds.append(a["add"])
            if (removes_dc or dv_adds) and not self.ignore_changes:
                raise ValueError(
                    f"delta stream source: commit v{v} at {self.table} "
                    f"{'attaches deletion vectors' if dv_adds else 'removes files'}"
                    "; an append-only tail cannot represent deletes — "
                    "restart from a fresh checkpoint, or set "
                    "ignorechanges=true to emit rewrite files / skip "
                    "DV-only commits (Delta's ignoreChanges caveats)"
                )
            unit = [
                (unquote(a["path"]),
                 _typed_part_values(a.get("partitionValues"),
                                    self._fields, self._phys2log),
                 None,
                 int(a.get("size") or 0))
                for a in sorted(adds, key=lambda a: a["path"])
            ]
        if len(self._unit_cache) > 8:
            self._unit_cache.clear()
        self._unit_cache[key] = unit
        return unit

    # -- offsets (same algebra as the snapshot source) -----------------
    def initialOffset(self):
        if self.starting_version is None:
            off = {"version": -1}
        elif str(self.starting_version).lower() == "latest":
            tip = _tip_version(self.table)
            off = {"version": tip if tip is not None else -1}
        else:
            n = int(self.starting_version)
            # startingversion=0 must WALK the commits from version 0
            # (Delta's startingVersion semantics), not collide with the
            # version:-1 initial-snapshot sentinel (round-11
            # self-review); the flag rides the offset so a restart
            # replays identically
            off = {"version": n - 1} if n >= 1 else {"version": -1, "walk": True}
        if self._last_end is None:
            self._last_end = off
        return off

    def latestOffset(self):
        latest = _tip_version(self.table)
        if latest is None:
            return {"version": -1}
        if (self.max_files is None and self.max_bytes is None) or (
            self._last_end is None
        ):
            off = {"version": latest}
            self._last_end = off
            return off
        st = self._last_end
        sv, spos, sinit = st["version"], st.get("pos"), st.get("init", False)
        units: list[tuple[int, bool]] = []
        if sv < 0:
            if st.get("walk"):
                units.extend((v, False) for v in range(0, latest + 1))
            else:
                units.append((latest, True))
        else:
            if spos is not None:
                units.append((sv, sinit))
            units.extend((v, False) for v in range(sv + 1, latest + 1))
        # admission control: files and/or bytes, whichever exhausts
        # first (bytes is a SOFT max — at least one file always admits,
        # Delta's maxBytesPerTrigger contract)
        budget_files = self.max_files if self.max_files is not None else float("inf")
        budget_bytes = self.max_bytes if self.max_bytes is not None else float("inf")
        end = st
        for i, (v, init) in enumerate(units):
            unit = self._unit(v, init)
            n = len(unit)
            pos = spos if (i == 0 and spos is not None) else 0
            while pos < n and budget_files > 0 and budget_bytes > 0:
                budget_files -= 1
                budget_bytes -= unit[pos][3]
                pos += 1
            end = (
                {"version": v}
                if pos >= n
                else {"version": v, "pos": pos, "init": init}
            )
            if budget_files <= 0 or budget_bytes <= 0:
                break
        self._last_end = end
        return end

    @staticmethod
    def _off_key(off: dict) -> tuple:
        pos = off.get("pos")
        return (off["version"], float("inf") if pos is None else pos)

    def commit(self, end):
        # forward-only resync, same contract as the snapshot source
        if self._last_end is None or self._off_key(end) > self._off_key(
            self._last_end
        ):
            self._last_end = end

    # -- planning -------------------------------------------------------
    def partitions(self, start, end):
        sv, spos = start["version"], start.get("pos")
        sinit = start.get("init", False)
        ev, epos = end["version"], end.get("pos")
        if ev < sv or (ev == sv and epos is None and spos is None):
            return []
        out: list[_DeltaFilePartition] = []

        def emit(unit, lo, hi):
            for rel, pvals, dv, _size in unit[lo:hi]:
                out.append(
                    _DeltaFilePartition(os.path.join(self.table, rel), pvals, dv)
                )

        if sv < 0:
            if start.get("walk"):
                # startingversion=0: deliver every commit as a tail unit
                for v in range(0, ev + 1):
                    unit = self._unit(v, False)
                    hi = epos if (v == ev and epos is not None) else len(unit)
                    emit(unit, 0, hi)
            else:
                unit = self._unit(ev, True)
                emit(unit, 0, epos if epos is not None else len(unit))
        else:
            if spos is not None:
                unit = self._unit(sv, sinit)
                hi = epos if (ev == sv and epos is not None) else len(unit)
                emit(unit, spos, hi)
            for v in range(sv + 1, ev + 1):
                unit = self._unit(v, False)
                hi = epos if (v == ev and epos is not None) else len(unit)
                emit(unit, 0, hi)
        return out

    # -- execution (executor-side, Arrow-vectorized) --------------------
    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        tbl = pq.read_table(partition.abs_path)
        if partition.dv:
            # the DV masks ORIGINAL physical row indexes; it applies to
            # the freshly-read table before anything else drops rows
            masked = set(_decode_dv_local(self.table, partition.dv))
            if masked:
                keep = [i not in masked for i in range(tbl.num_rows)]
                tbl = tbl.filter(pa.array(keep))
        n = tbl.num_rows
        consts = dict(partition.part_values)
        arrays = []
        log2phys = {x: p for p, x in self._phys2log.items()}
        for field in target:
            src_name = (
                field.name
                if field.name in tbl.column_names
                else log2phys.get(field.name)
            )
            if src_name in tbl.column_names:
                arrays.append(tbl.column(src_name).cast(field.type))
            elif field.name in consts:
                val = consts[field.name]
                if val is None:
                    arrays.append(pa.nulls(n, type=field.type))
                else:
                    arrays.append(pa.array([val] * n).cast(field.type))
            else:  # schema-evolved: file predates the column
                arrays.append(pa.nulls(n, type=field.type))
        yield from pa.table(arrays, schema=target).to_batches()


class DeltaLogTableSource(DataSource):
    """``spark.readStream.format("delta_log_table").option("path", p)``.

    Batch reads of a foreign Delta table go through
    ``sources/delta_export.convert_from_delta_log`` (O(metadata)
    migration to the snapshot format, then the JVM parquet scan with
    skipping); this source exists for the streaming tail, which needs
    the log's commit increments."""

    @classmethod
    def name(cls):
        return "delta_log_table"

    def schema(self):
        from pyspark.sql.types import StructType

        table = self.options["path"]
        meta = _latest_metadata(table)
        if meta is None or not meta.get("schemaString"):
            raise ValueError(
                f"delta log at {table} carries no readable metaData"
            )
        _column_mapping(table, meta)  # raises on id mode / nested names
        return StructType.fromJson(json.loads(meta["schemaString"]))

    def streamReader(self, schema):
        return DeltaLogStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(DeltaLogTableSource)
