"""Snapshot tables as a Structured Streaming SOURCE (the counterpart of
``streaming/sinks.snapshot_append_writer``): tail a versioned snapshot
table (sources/snapshot.py) commit-by-commit, emitting each commit's
newly added files as a micro-batch — Delta's streaming-source semantics
without delta-spark:

- offsets are manifest versions, so restart/replay is exactly-once by
  construction (the version walk between two offsets is deterministic);
- compaction commits (``operation='compact'``) are layout-only and emit
  nothing (Delta's ``dataChange=false``);
- a commit that REMOVES files (copy-on-write delete/update/merge) makes
  the append-only tail ill-defined: the source raises unless
  ``ignorechanges=true``, which then emits the commit's added (rewrite)
  files — re-delivering surviving rows of touched files, exactly the
  documented ``ignoreChanges`` caveat Delta has, for the same reason;
- a MERGE-ON-READ delete commit (``operation='delete_mor'`` /
  ``'delete_keys'``) removes no files but logically removes rows: the
  source raises the same error unless ``ignorechanges=true`` (which
  then emits nothing for that commit — rows already delivered stay
  delivered, the ignoreDeletes caveat);
- the first offset snapshots the table's CURRENT version as one initial
  load (all files) **with its merge-on-read delete entries applied**
  (pyarrow-side predicate filter / anti-join per file), so the initial
  load matches ``read_snapshot`` exactly; then it tails subsequent
  commits;
- ``startingversion`` (Delta's ``startingVersion``) skips the initial
  snapshot load: an integer tails from that commit on; ``latest``
  delivers only commits that land after the query starts;
- ``maxfilespertrigger`` / ``maxbytespertrigger`` (admission control,
  Delta's ``maxFilesPerTrigger``/``maxBytesPerTrigger`` — the byte cap
  is a soft max, at least one file per batch, sizes from one
  driver-side stat per candidate) cap what each micro-batch admits:
  offsets gain a sub-commit position (``{"version": V, "pos": K,
  "init": B}``) so a multi-file commit or a backlog of commits drains
  as bounded batches instead of one cluster-crushing batch. Caveat: the
  FIRST batch a reader instance plans is uncapped — the Python source
  API plans ``latestOffset`` before the reader can learn its position
  (from ``initialOffset`` or the checkpoint), and pacing from an
  assumed position would regress offsets and re-deliver files on
  restart. Delta makes the same trade after restart; once the first
  batch commits, every later trigger is paced. Old (complete-form)
  checkpoints keep working.

Implemented on the Spark 4 Python Data Source API
(``pyspark.sql.datasource``), like sources/pyds.py. Everything here is
plain-Python on purpose: offset planning reads manifest JSONs
driver-side, and each input partition is ONE parquet file read
executor-side via pyarrow and yielded as Arrow record batches (the
vectorized path — never row-at-a-time). File paths are handled with
``os``/``open`` (local/NFS); on an object store, swap ``_open``/
``_listdir`` for fsspec equivalents — the offset and partition logic is
storage-agnostic.

Schema notes: the declared schema is the manifest's recorded column
order. Hive partition columns (absent from the data files) are
reconstructed per file from the manifest's per-file stats (min==max for
a partition constant). Schema-evolved tables null-fill missing columns
per file, matching read_snapshot.
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

MANIFEST_DIR = "_manifest"
_REMOVING_OPS = ("delete", "update", "merge")


def _versions(table: str) -> list[int]:
    mdir = os.path.join(table, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    )


def _manifest(table: str, version: int) -> dict:
    # the commit protocol claims the manifest path before streaming its
    # JSON — retry the microsecond partial-read window (same contract as
    # sources/snapshot._load_manifest)
    import time

    p = os.path.join(table, MANIFEST_DIR, f"v{version}.json")
    for _ in range(40):
        with open(p) as f:
            raw = f.read()
        if raw:
            try:
                m = json.loads(raw)
            except json.JSONDecodeError:
                pass
            else:
                # two-level log: fold stats sidecars/checkpoints into the
                # inline map so downstream per-file lookups are uniform
                if m.get("stats_refs"):
                    m["stats"] = {
                        **_effective_ref_stats(table, m["stats_refs"]),
                        **m.get("stats", {}),
                    }
                return m
        time.sleep(0.05)
    raise ValueError(f"manifest v{version} under {table} unreadable after retries")


def _effective_ref_stats(table: str, refs: list[str]) -> dict:
    out: dict = {}
    for name in refs:
        p = os.path.join(table, MANIFEST_DIR, name)
        if name.endswith(".parquet"):
            import pyarrow.parquet as pq

            t = pq.read_table(p)
            for f, rows, mn, mx, bl in zip(
                t["file"].to_pylist(), t["rows"].to_pylist(),
                t["min"].to_pylist(), t["max"].to_pylist(),
                t["bloom"].to_pylist(),
            ):
                st = {"rows": rows, "min": json.loads(mn), "max": json.loads(mx)}
                if bl is not None:
                    st["bloom"] = json.loads(bl)
                out[f] = st
        else:
            with open(p) as fh:
                out.update(json.load(fh))
    return out


def _manifest_files(table: str, m: dict) -> list[str]:
    # explicit data_files are manifest (URI-encoded) names; this
    # source works in LITERAL names throughout (its file lists come
    # from directory walks), so decode at the boundary
    files = [unquote(f) for f in m.get("data_files", [])]
    for d in m["data_dirs"]:
        base = os.path.join(table, d)
        for dirpath, _dirs, names in os.walk(base):
            for n in names:
                if n.endswith(".parquet") and not n.startswith(("_", ".")):
                    rel = os.path.relpath(os.path.join(dirpath, n), table)
                    files.append(rel)
    return sorted(files)


def _partition_constants(m: dict, rel_file: str) -> list[tuple[str, object]]:
    """Hive partition column values for one file, from per-file stats
    (a partition column is constant per file: min == max)."""
    part_cols = m.get("partition_by", [])
    if not part_cols:
        return []
    stats = m.get("stats", {})
    st = stats.get(rel_file)
    if st is None:  # stats keys are URI-encoded; rel_file is literal
        st = next(
            (v for k, v in stats.items() if unquote(k) == rel_file), None
        )
    out = []
    for c in part_cols:
        if st and c in st.get("min", {}) and st["min"][c] == st["max"][c]:
            out.append((c, st["min"][c]))
        else:
            raise ValueError(
                f"cannot reconstruct partition column {c!r} for {rel_file!r}: "
                "no per-file stats (write with collect_stats=True)"
            )
    return out


def _file_delete_entries(
    table: str, m: dict, rel_file: str, cov_cache: dict[int, set] | None = None
) -> list[dict]:
    """Merge-on-read delete entries covering one file, with equality-
    delete key paths made absolute for the executor-side read.
    ``rel_file`` is a LITERAL FS name (this source walks directories)
    while entry file lists keep the manifest's URI-encoded form —
    match through unquote. ``cov_cache`` (id(entry) -> decoded coverage
    set) keeps planning O(files), not O(files^2); it lives OUTSIDE the
    manifest — a per-planning-pass dict owned by the caller — so entry
    dicts stay pristine for json serialization and equality comparison
    (round-10 ADVICE: the old version stashed the set on the entry
    itself). Position sidecars store literal names, so positional
    entries get ``rel_file`` as-is."""
    out = []
    if cov_cache is None:
        cov_cache = {}
    for e in m.get("deletes", []):
        lit_files = cov_cache.get(id(e))
        if lit_files is None:
            lit_files = {unquote(x) for x in e.get("files", [])}
            cov_cache[id(e)] = lit_files
        if rel_file not in lit_files:
            continue
        if "keys_dir" in e:
            out.append(
                {"keys_path": os.path.join(table, e["keys_dir"]),
                 "key_cols": list(e["key_cols"])}
            )
        elif "positions_dir" in e:
            out.append(
                {"positions_path": os.path.join(table, e["positions_dir"]),
                 "rel_file": rel_file}
            )
        else:
            out.append({"predicate": [list(p) for p in e["predicate"]]})
    # positional entries mask physical row indexes, so they must apply
    # before any entry that drops rows (delete entries commute as sets,
    # making the reorder exact)
    out.sort(key=lambda e: 0 if "positions_path" in e else 1)
    return out


class _SnapshotFilePartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        part_values: list[tuple[str, object]],
        deletes: list[dict] | None = None,
        match_entry: dict | None = None,
    ):
        self.abs_path = abs_path
        self.part_values = part_values
        self.deletes = deletes or []
        # CDF entry-diff partitions: after `deletes` establishes the
        # visible base, keep ONLY rows this entry covers (the streaming
        # twin of sources/snapshot._match_delete_entry)
        self.match_entry = match_entry


def _entry_exec_form(table: str, entry: dict, rel_file: str) -> dict:
    """ONE manifest delete entry -> the executor-side form
    (_file_delete_entries' per-entry conversion, without the coverage
    filter — the caller already knows the entry covers ``rel_file``)."""
    if "keys_dir" in entry:
        return {"keys_path": os.path.join(table, entry["keys_dir"]),
                "key_cols": list(entry["key_cols"])}
    if "positions_dir" in entry:
        return {"positions_path": os.path.join(table, entry["positions_dir"]),
                "rel_file": rel_file}
    return {"predicate": [list(p) for p in entry["predicate"]]}


def _apply_position_mask_arrow(tbl, entries: list[dict]):
    """Apply ALL positional delete entries covering one file to the
    freshly-read pyarrow Table as a single mask over the ORIGINAL
    physical row indexes (the caller runs this before any row-dropping
    entry shifts positions; several entries' position sets union)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    masked: set[int] = set()
    for entry in entries:
        masked.update(
            pq.read_table(
                entry["positions_path"],
                filters=[("file", "=", entry["rel_file"])],
                columns=["pos"],
            )["pos"].to_pylist()
        )
    if not masked:
        return tbl
    keep = [True] * tbl.num_rows
    for p in masked:
        if 0 <= p < tbl.num_rows:
            keep[p] = False
    return tbl.filter(pa.array(keep))


def _apply_delete_arrow(tbl, entry: dict):
    """Apply one merge-on-read delete entry to a pyarrow Table — the
    executor-side mirror of sources/snapshot._apply_delete_entry:
    predicate entries drop matching rows via a compute filter, equality
    deletes LEFT ANTI join the (small) key file. Positional entries go
    through _apply_position_mask_arrow instead (all of a file's
    position sets mask the original indexes together, first)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if "predicate" in entry:
        cond = _predicate_cond(tbl, entry["predicate"])
        # drop matching rows; a null comparison is not a match (keep)
        return tbl.filter(~cond | cond.is_null())
    keys = pq.read_table(entry["keys_path"], columns=entry["key_cols"])
    keys = keys.group_by(entry["key_cols"]).aggregate([])  # distinct
    return tbl.join(keys, keys=entry["key_cols"], join_type="left anti")


def _predicate_cond(tbl, preds):
    """Structured predicate tuples -> one pyarrow compute expression
    (shared by the apply and match paths)."""
    import pyarrow.compute as pc

    cond = None
    for col, op, val in preds:
        f = pc.field(col)
        typ = tbl.schema.field(col).type
        if op == "between":
            lo, hi = (_arrow_scalar(v, typ) for v in val)
            part = (f >= lo) & (f <= hi)
        else:
            v = _arrow_scalar(val, typ)
            part = {
                "=": f == v, "<": f < v, "<=": f <= v,
                ">": f > v, ">=": f >= v,
            }[op]
        cond = part if cond is None else cond & part
    return cond


_CDF_POS_COL = "__cdf_orig_pos"


def _match_delete_arrow(tbl, entry: dict):
    """Rows one merge-on-read delete entry COVERS — the inverse of
    :func:`_apply_delete_arrow` and the executor-side mirror of
    sources/snapshot._match_delete_entry: predicate entries filter TO
    matching rows (nulls are non-matches, SQL WHERE semantics),
    equality entries LEFT SEMI join the key file, positional entries
    keep rows whose ORIGINAL physical index (carried in
    ``_CDF_POS_COL``, attached before any row-dropping mask) is in the
    entry's position set for this file."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if "predicate" in entry:
        cond = _predicate_cond(tbl, entry["predicate"])
        return tbl.filter(cond & cond.is_valid())
    if "positions_path" in entry:
        positions = pq.read_table(
            entry["positions_path"],
            filters=[("file", "=", entry["rel_file"])],
            columns=["pos"],
        )["pos"]
        return tbl.filter(
            pc.is_in(tbl[_CDF_POS_COL],
                     value_set=positions.combine_chunks().cast(pa.int64()))
        )
    keys = pq.read_table(entry["keys_path"], columns=entry["key_cols"])
    keys = keys.group_by(entry["key_cols"]).aggregate([])
    return tbl.join(keys, keys=entry["key_cols"], join_type="left semi")


def _arrow_scalar(val, typ):
    import pyarrow as pa

    s = pa.scalar(val)
    try:
        return s.cast(typ)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return s


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table = options["path"]
        self.ignore_changes = str(options.get("ignorechanges", "false")).lower() == "true"
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        mbt = options.get("maxbytespertrigger")
        self.max_bytes = int(mbt) if mbt is not None else None
        for name, val in (("maxfilespertrigger", self.max_files),
                          ("maxbytespertrigger", self.max_bytes)):
            if val is not None and val <= 0:
                # a zero/negative budget would admit nothing and stall
                # the stream forever (availableNow would terminate
                # "successfully" with data undelivered) — refuse at
                # option parse time, as Delta does
                raise ValueError(f"{name} must be positive, got {val}")
        self.starting_version = options.get("startingversion")  # int | "latest" | None
        self.starting_timestamp = options.get("startingtimestamp")
        if self.starting_version is not None and self.starting_timestamp is not None:
            # Delta's own rule: the two options are mutually exclusive
            raise ValueError(
                "specify either startingversion or startingtimestamp, not both"
            )
        if self.starting_timestamp is not None:
            from .delta_source import _parse_ts_ms

            self._starting_ts_ms = _parse_ts_ms(
                self.starting_timestamp, "startingtimestamp"
            )
        # readchangefeed=true (round 12): emit CHANGE rows instead of
        # snapshot rows — the streaming twin of
        # sources/snapshot.snapshot_changes, at the same file
        # granularity: added files -> inserts, removed files -> deletes
        # (each side read under ITS manifest's merge-on-read entries),
        # merge-on-read entry diffs on carried files -> the rows
        # entering/leaving (computed per entry exactly as the batch
        # reader does); compaction is invisible. The initial snapshot
        # (no startingversion) serves the live rows as inserts at tip.
        self.read_change_feed = (
            str(options.get("readchangefeed", "false")).lower() == "true"
        )
        self._cdf_cache: dict[tuple[int, bool], list] = {}
        self.columns = [f.name for f in schema.fields]
        self.schema = schema
        self._last_end = None  # last end offset this instance planned

    def _cdf_unit(self, v: int, init: bool) -> list[dict]:
        """CDF partition specs one version contributes, in a
        deterministic order (offsets slice this list by position):
        the live set as inserts for the initial load; else inserts
        (new files), deletes (removed files, read under the PREVIOUS
        manifest), then merge-on-read entry diffs on carried files —
        per (prev-coverage, cur-coverage) group and per entry in
        order, mirroring sources/snapshot._mor_entry_changes
        row-for-row. Compaction contributes nothing."""
        import datetime

        key = (v, init)
        if key in self._cdf_cache:
            return self._cdf_cache[key]
        m = _manifest(self.table, v)
        ts = datetime.datetime.fromtimestamp(
            float(m.get("committed_at_unix") or 0), datetime.timezone.utc
        )

        def consts(ct: str) -> list[tuple[str, object]]:
            return [("_change_type", ct), ("_commit_version", v),
                    ("_commit_timestamp", ts)]

        specs: list[dict] = []
        if init:
            cov: dict[int, set] = {}
            for f in _manifest_files(self.table, m):
                specs.append({
                    "file": f,
                    "pv": _partition_constants(m, f) + consts("insert"),
                    "deletes": _file_delete_entries(self.table, m, f, cov),
                    "match": None,
                })
        elif m.get("operation") != "compact":
            if v == 0:
                prev_m, prev_files = None, set()
            else:
                prev_m = _manifest(self.table, v - 1)
                prev_files = set(_manifest_files(self.table, prev_m))
            cur_files = set(_manifest_files(self.table, m))
            cov_cur: dict[int, set] = {}
            cov_prev: dict[int, set] = {}
            for f in sorted(cur_files - prev_files):
                specs.append({
                    "file": f,
                    "pv": _partition_constants(m, f) + consts("insert"),
                    "deletes": _file_delete_entries(self.table, m, f, cov_cur),
                    "match": None,
                })
            for f in sorted(prev_files - cur_files):
                specs.append({
                    "file": f,
                    "pv": _partition_constants(prev_m, f) + consts("delete"),
                    "deletes": _file_delete_entries(
                        self.table, prev_m, f, cov_prev
                    ),
                    "match": None,
                })
            prev_entries = {e["id"]: e
                            for e in (prev_m or {}).get("deletes", [])}
            cur_entries = {e["id"]: e for e in m.get("deletes", [])}
            prev_cov = {i: {unquote(x) for x in e.get("files", [])}
                        for i, e in prev_entries.items()}
            cur_cov = {i: {unquote(x) for x in e.get("files", [])}
                       for i, e in cur_entries.items()}
            groups: dict[tuple, list[str]] = {}
            for f in sorted(prev_files & cur_files):
                p = tuple(sorted(i for i, fl in prev_cov.items() if f in fl))
                c = tuple(sorted(i for i, fl in cur_cov.items() if f in fl))
                if p != c:
                    groups.setdefault((p, c), []).append(f)
            for (p, c), files in sorted(groups.items()):
                added = [i for i in c if i not in p]
                removed = [i for i in p if i not in c]
                for f in files:
                    if added:
                        # rows visible at prev that each NEW entry
                        # covers, entries applied cumulatively in order
                        base = [_entry_exec_form(self.table,
                                                 prev_entries[i], f)
                                for i in p]
                        for j, i in enumerate(added):
                            specs.append({
                                "file": f,
                                "pv": _partition_constants(m, f)
                                + consts("delete"),
                                "deletes": base + [
                                    _entry_exec_form(self.table,
                                                     cur_entries[x], f)
                                    for x in added[:j]
                                ],
                                "match": _entry_exec_form(
                                    self.table, cur_entries[i], f
                                ),
                            })
                    if removed:
                        # rows visible at cur that each VANISHED entry
                        # had hidden (restore un-delete)
                        base = [_entry_exec_form(self.table,
                                                 cur_entries[i], f)
                                for i in c]
                        for j, i in enumerate(removed):
                            specs.append({
                                "file": f,
                                "pv": _partition_constants(m, f)
                                + consts("insert"),
                                "deletes": base + [
                                    _entry_exec_form(self.table,
                                                     prev_entries[x], f)
                                    for x in removed[:j]
                                ],
                                "match": _entry_exec_form(
                                    self.table, prev_entries[i], f
                                ),
                            })
        if len(self._cdf_cache) > 8:
            self._cdf_cache.clear()
        self._cdf_cache[key] = specs
        return specs

    # -- offsets ------------------------------------------------------
    # An offset is either the legacy complete form {"version": V}
    # ("everything through commit V consumed") or the partial form
    # {"version": V, "pos": K, "init": B} — the first K files of V's
    # sorted *unit* consumed, where the unit is the full manifest file
    # list when B (the initial snapshot load) or commit V's added files
    # otherwise. maxFilesPerTrigger caps how far latestOffset advances
    # per trigger by walking units file-by-file; old checkpoints (all
    # complete-form) keep working unchanged.

    def initialOffset(self):
        # version -1 = "nothing seen": the first batch loads the whole
        # current version, then the tail follows commits. With
        # ``startingversion`` (Delta's startingVersion) the initial
        # snapshot load is skipped: N means "deliver commits from
        # version N on", "latest" means "only commits after now".
        # Spark may call latestOffset BEFORE initialOffset on a fresh
        # query — never clobber a position latestOffset already planned
        # past, or pacing would regress and re-deliver files.
        if self.starting_timestamp is not None:
            off = self._resolve_starting_ts()
        elif self.starting_version is None:
            off = {"version": -1}
        elif str(self.starting_version).lower() == "latest":
            vs = _versions(self.table)
            off = {"version": vs[-1] if vs else -1}
        else:
            n = int(self.starting_version)
            # startingversion=0 walks the commits from version 0 — it
            # must not collide with the version:-1 initial-snapshot
            # sentinel (round-11 self-review); the flag rides the
            # offset so restarts replay identically
            off = {"version": n - 1} if n >= 1 else {"version": -1, "walk": True}
        if self._last_end is None:
            self._last_end = off
        return off

    def _resolve_starting_ts(self) -> dict:
        """Delta's startingTimestamp semantics over the manifest chain
        (round 12, VERDICT r11 #7): commits stamped at or after the
        timestamp replay, from the earliest such version; a timestamp
        past the tip tails only future commits; one older than the
        surviving chain (vacuumed predecessors) refuses rather than
        silently under-delivers. Manifest ``committed_at_unix`` is the
        version clock — non-decreasing by the commit protocol."""
        vs = _versions(self.table)
        if not vs:
            raise ValueError(
                f"startingtimestamp on {self.table}: no manifest versions "
                "to resolve a timestamp against"
            )
        ts = self._starting_ts_ms / 1000.0

        def _at(v: int) -> float:
            return float(_manifest(self.table, v).get("committed_at_unix") or 0)

        lo, hi = 0, len(vs)
        while lo < hi:
            mid = (lo + hi) // 2
            if _at(vs[mid]) < ts:
                lo = mid + 1
            else:
                hi = mid
        if lo == len(vs):
            return {"version": vs[-1]}  # after the tip: future commits only
        start_v = vs[lo]
        if start_v == vs[0] and vs[0] != 0 and _at(vs[0]) >= ts:
            raise ValueError(
                f"startingtimestamp on {self.table}: the manifest chain "
                f"starts at v{vs[0]} (older versions vacuumed); cannot "
                "replay changes from the requested timestamp"
            )
        return (
            {"version": -1, "walk": True}
            if start_v == 0
            else {"version": start_v - 1}
        )

    def _unit_file_list(
        self, v: int, init: bool, prev_files: set | None
    ) -> list[str]:
        m = _manifest(self.table, v)
        cur = _manifest_files(self.table, m)
        if init:
            return cur
        if m.get("operation") == "compact":
            return []
        return sorted(set(cur) - (prev_files or set()))

    def latestOffset(self):
        vs = _versions(self.table)
        if not vs:
            # a transiently-unlistable manifest (object-store listing
            # hiccup, table mid-replace) must never send the stream
            # BACKWARDS to the initial-snapshot sentinel — that would
            # re-deliver the whole table on the next tick (round-12
            # fix). Report no new data instead.
            return self._last_end if self._last_end is not None else {"version": -1}
        latest = vs[-1]
        if (self.max_files is None and self.max_bytes is None) or (
            self._last_end is None
        ):
            # no cap — or a reader whose position only the checkpoint
            # knows (fresh start or restart, depending on whether Spark
            # called initialOffset yet): plan to the tip. One uncapped
            # batch, then pacing engages — the admission-control trade
            # Delta's maxFilesPerTrigger also makes after restart.
            off = {"version": latest}
            if self._last_end is not None and self._off_key(off) < self._off_key(
                self._last_end
            ):
                return self._last_end  # tip transiently behind: hold position
            self._last_end = off
            return off
        st = self._last_end
        sv, spos, sinit = st["version"], st.get("pos"), st.get("init", False)
        # units still (partially) unconsumed, in order
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
        # matching Delta's maxBytesPerTrigger); file sizes come from
        # one driver-side stat per candidate file, only when a byte
        # budget is set
        budget_files = self.max_files if self.max_files is not None else float("inf")
        budget_bytes = self.max_bytes if self.max_bytes is not None else float("inf")
        end = st
        prev_files: set | None = None
        for i, (v, init) in enumerate(units):
            if self.read_change_feed:
                files = [s["file"] for s in self._cdf_unit(v, init)]
            else:
                if not init and prev_files is None and v > 0:
                    prev_files = set(
                        _manifest_files(self.table, _manifest(self.table, v - 1))
                    )
                files = self._unit_file_list(v, init, prev_files)
            n = len(files)
            pos = spos if (i == 0 and spos is not None) else 0
            while pos < n and budget_files > 0 and budget_bytes > 0:
                budget_files -= 1
                if self.max_bytes is not None:
                    try:
                        budget_bytes -= os.path.getsize(
                            os.path.join(self.table, files[pos])
                        )
                    except OSError:
                        pass  # racing writer; admit and let read() retry
                pos += 1
            end = (
                {"version": v}
                if pos >= n
                else {"version": v, "pos": pos, "init": init}
            )
            if budget_files <= 0 or budget_bytes <= 0:
                break
            prev_files = set(
                _manifest_files(self.table, _manifest(self.table, v))
            )
        self._last_end = end
        return end

    @staticmethod
    def _off_key(off: dict) -> tuple:
        # complete-form {"version": V} sorts after any partial position
        # within V
        pos = off.get("pos")
        return (off["version"], float("inf") if pos is None else pos)

    def commit(self, end):
        # defensive resync from a completed batch — FORWARD-only: this
        # callback can arrive after latestOffset already planned the
        # next batch, and regressing the position would make the source
        # report "caught up" with a backlog still pending (dropping it
        # under processAllAvailable) or re-deliver files
        if self._last_end is None or self._off_key(end) > self._off_key(self._last_end):
            self._last_end = end

    # -- planning (driver-side) --------------------------------------
    def _cdf_partitions(self, start, end):
        """CDF planning: the same offset algebra as the snapshot path,
        over _cdf_unit spec lists (no append-only checks — changes ARE
        the product)."""
        sv, spos = start["version"], start.get("pos")
        sinit = start.get("init", False)
        ev, epos = end["version"], end.get("pos")
        if ev < sv or (ev == sv and epos is None and spos is None):
            return []
        out: list[_SnapshotFilePartition] = []

        def emit(specs, lo, hi):
            for s in specs[lo:hi]:
                out.append(_SnapshotFilePartition(
                    os.path.join(self.table, s["file"]),
                    s["pv"], s["deletes"], s["match"],
                ))

        if sv < 0 and not start.get("walk"):
            specs = self._cdf_unit(ev, True)
            emit(specs, 0, epos if epos is not None else len(specs))
            return out
        if spos is not None and sv >= 0:
            specs = self._cdf_unit(sv, sinit)
            hi = epos if (ev == sv and epos is not None) else len(specs)
            emit(specs, spos, hi)
        for v in range(max(sv + 1, 0), ev + 1):
            specs = self._cdf_unit(v, False)
            hi = epos if (v == ev and epos is not None) else len(specs)
            emit(specs, 0, hi)
        return out

    def partitions(self, start, end):
        if self.read_change_feed:
            return self._cdf_partitions(start, end)
        sv, spos, sinit = start["version"], start.get("pos"), start.get("init", False)
        ev, epos = end["version"], end.get("pos")
        if ev < sv or (ev == sv and epos is None and spos is None):
            return []
        added: list[tuple[str, list, list]] = []

        def emit(m, files, lo, hi):
            # one coverage cache PER MANIFEST: keyed by id(entry), which
            # is only stable while the owning manifest dict is alive —
            # a pass-wide cache could alias a freed entry's address to a
            # later version's new entry (round-11 self-review)
            cov_cache: dict[int, set] = {}
            for f in files[lo:hi]:
                added.append(
                    (f, _partition_constants(m, f),
                     _file_delete_entries(self.table, m, f, cov_cache))
                )

        if sv < 0 and not start.get("walk"):
            # initial snapshot load of the end offset's version,
            # possibly rate-limit-sliced
            m = _manifest(self.table, ev)
            files = _manifest_files(self.table, m)
            emit(m, files, 0, epos if epos is not None else len(files))
        else:
            if spos is not None and sv >= 0:
                # finish (or continue) the partially-consumed unit; the
                # append-only checks for this commit ran when its first
                # slice was planned
                m = _manifest(self.table, sv)
                cur = _manifest_files(self.table, m)
                if sinit:
                    files = cur
                else:
                    # v0 (startingversion=0 walk) has no predecessor
                    prevf = (
                        set()
                        if sv == 0
                        else set(
                            _manifest_files(
                                self.table, _manifest(self.table, sv - 1)
                            )
                        )
                    )
                    files = sorted(set(cur) - prevf)
                hi = epos if (ev == sv and epos is not None) else len(files)
                emit(m, files, spos, hi)
            if ev > sv:
                if sv < 0:  # startingversion=0 walk: no predecessor
                    prev, prev_ids = set(), set()
                else:
                    prev_m = _manifest(self.table, sv)
                    prev = set(_manifest_files(self.table, prev_m))
                    prev_ids = {e["id"] for e in prev_m.get("deletes", [])}
                for v in range(max(sv + 1, 0), ev + 1):
                    m = _manifest(self.table, v)
                    cur = set(_manifest_files(self.table, m))
                    cur_ids = {e["id"] for e in m.get("deletes", [])}
                    if m.get("operation") == "compact":
                        prev, prev_ids = cur, cur_ids  # layout-only
                        continue
                    if (prev - cur) and not self.ignore_changes:
                        raise ValueError(
                            f"snapshot stream source: commit v{v} removes files "
                            f"(operation={m.get('operation', m['mode'])!r}); an "
                            "append-only tail cannot represent deletes — restart "
                            "from a fresh checkpoint, or set ignorechanges=true "
                            "to emit rewrite files (may re-deliver surviving "
                            "rows, as Delta's ignoreChanges does)"
                        )
                    if (cur_ids - prev_ids) and not self.ignore_changes:
                        raise ValueError(
                            f"snapshot stream source: commit v{v} adds merge-on-"
                            f"read delete entries (operation="
                            f"{m.get('operation', m['mode'])!r}); an append-only "
                            "tail cannot represent row deletes — restart from a "
                            "fresh checkpoint, or set ignorechanges=true to skip "
                            "them (already-delivered rows stay delivered)"
                        )
                    files = sorted(cur - prev)
                    hi = epos if (v == ev and epos is not None) else len(files)
                    emit(m, files, 0, hi)
                    prev, prev_ids = cur, cur_ids
        return [
            _SnapshotFilePartition(os.path.join(self.table, f), pv, des)
            for f, pv, des in added
        ]

    # -- execution (executor-side, Arrow-vectorized) ------------------
    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        tbl = pq.read_table(partition.abs_path)
        match = getattr(partition, "match_entry", None)
        if match is not None and "positions_path" in match:
            # a positional MATCH addresses ORIGINAL physical indexes;
            # carry them through the row-dropping applies below
            tbl = tbl.append_column(
                _CDF_POS_COL, pa.array(range(tbl.num_rows), type=pa.int64())
            )
        # ALL positional entries must mask against the ORIGINAL physical
        # row indexes — applying them one at a time would let the first
        # filter shift the indexes the second one addresses — so their
        # position sets union into one mask applied first (deletes
        # commute as sets, making the merge exact)
        pos_entries = [e for e in partition.deletes if "positions_path" in e]
        if pos_entries:
            tbl = _apply_position_mask_arrow(tbl, pos_entries)
        for entry in partition.deletes:
            if "positions_path" in entry:
                continue
            tbl = _apply_delete_arrow(tbl, entry)
        if match is not None:
            tbl = _match_delete_arrow(tbl, match)
            if _CDF_POS_COL in tbl.column_names:
                tbl = tbl.drop_columns([_CDF_POS_COL])
        n = tbl.num_rows
        consts = dict(partition.part_values)
        arrays = []
        for field in target:
            if field.name in tbl.column_names:
                arrays.append(tbl.column(field.name).cast(field.type))
            elif field.name in consts:
                arrays.append(pa.array([consts[field.name]] * n).cast(field.type))
            else:  # schema-evolved: file predates the column
                arrays.append(pa.nulls(n, type=field.type))
        out = pa.table(arrays, schema=target)
        yield from out.to_batches()


class SnapshotTableSource(DataSource):
    """``spark.readStream.format("snapshot_table").option("path", p)``.

    Batch reads should use ``sources.snapshot.read_snapshot`` (JVM
    parquet scan with file skipping); this source exists for the
    streaming tail, which the JVM reader cannot express.
    """

    @classmethod
    def name(cls):
        return "snapshot_table"

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        table = self.options["path"]
        vs = _versions(table)
        if not vs:
            raise ValueError(f"no committed snapshot versions under {table}")
        m = _manifest(table, vs[-1])
        files = _manifest_files(table, m)
        if not files:
            raise ValueError(f"snapshot table {table} lists no data files")
        file_schema = pq.read_schema(os.path.join(table, files[0]))
        part_cols = dict(_partition_constants(m, files[0]))
        fields = {f.name: f for f in file_schema}
        ordered = []
        for c in m.get("columns", list(fields)):
            if c in fields:
                ordered.append(fields[c])
            elif c in part_cols:
                ordered.append(pa.field(c, pa.scalar(part_cols[c]).type))
            else:  # evolved column absent from this particular file
                ordered.append(pa.field(c, pa.string()))
        st = from_arrow_schema(pa.schema(ordered))
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            from pyspark.sql.types import (
                IntegerType,
                StringType,
                TimestampType,
            )

            # _commit_version is INT to match the batch feed
            # (snapshot_changes casts to int) so batch-vs-stream
            # parity is column-exact
            st = (
                st.add("_change_type", StringType())
                .add("_commit_version", IntegerType())
                .add("_commit_timestamp", TimestampType())
            )
        return st

    def streamReader(self, schema):
        return SnapshotStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(SnapshotTableSource)
