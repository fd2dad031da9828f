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
  the manifest exists, so readers can never observe a partial version.
- Every write attempt lands in its own ATTEMPT-UNIQUE data dir
  (``data/v{N}-{token}``) — two writers racing the same version number
  can never touch each other's files (a shared ``data/v{N}`` dir would
  let the race loser's overwrite clobber the winner's already-committed
  data). Crashed or race-losing attempts leave orphan dirs no manifest
  references; ``vacuum`` reclaims them.
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
- **Merge-on-read deletes** (:func:`delete_from_snapshot` with
  ``mode='merge_on_read'``, :func:`delete_keys_from_snapshot`): the
  Iceberg-style alternative to copy-on-write. The commit records a
  *delete entry* in the manifest — a predicate, or a parquet file of
  key tuples (equality deletes, the GDPR shape) — scoped to exactly
  the files whose stats say they may contain matches. No data is
  rewritten: at 100 TB, deleting a handful of rows costs O(manifest)
  (predicate) or O(keys written) instead of rewriting every touched
  multi-GB file. Readers apply the entries on the fly (filter /
  anti-join per affected file group); :func:`compact_snapshot` and any
  copy-on-write commit *materialize* them for the files they rewrite,
  so OPTIMIZE doubles as the deferred rewrite. The change feed emits
  the logically deleted rows at the delete commit, and the streaming
  source treats a merge-on-read delete like any non-append commit
  (error unless ``ignorechanges``).

Scale notes (round-6 two-level log): per-file stats do NOT live inline
in the manifest — each commit writes its own immutable stats SIDECAR
(``_manifest/stats-*.json``, O(commit's files)) and the manifest carries
only the sidecar names (``stats_refs``), so commit serialization cost is
O(commit), not O(table). Every ``_STATS_CHECKPOINT_EVERY`` commits the
sidecar chain compacts into one parquet CHECKPOINT pruned to live files
(``stats-ckpt-*.parquet`` — the Delta-checkpoint / Iceberg-manifest-list
design), bounding both the ref chain and stale-entry garbage; amortized
commit cost stays flat as the table grows (measured:
``tools/snapshot_commit_probe.py``). Vacuum bounds retained versions and
reclaims unreferenced sidecars. All filesystem access goes through the
Hadoop FS API, so the same code runs on HDFS/ABFS/S3A, where
``create(overwrite=false)`` is the documented atomic primitive.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import re
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"
DELETES_DIR = "deletes"  # parquet key files for merge-on-read equality deletes

# data dirs are attempt-unique (data/vN-token); bare data/vN accepted
# for tables written before the suffix existed
# committed dirs are data/vN-hex; write-audit-publish stages land in
# data/stage-hex until published (round 8) — both resolve as base dirs
_DATA_V_RE = re.compile(rf"^({DATA_DIR}/(?:v\d+|stage)(?:-[0-9a-f]+)?)/")

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


class SnapshotConstraintError(ValueError):
    """A write contained rows violating the table's constraints."""


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
    # the commit protocol atomically CLAIMS the manifest path first and
    # streams the JSON right after — a reader racing that microsecond
    # window sees an empty/partial file, or (on checksummed filesystems
    # like Hadoop's LocalFS wrapper) a ChecksumException/EOFException
    # because the .crc trailer lags the data bytes mid-publish; retry
    # briefly before treating it as corruption (a crashed claimer never
    # publishes content, so the final raise is the honest outcome
    # there). Only the transient signatures retry — anything else
    # (permissions, connectivity) propagates immediately.
    last = b""
    last_err: Exception | None = None
    for _ in range(40):
        try:
            last = _read_small_file(jvm, fs, mpath)
        except Exception as exc:
            if not _is_transient_read_error(exc):
                raise
            last, last_err = b"", exc
        if last:
            try:
                return json.loads(last.decode("utf-8"))
            except json.JSONDecodeError:
                pass
        time.sleep(0.05)
    raise SnapshotVersionError(
        f"manifest v{version} under {path} unreadable after retries "
        f"({len(last)} bytes, last error: {last_err}) — a crashed writer "
        "may have claimed but never published this version"
    )


# mid-publish / IO-shaped failure classes that are worth retrying inside
# a bounded loop; permission and connectivity-config errors are not here
# on purpose — they propagate immediately
_TRANSIENT_READ_ERRORS = (
    "ChecksumException",
    "EOFException",
    "SocketTimeoutException",
    "InterruptedIOException",
    "ConnectTimeoutException",
)


def _is_transient_read_error(exc: Exception) -> bool:
    """Classify a manifest/sidecar read failure as transient. Prefers
    the wrapped Java exception CLASS (py4j's ``java_exception``, cause
    chain included) over message substrings, so a reworded message
    cannot bypass the bounded retry loop; falls back to the substring
    check for non-py4j errors."""
    jexc = getattr(exc, "java_exception", None)
    seen: set[int] = set()
    while jexc is not None and id(jexc) not in seen:
        seen.add(id(jexc))
        try:
            cls = jexc.getClass().getName()
        except Exception:
            break
        if cls.rsplit(".", 1)[-1] in _TRANSIENT_READ_ERRORS:
            return True
        try:
            jexc = jexc.getCause()
        except Exception:
            break
    msg = str(exc)
    return any(name in msg for name in _TRANSIENT_READ_ERRORS)


def _try_commit_manifest(
    spark: SparkSession, path: str, version: int, manifest: dict
) -> bool:
    """Atomically create ``_manifest/v{N}.json``; False if another
    writer committed this version first (the optimistic-concurrency
    loss), any other failure propagates.

    The claim primitive is scheme-dependent: on HDFS/ABFS,
    ``create(path, overwrite=false)`` is enforced atomically server-side.
    On ``file://``, Hadoop's LocalFileSystem implements that flag as a
    non-atomic exists-then-create check — two threads can both "win" and
    the second silently overwrites the first (a lost update this race
    test actually caught). There the claim is ``java.io.File
    .createNewFile()`` — the O_CREAT|O_EXCL syscall, atomic across
    threads and processes — and the JSON is then published over the
    claimed empty file (readers tolerate the claim-to-publish window via
    the retry loop in ``_load_manifest``)."""
    fs, jvm = _fs(spark, path)
    fs.mkdirs(_jpath(jvm, path, MANIFEST_DIR))
    mpath = _jpath(jvm, path, MANIFEST_DIR, f"v{version}.json")
    if fs.getUri().getScheme() == "file":
        local = fs.makeQualified(mpath).toUri().getPath()
        if not jvm.java.io.File(local).createNewFile():
            return False  # lost the O_EXCL race
        stream = fs.create(mpath, True)  # publish over the claimed file
    else:
        try:
            stream = fs.create(mpath, False)  # atomic claim on HDFS/ABFS
        except Exception as exc:  # py4j wraps FileAlreadyExistsException
            if "exists" in str(exc).lower():
                return False
            raise
    try:
        stream.write(bytearray(json.dumps(manifest, sort_keys=True).encode("utf-8")))
    finally:
        stream.close()
    # round 9: if export_delta_log armed a _delta_log/ mirror on this
    # table, extend it with the just-committed version (best-effort —
    # the delta log is derived state and must never fail the commit;
    # a fallen-behind mirror catches up on the next export call)
    from .delta_export import maybe_mirror_delta_log

    maybe_mirror_delta_log(spark, path)
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


def _json_safe_predicate(where: Predicate) -> list[list]:
    """A predicate destined for a manifest must survive the JSON round
    trip: date/timestamp/Decimal values normalize the same way stats do
    (ISO order == chronological order, so comparisons stay faithful)."""
    out = []
    for col, op, val in where:
        if op == "between":
            out.append([col, op, [_json_safe(val[0]), _json_safe(val[1])]])
        else:
            out.append([col, op, _json_safe(val)])
    return out


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
    spark: SparkSession, root: str, rel_dir: str, bloom: dict | None = None
) -> dict[str, dict]:
    """One pass over a newly written data dir: per-file row count and
    min/max for every atomic-typed column (partition columns included —
    Hive-dir discovery surfaces them as constant per file). This is the
    same per-file metadata Delta records in its log, and the input to
    all file skipping below.

    ``bloom`` (``{"cols": [...], "bits": m, "hashes": k}``) additionally
    folds a per-file Bloom filter per listed column into the SAME
    aggregate pass: each row contributes its k ``xxhash64(col, seed) %
    m`` bit positions, ``collect_set`` bounds the per-file state at m
    ints, and the bitset is packed driver-side (m/8 bytes, base64) into
    the manifest — Delta's Bloom filter index, log-resident. Point
    lookups on high-cardinality columns whose [min,max] interval spans
    every file (the case clustering can't fix for more than one column)
    then skip files whose filter provably lacks the value."""
    df = spark.read.option("basePath", f"{root}/{rel_dir}").parquet(f"{root}/{rel_dir}")
    cols = _stats_columns(df)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    bloom_cols = [c for c in (bloom or {}).get("cols", []) if c in df.columns]
    if bloom_cols:
        m, k = int(bloom["bits"]), int(bloom["hashes"])
        for c in bloom_cols:
            positions = F.array(
                *[
                    F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
            aggs.append(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.when(F.col(c).isNotNull(), positions).otherwise(
                                F.array().cast("array<bigint>")
                            )
                        )
                    )
                ).alias(f"__bloom_{c}")
            )
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
        if bloom_cols:
            stats[rel]["bloom"] = {
                c: {
                    "m": int(bloom["bits"]),
                    "k": int(bloom["hashes"]),
                    "type": df.schema[c].dataType.simpleString(),
                    "b64": _pack_bits(d[f"__bloom_{c}"], int(bloom["bits"])),
                }
                for c in bloom_cols
            }
    return stats


def _pack_bits(positions, m: int) -> str:
    import base64

    buf = bytearray((m + 7) // 8)
    for p in positions or []:
        p = int(p)
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


# --------------------------------------------------------------------------
# Two-level stats log (round-6): per-commit stats live in immutable
# SIDECAR files under _manifest/ and the manifest carries only their
# names (``stats_refs``), so a commit serializes O(its own files) of
# metadata — not O(table files). Every _STATS_CHECKPOINT_EVERY refs the
# chain is compacted into ONE parquet CHECKPOINT (file/rows/min/max/bloom
# rows, zstd) pruned to the files the manifest still references — the
# Delta-checkpoint / Iceberg-manifest-list design. Inline
# ``manifest["stats"]`` is still read (tables written by earlier rounds)
# and is folded into the next checkpoint.
# --------------------------------------------------------------------------

_STATS_REF_PREFIX = "stats-"
_STATS_CHECKPOINT_EVERY = 16
_STATS_CACHE: dict[tuple[str, str], dict] = {}  # sidecars are immutable
_STATS_CACHE_MAX = 64


def _write_ref_bytes(spark: SparkSession, path: str, name: str, raw: bytes) -> str:
    fs, jvm = _fs(spark, path)
    fs.mkdirs(_jpath(jvm, path, MANIFEST_DIR))
    stream = fs.create(_jpath(jvm, path, MANIFEST_DIR, name), True)
    try:
        stream.write(bytearray(raw))
    finally:
        stream.close()
    return name


def _write_stats_ref(spark: SparkSession, path: str, stats: dict) -> str:
    """One immutable JSON sidecar holding a single commit's per-file
    stats; attempt-unique name (race losers leave vacuumable orphans)."""
    name = f"{_STATS_REF_PREFIX}{uuid.uuid4().hex[:12]}.json"
    raw = json.dumps(stats, sort_keys=True).encode("utf-8")
    return _write_ref_bytes(spark, path, name, raw)


def _write_stats_checkpoint(spark: SparkSession, path: str, stats: dict) -> str:
    """Compacted checkpoint: ALL live per-file stats as one parquet file
    (columns file/rows/min/max/bloom, JSON-encoded cells, zstd). Parquet
    keeps multi-MB bloom-bearing checkpoints compact and columnar —
    a reader that needs only min/max never decodes the bloom column."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    files = sorted(stats)
    table = pa.table(
        {
            "file": pa.array(files, type=pa.string()),
            "rows": pa.array(
                [int(stats[f].get("rows", 0)) for f in files], type=pa.int64()
            ),
            "min": pa.array(
                [json.dumps(stats[f].get("min", {}), sort_keys=True) for f in files],
                type=pa.string(),
            ),
            "max": pa.array(
                [json.dumps(stats[f].get("max", {}), sort_keys=True) for f in files],
                type=pa.string(),
            ),
            "bloom": pa.array(
                [
                    json.dumps(stats[f]["bloom"], sort_keys=True)
                    if "bloom" in stats[f]
                    else None
                    for f in files
                ],
                type=pa.string(),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="zstd")
    name = f"{_STATS_REF_PREFIX}ckpt-{uuid.uuid4().hex[:12]}.parquet"
    return _write_ref_bytes(spark, path, name, buf.getvalue())


def _parse_stats_ref(name: str, raw: bytes) -> dict[str, dict]:
    if name.endswith(".parquet"):
        import io

        import pyarrow.parquet as pq

        t = pq.read_table(io.BytesIO(raw))
        out: dict[str, dict] = {}
        for f, rows, mn, mx, bl in zip(
            t["file"].to_pylist(),
            t["rows"].to_pylist(),
            t["min"].to_pylist(),
            t["max"].to_pylist(),
            t["bloom"].to_pylist(),
        ):
            st = {"rows": rows, "min": json.loads(mn), "max": json.loads(mx)}
            if bl is not None:
                st["bloom"] = json.loads(bl)
            out[f] = st
        return out
    return json.loads(raw.decode("utf-8"))


def _load_stats_ref(spark: SparkSession, path: str, name: str) -> dict[str, dict]:
    key = (path.rstrip("/"), name)
    hit = _STATS_CACHE.get(key)
    if hit is not None:
        return hit
    fs, jvm = _fs(spark, path)
    raw = _read_small_file(jvm, fs, _jpath(jvm, path, MANIFEST_DIR, name))
    out = _parse_stats_ref(name, raw)
    if len(_STATS_CACHE) >= _STATS_CACHE_MAX:
        _STATS_CACHE.pop(next(iter(_STATS_CACHE)))
    _STATS_CACHE[key] = out
    return out


def _manifest_stats(spark: SparkSession, path: str, manifest: dict) -> dict[str, dict]:
    """Effective per-file stats for a manifest: sidecar refs in commit
    order, then legacy inline stats. Entries for files the manifest no
    longer lists are inert (lookups are keyed by listed file)."""
    refs = manifest.get("stats_refs", [])
    if not refs:
        return manifest.get("stats", {})
    stats: dict[str, dict] = {}
    for ref in refs:
        stats.update(_load_stats_ref(spark, path, ref))
    stats.update(manifest.get("stats", {}))
    return stats


def _maybe_checkpoint_stats(spark: SparkSession, path: str, manifest: dict) -> None:
    """Compact a long sidecar chain into one parquet checkpoint, pruned
    to the files the draft manifest references — amortized O(live files
    / _STATS_CHECKPOINT_EVERY) per commit.

    Pruning derives the live-file set from METADATA ONLY: explicit
    ``data_files`` plus any stats key whose ``data/vN-token`` base dir
    the manifest still lists (each dir's stats keys ARE its files —
    they were collected from the dir at write time). Listing the dirs
    through the Hadoop FS API instead costs two py4j round-trips PER
    FILE and made checkpoint commits grow ~5 ms x table-files (measured
    1.9 s -> 10.9 s over a 2 400-file chain before this was removed);
    now the checkpoint is sidecar reads + a dict prune + one parquet
    write, all driver-memory-bound."""
    refs = manifest.get("stats_refs", [])
    if len(refs) < _STATS_CHECKPOINT_EVERY and not (
        refs and manifest.get("stats")
    ):
        return
    stats = _manifest_stats(spark, path, manifest)
    keep_files = set(manifest.get("data_files", []))
    live_dirs = set(manifest["data_dirs"])

    def _live(f: str) -> bool:
        if f in keep_files:
            return True
        m = _DATA_V_RE.match(f)
        return bool(m) and m.group(1) in live_dirs

    stats = {f: s for f, s in stats.items() if _live(f)}
    manifest["stats_refs"] = [_write_stats_checkpoint(spark, path, stats)]
    manifest["stats"] = {}


def _bloom_positions(
    spark: SparkSession, value, dtype: str, m: int, k: int,
    _cache: dict | None = None,
) -> list[int]:
    """The k bit positions a literal hashes to — computed with the SAME
    JVM xxhash64 the write side used (one driver-side row, memoized per
    scan), so write and probe can never drift."""
    key = (repr(value), dtype, m, k)
    if _cache is not None and key in _cache:
        return _cache[key]
    row = (
        spark.range(1)
        .select(
            *[
                F.pmod(
                    F.xxhash64(F.lit(value).cast(dtype), F.lit(i)), F.lit(m)
                ).alias(f"p{i}")
                for i in range(k)
            ]
        )
        .collect()[0]
    )
    out = [int(row[f"p{i}"]) for i in range(k)]
    if _cache is not None:
        _cache[key] = out
    return out


def _bloom_excludes(
    spark: SparkSession, file_stats: dict | None, where: Predicate,
    cache: dict,
) -> bool:
    """True when some equality conjunct's value provably never landed in
    this file (a required Bloom bit is unset). False positives keep the
    file (correct, just unpruned); false negatives are impossible."""
    import base64

    blooms = (file_stats or {}).get("bloom")
    if not blooms:
        return False
    for col, op, val in where:
        if op != "=" or col not in blooms:
            continue
        meta = blooms[col]
        bits = base64.b64decode(meta["b64"])
        for p in _bloom_positions(
            spark, val, meta["type"], int(meta["m"]), int(meta["k"]), cache
        ):
            if not (bits[p >> 3] >> (p & 7)) & 1:
                return True
    return False


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
    """Expand a manifest to its full relative file list + stats map.

    A dir's file list comes from its STATS KEYS when stats cover it
    (the stats pass records every file of the dir at write time, and
    dirs are immutable once committed) — Hadoop FS listing through
    py4j costs two round-trips per file, i.e. O(table-files) driver
    latency per scan plan at 10^5 files. Only dirs with no stats
    coverage (collect_stats=False writers) fall back to listing;
    explicit ``data_files`` are taken verbatim."""
    root = path.rstrip("/")
    stats = _manifest_stats(spark, path, manifest)
    by_dir: dict[str, list[str]] = {}
    for f in stats:
        m = _DATA_V_RE.match(f)
        if m:
            by_dir.setdefault(m.group(1), []).append(f)
    files: list[str] = list(manifest.get("data_files", []))
    for d in manifest["data_dirs"]:
        if d in by_dir:
            files.extend(sorted(by_dir[d]))
        else:
            files.extend(_list_parquet_files(spark, root, d))
    return files, stats


_RENAME_MAP_FILE = "_column_mapping.json"
# root -> physical->logical map (or None); the sidecar is written once
# at convert_from_delta_log and never mutated, so a process cache is
# safe and keeps the hot read path at zero extra FS round trips
_rename_map_cache: dict[str, dict | None] = {}


def _load_rename_map(spark: SparkSession, root: str) -> dict | None:
    """physical->logical column translation for tables adopted from a
    column-mapping Delta log: their parquet files carry physical
    ``col-<uuid>`` names that must read back under the logical schema.
    Written once by ``convert_from_delta_log``; files the ENGINE writes
    after the convert carry logical names already (the rename no-ops on
    them — physical uuid names never collide with logical ones).

    Two on-disk forms: legacy flat ``{phys: logical}`` (round-10
    converts, top-level ``name`` mode only) and the round-11 form
    ``{"mode": "name"|"id", "schema": <Delta schemaString JSON>}``,
    which preserves nested physical names and field ids so NESTED
    mappings translate on read and export can round-trip the exact
    mapping."""
    key = root.rstrip("/")
    if key in _rename_map_cache:
        return _rename_map_cache[key]
    fs, jvm = _fs(spark, root)
    p = _jpath(jvm, root, _RENAME_MAP_FILE)
    mapping = None
    if fs.exists(p):
        mapping = json.loads(_read_small_file(jvm, fs, p).decode("utf-8"))
    _rename_map_cache[key] = mapping
    return mapping


def _cm_physical_name(field: dict) -> str:
    return (field.get("metadata") or {}).get(
        "delta.columnMapping.physicalName", field["name"]
    )


def _cm_type_has_mapping(t) -> bool:
    if isinstance(t, dict):
        if t.get("type") == "struct":
            return any(
                "delta.columnMapping.physicalName" in (f.get("metadata") or {})
                or _cm_type_has_mapping(f.get("type"))
                for f in t.get("fields", [])
            )
        if t.get("type") == "array":
            return _cm_type_has_mapping(t.get("elementType"))
        if t.get("type") == "map":
            return _cm_type_has_mapping(t.get("keyType")) or _cm_type_has_mapping(
                t.get("valueType")
            )
    return False


def _mapping_info(raw: dict | None) -> dict | None:
    """Normalize either sidecar form to
    ``{"mode", "schema" | None, "top": {phys: logical}, "nested": bool}``."""
    if raw is None:
        return None
    if isinstance(raw, dict) and "schema" in raw and "mode" in raw:
        schema = raw["schema"]
        top: dict[str, str] = {}
        nested = False
        for f in schema.get("fields", []):
            phys = _cm_physical_name(f)
            if phys != f["name"]:
                top[phys] = f["name"]
            if _cm_type_has_mapping(f.get("type")):
                nested = True
        return {"mode": raw["mode"], "schema": schema, "top": top,
                "nested": nested}
    return {"mode": "name", "schema": None,
            "top": {str(k): str(v) for k, v in raw.items()}, "nested": False}


def _cm_expr(col, t):
    """Recursive physical->logical mapping expression for one column of
    Delta schemaString type ``t``: struct fields are rebuilt under
    their logical names from the physical getField lookups, arrays and
    maps map their element/value types, scalars pass through. Null
    structs stay null (the rebuilt struct is guarded)."""
    from pyspark.sql import functions as F

    if isinstance(t, dict) and t.get("type") == "struct":
        inner = F.struct(
            *[
                _cm_expr(col.getField(_cm_physical_name(sf)), sf.get("type")).alias(
                    sf["name"]
                )
                for sf in t.get("fields", [])
            ]
        )
        return F.when(col.isNull(), F.lit(None)).otherwise(inner)
    if isinstance(t, dict) and t.get("type") == "array":
        et = t.get("elementType")
        if _cm_type_has_mapping(et):
            return F.transform(col, lambda x: _cm_expr(x, et))
        return col
    if isinstance(t, dict) and t.get("type") == "map":
        kt, vt = t.get("keyType"), t.get("valueType")
        if _cm_type_has_mapping(kt) or _cm_type_has_mapping(vt):
            keys = F.map_keys(col)
            vals = F.map_values(col)
            if _cm_type_has_mapping(kt):
                keys = F.transform(keys, lambda x: _cm_expr(x, kt))
            if _cm_type_has_mapping(vt):
                vals = F.transform(vals, lambda x: _cm_expr(x, vt))
            return F.map_from_arrays(keys, vals)
        return col
    return col


def _rename_physical(spark: SparkSession, root: str, df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    info = _mapping_info(_load_rename_map(spark, root))
    if not info:
        return df
    if not info["nested"]:
        present = {k: v for k, v in info["top"].items() if k in df.columns}
        if present:
            df = df.withColumnsRenamed(present)
        return df
    # nested mappings: rebuild each mapped column via expressions; a
    # column already under its logical name (engine-written file after
    # the convert) passes through untouched, as do extra columns
    # (hive partition constants, scan-position metadata)
    exprs = []
    handled: set[str] = set()
    for f in info["schema"].get("fields", []):
        phys = _cm_physical_name(f)
        if phys in df.columns:
            exprs.append(_cm_expr(F.col(phys), f.get("type")).alias(f["name"]))
            handled.add(phys)
        elif f["name"] in df.columns:
            exprs.append(F.col(f["name"]))
            handled.add(f["name"])
    for c in df.columns:
        if c not in handled:
            exprs.append(F.col(c))
    return df.select(*exprs)


_POS_FILE_COL = "__snap_file"
_POS_IDX_COL = "__snap_pos"


def _read_files(
    spark: SparkSession, root: str, rel_files: list[str],
    with_positions: bool = False,
) -> DataFrame:
    """Read an explicit file subset, grouping by data/vN base so Hive
    partition columns survive (``basePath`` per group).
    allowMissingColumns: dirs written before a schema-evolving append
    lack the new columns — they read back null-filled, Delta's
    mergeSchema read semantics. Physical->logical renames (column-
    mapping converts) apply per group BEFORE the union so mixed
    physical/logical dirs align by logical name.

    ``with_positions`` materializes each row's table-relative file path
    and within-file row index (the physical positions Delta deletion
    vectors address) from the scan's ``_metadata`` column — it must
    happen HERE, per file-source scan, because metadata columns do not
    propagate through the union."""
    from urllib.parse import unquote as _unq

    groups: dict[str, list[str]] = {}
    for f in rel_files:
        groups.setdefault(_base_dir_of(f), []).append(f)
    out = None
    for base, fl in sorted(groups.items()):
        # manifest paths are the URI-ENCODED form of the literal
        # on-disk names (stats keys are recorded from task-commit
        # URIs: a partition value with a space lists as %20); Spark's
        # reader wants the literal path, so decode here — and position
        # matching stays in ENCODED space because _metadata.file_path
        # is a URI too
        part = spark.read.option("basePath", f"{root}/{base}").parquet(
            *[f"{root}/{_unq(f)}" for f in fl]
        )
        if with_positions:
            # position bookkeeping lives in LITERAL path space:
            # _metadata.file_path is a URI (space -> %20 etc.), so
            # percent-decode it here. url_decode is form-decoding
            # ('+' -> space), which exact URI decoding must not do —
            # literal '+' is pre-escaped. Position sidecars store the
            # same literal names. Pinned by
            # test_positional_delete_on_special_char_partition.
            decoded = F.url_decode(
                F.replace(
                    F.col("_metadata.file_path"), F.lit("+"), F.lit("%2B")
                )
            )
            part = part.withColumns(
                {
                    _POS_FILE_COL: F.regexp_extract(
                        decoded, f".*/({DATA_DIR}/.*)$", 1
                    ),
                    _POS_IDX_COL: F.col("_metadata.row_index"),
                }
            )
        part = _rename_physical(spark, root, part)
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    return out


def _apply_delete_entry(
    spark: SparkSession, root: str, df: DataFrame, entry: dict
) -> DataFrame:
    """Apply one merge-on-read delete entry to rows read from files it
    covers: predicate entries filter (NOT matching), equality-delete
    entries LEFT ANTI join the key file, positional entries (Delta
    deletion vectors) LEFT ANTI join the (file, row-index) sidecar
    against the scan-time position columns. The anti-join's build side
    is the key/position file — small by construction — so AQE
    broadcasts it; the corpus side never shuffles."""
    if "predicate" in entry:
        return df.filter(~_where_to_column([tuple(p) for p in entry["predicate"]]))
    if "positions_dir" in entry:
        return df.join(
            _read_positions(spark, root, entry),
            on=[_POS_FILE_COL, _POS_IDX_COL],
            how="left_anti",
        )
    keys = (
        spark.read.parquet(f"{root}/{entry['keys_dir']}")
        .select(*entry["key_cols"])
        .dropDuplicates()
    )
    return df.join(keys, on=list(entry["key_cols"]), how="left_anti")


def _read_positions(spark: SparkSession, root: str, entry: dict) -> DataFrame:
    """A positional delete entry's sidecar, aligned to the scan-time
    position column names. No dedup: semi/anti joins are insensitive to
    build-side duplicates, and skipping the aggregate keeps the sidecar
    a plain tiny scan that Spark broadcasts statically."""
    return spark.read.parquet(f"{root}/{entry['positions_dir']}").select(
        F.col("file").alias(_POS_FILE_COL),
        F.col("pos").alias(_POS_IDX_COL),
    )


def _read_with_deletes(
    spark: SparkSession, root: str, rel_files: list[str], manifest: dict
) -> DataFrame:
    """Read an explicit file subset with the manifest's merge-on-read
    delete entries applied. Files are grouped by the SET of entries that
    cover them (most files have none and read untouched); each group
    gets its entries applied once, then groups union back. Cost is
    proportional to the covered-file count — uncovered files pay
    nothing."""
    entries = manifest.get("deletes", [])
    if not entries:
        return _read_files(spark, root, rel_files)
    covers = {e["id"]: set(e["files"]) for e in entries}
    by_id = {e["id"]: e for e in entries}
    groups: dict[tuple, list[str]] = {}
    for f in rel_files:
        key = tuple(sorted(i for i, fl in covers.items() if f in fl))
        groups.setdefault(key, []).append(f)
    out = None
    for key, fl in sorted(groups.items()):
        # positional entries address physical row indexes, so the scan
        # materializes them up front; delete entries commute (each is a
        # set subtraction), so mixing kinds in any order stays exact
        needs_pos = any("positions_dir" in by_id[i] for i in key)
        part = _read_files(spark, root, fl, with_positions=needs_pos)
        for i in key:  # id order == commit order
            part = _apply_delete_entry(spark, root, part, by_id[i])
        if needs_pos:
            part = part.drop(_POS_FILE_COL, _POS_IDX_COL)
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    return out


def _validate_constraints(df: DataFrame, constraints: dict | None) -> None:
    """Enforce NOT NULL / CHECK constraints on rows about to be written
    (Delta's write-time enforcement): ONE aggregate pass counts
    violations per constraint; any violation fails the write before a
    single data file lands. CHECK follows SQL semantics — a NULL check
    result passes; only definite FALSE violates."""
    if not constraints:
        return
    conds: list[tuple[str, Column]] = []
    for c in constraints.get("not_null", []):
        conds.append((f"NOT NULL {c}", F.col(c).isNull()))
    for name, expr in constraints.get("check", {}).items():
        conds.append((f"CHECK {name} ({expr})", ~F.expr(expr)))
    if not conds:
        return
    counts = df.agg(
        *[
            F.sum(F.when(viol, 1).otherwise(0)).alias(f"c{i}")
            for i, (_n, viol) in enumerate(conds)
        ]
    ).collect()[0]
    broken = [
        (name, int(counts[f"c{i}"] or 0))
        for i, (name, _v) in enumerate(conds)
        if (counts[f"c{i}"] or 0) > 0
    ]
    if broken:
        raise SnapshotConstraintError(
            "write rejected: "
            + "; ".join(f"{n} violated by {k} row(s)" for n, k in broken)
        )


def _carry_deletes(parent: dict, keep_files: list[str]) -> list[dict]:
    """Delete entries surviving a copy-on-write commit: rewritten files
    had their deletes materialized, so each entry is narrowed to the
    files the commit carries verbatim; emptied entries drop."""
    kept = set(keep_files)
    out = []
    for e in parent.get("deletes", []):
        files = sorted(set(e["files"]) & kept)
        if files:
            out.append({**e, "files": files})
    return out


def _cluster_for_skipping(
    df: DataFrame,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "linear",
) -> DataFrame:
    """Clustered write applied at commit time: each written file covers
    a narrow interval, which is what makes the manifest's stats-based
    file skipping effective. ``mode='linear'`` range-sorts on the
    columns (skips on the leading column); ``mode='zorder'`` Morton-
    interleaves exactly two columns (Delta's OPTIMIZE ZORDER) so
    per-file rectangles stay narrow in BOTH dimensions and filters on
    either column skip. Without clustering, a uniformly-shuffled
    column's per-file interval spans the whole domain and no file is
    ever skippable."""
    from azure_etl_spark.operators.layout import sort_for_skipping, zorder_for_skipping

    if mode == "zorder":
        return zorder_for_skipping(df, cluster_by, partitions=num_files)
    if mode != "linear":
        raise ValueError(f"cluster mode must be linear|zorder, got {mode!r}")
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
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 8192,
    bloom_hashes: int = 5,
    cluster_mode: str = "linear",
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

    ``bloom_cols`` opts columns into per-file Bloom filters (inside the
    same stats pass; ~``bloom_bits``/8 bytes of manifest per file per
    column), arming equality-lookup file skipping on columns min/max
    can't prune. The setting is table metadata: once set it rides the
    manifest forward, so appends and COW rewrites keep collecting
    filters without re-passing the option.

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
        df = _cluster_for_skipping(df, cluster_by, cluster_files, cluster_mode)
    spark = df.sparkSession
    validated = False
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        parent = _load_manifest(spark, path, versions[-1]) if versions else None
        txns = dict(parent.get("txns", {})) if parent else {}
        if txn_app_id is not None and txns.get(txn_app_id, -1) >= txn_version:
            return -1  # replayed transaction: already durable, skip
        if not validated and parent is not None:
            # table constraints survive overwrite (they are table
            # metadata, like Delta's); enforce before any data lands
            _validate_constraints(df, parent.get("constraints"))
            validated = True
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
        # attempt-unique dir: a concurrent writer of the same version
        # number can never clobber this attempt's files; if the commit
        # below loses the race the dir becomes a vacuumable orphan
        data_rel = f"{DATA_DIR}/v{version}-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        root = path.rstrip("/")
        writer.parquet(f"{root}/{data_rel}")
        dirs = [data_rel]
        carried_files: list[str] = []
        stats: dict[str, dict] = {}
        stats_refs: list[str] = []
        deletes: list[dict] = []
        bloom_cfg = (
            {"cols": list(bloom_cols), "bits": bloom_bits, "hashes": bloom_hashes}
            if bloom_cols
            else (parent.get("bloom") if parent else None)
        )
        if collect_stats:
            new_stats = _collect_file_stats(spark, root, data_rel, bloom=bloom_cfg)
            if new_stats:
                # sidecar, not inline: the manifest stays O(1) in stats
                stats_refs = [_write_stats_ref(spark, path, new_stats)]
        if mode == "append" and parent is not None:
            dirs = parent["data_dirs"] + dirs
            carried_files = list(parent.get("data_files", []))
            # carry the parent's stats REFS (O(refs) names, not O(files)
            # entries); legacy inline stats ride along until the next
            # checkpoint folds them in
            stats = dict(parent.get("stats", {}))
            stats_refs = parent.get("stats_refs", []) + stats_refs
            # merge-on-read delete entries still apply to the carried
            # files (the append adds rows, it does not un-delete)
            deletes = [dict(e) for e in parent.get("deletes", [])]
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
            "stats_refs": stats_refs,
            "txns": txns,
            "deletes": deletes,
            "columns": columns,
            **({"bloom": bloom_cfg} if bloom_cfg else {}),
            **(
                {"constraints": parent["constraints"]}
                if parent is not None and "constraints" in parent
                else {}
            ),
            **(
                {"properties": parent["properties"]}
                if parent is not None and "properties" in parent
                else {}
            ),
        }
        _maybe_checkpoint_stats(spark, path, manifest)
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


def version_as_of(spark: SparkSession, path: str, ts_unix: float) -> int:
    """Timestamp time travel (Delta's ``timestampAsOf``): the newest
    retained version committed at or before ``ts_unix``. O(retained
    manifests) driver-side JSON reads; raises if the table did not yet
    exist at that time (or those versions were vacuumed)."""
    best = None
    for v in _list_versions(spark, path):
        m = _load_manifest(spark, path, v)
        if float(m.get("committed_at_unix", 0.0)) <= ts_unix:
            best = v
    if best is None:
        raise SnapshotVersionError(
            f"no snapshot version at {path} committed at or before {ts_unix} "
            "(table newer than the timestamp, or versions vacuumed)"
        )
    return best


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
    bloom_cache: dict = {}
    read = [
        f
        for f in files
        if _file_may_match(stats.get(f), where)
        and not _bloom_excludes(spark, stats.get(f), where, bloom_cache)
    ]
    skipped = [f for f in files if f not in set(read)]
    return read, skipped


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: Predicate | None = None,
    as_of_unix: float | None = None,
) -> DataFrame:
    """Read the snapshot table at ``path`` — latest version by default,
    any retained ``version``, or the version current at ``as_of_unix``
    (timestamp time travel via :func:`version_as_of`).

    ``where`` is an optional conjunctive predicate
    ``[(col, op, value), ...]`` (op in ``= < <= > >= between``). It is
    applied twice: file skipping via manifest stats (files whose
    [min,max] cannot match are never opened — the 100 TB win), then as a
    normal row filter Catalyst pushes into the surviving scans."""
    if as_of_unix is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_unix, not both")
        version = version_as_of(spark, path, as_of_unix)
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
            _read_with_deletes(spark, root, rel_files, manifest).filter(
                _where_to_column(where)
            ),
            manifest,
        )
    if manifest.get("deletes"):
        files = _manifest_files(spark, path, manifest)[0]
        if not files:
            raise SnapshotVersionError(f"version {version} at {path} lists no data")
        return _project(_read_with_deletes(spark, root, files, manifest), manifest)
    out = None
    for d in manifest["data_dirs"]:
        part = _rename_physical(
            spark,
            root,
            spark.read.option("basePath", f"{root}/{d}").parquet(f"{root}/{d}"),
        )
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


def _match_delete_entry(
    spark: SparkSession, root: str, df: DataFrame, entry: dict
) -> DataFrame:
    """Rows a merge-on-read delete entry covers (the inverse of
    :func:`_apply_delete_entry`): predicate entries filter TO matching
    rows, equality-delete entries LEFT SEMI join the key file,
    positional entries LEFT SEMI join the position sidecar."""
    if "predicate" in entry:
        return df.filter(_where_to_column([tuple(p) for p in entry["predicate"]]))
    if "positions_dir" in entry:
        return df.join(
            _read_positions(spark, root, entry),
            on=[_POS_FILE_COL, _POS_IDX_COL],
            how="left_semi",
        )
    keys = (
        spark.read.parquet(f"{root}/{entry['keys_dir']}")
        .select(*entry["key_cols"])
        .dropDuplicates()
    )
    return df.join(keys, on=list(entry["key_cols"]), how="left_semi")


def _mor_entry_changes(
    spark: SparkSession,
    root: str,
    prev_manifest: dict,
    cur_manifest: dict,
    shared_files: list[str],
) -> list[tuple[str, DataFrame]]:
    """Logical row changes on files present in BOTH versions, caused by
    merge-on-read delete entries appearing (rows leave: ``delete``) or
    disappearing without a file rewrite (restore un-delete: rows return:
    ``insert``). Rows are read under the opposite side's full entry set
    first, so a row invisible on both sides is never emitted. Cost is
    bounded by the covered files."""
    prev_entries = {e["id"]: e for e in prev_manifest.get("deletes", [])}
    cur_entries = {e["id"]: e for e in cur_manifest.get("deletes", [])}
    prev_cov = {i: set(e["files"]) for i, e in prev_entries.items()}
    cur_cov = {i: set(e["files"]) for i, e in cur_entries.items()}
    groups: dict[tuple, list[str]] = {}
    for f in shared_files:
        p = tuple(sorted(i for i, fl in prev_cov.items() if f in fl))
        c = tuple(sorted(i for i, fl in cur_cov.items() if f in fl))
        if p != c:
            groups.setdefault((p, c), []).append(f)
    out: list[tuple[str, DataFrame]] = []
    for (p, c), files in sorted(groups.items()):
        added = [i for i in c if i not in p]
        removed = [i for i in p if i not in c]
        needs_pos = any(
            "positions_dir" in e
            for e in [prev_entries[i] for i in p] + [cur_entries[i] for i in c]
        )

        def _emit(df: DataFrame) -> DataFrame:
            return df.drop(_POS_FILE_COL, _POS_IDX_COL) if needs_pos else df

        if added:
            # visible-at-prev rows the new entries now cover
            base = _read_files(spark, root, files, with_positions=needs_pos)
            for i in p:
                base = _apply_delete_entry(spark, root, base, prev_entries[i])
            for i in added:
                out.append(
                    ("delete",
                     _emit(_match_delete_entry(spark, root, base, cur_entries[i])))
                )
                base = _apply_delete_entry(spark, root, base, cur_entries[i])
        if removed:
            # rows visible at cur that the vanished entries had hidden
            base = _read_files(spark, root, files, with_positions=needs_pos)
            for i in c:
                base = _apply_delete_entry(spark, root, base, cur_entries[i])
            for i in removed:
                out.append(
                    ("insert",
                     _emit(_match_delete_entry(spark, root, base, prev_entries[i])))
                )
                base = _apply_delete_entry(spark, root, base, prev_entries[i])
    return out


def snapshot_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    net: bool = False,
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
    minimizes. ``net=True`` cancels that churn: rows are aggregated
    over the whole range with +1 per insert and -1 per delete, and only
    the non-zero multiset difference is emitted (a row both deleted and
    re-inserted disappears; a row inserted twice emits twice). The
    extra cost is ONE aggregation over the churn rows — still bounded
    by the changed files, never the table. Net mode necessarily loses
    per-commit attribution, so ``_commit_version`` is the range end.

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
            # different files — not a change to feed consumers. (Any
            # merge-on-read deletes were materialized into the rewrite,
            # so the logical rows are unchanged too.)
            prev_manifest, prev_files = manifest, cur_files
            continue
        parts = []
        # file-level diff; each side reads under ITS manifest's
        # merge-on-read entries so only logically-visible rows feed out
        ins, rem = sorted(cur_files - prev_files), sorted(prev_files - cur_files)
        if ins:
            parts.append(("insert", _read_with_deletes(spark, root, ins, manifest)))
        if rem:
            parts.append(
                ("delete", _read_with_deletes(spark, root, rem, prev_manifest))
            )
        # entry-level diff over files present on both sides: a
        # merge-on-read delete commit changes no files, but rows covered
        # by its new entry leave the logical table at this commit
        parts.extend(
            _mor_entry_changes(
                spark, root, prev_manifest, manifest,
                sorted(prev_files & cur_files),
            )
        )
        for tag, df in parts:
            part = (
                df.withColumn("_change_type", F.lit(tag))
                .withColumn("_commit_version", F.lit(v).cast("int"))
            )
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        prev_manifest, prev_files = manifest, cur_files
    if out is None:
        base = read_snapshot(spark, path, version=to_version).limit(0)
        return (
            base.withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0).cast("int"))
            .filter(F.lit(False))
        )
    if net:
        data_cols = [c for c in out.columns
                     if c not in ("_change_type", "_commit_version")]
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        agg = out.groupBy(*data_cols).agg(F.sum(sign).alias("__net"))
        nonzero = agg.filter(F.col("__net") != 0)
        return (
            nonzero.withColumn(
                "_change_type",
                F.when(F.col("__net") > 0, "insert").otherwise("delete"),
            )
            .withColumn("_commit_version", F.lit(to_version).cast("int"))
            # multiset semantics: |net| copies of each surviving row
            .withColumn(
                "__dup",
                F.explode(F.sequence(F.lit(1), F.abs(F.col("__net")).cast("int"))),
            )
            .select(*data_cols, "_change_type", "_commit_version")
        )
    return out


def _rebase_over_appends(
    spark: SparkSession, path: str, parent: dict, tip_version: int, operation: str
) -> dict:
    """The log advanced past the snapshot a DML computed against. If
    every intervening commit is a pure same-schema APPEND, the DML
    rebases: op-before-append is a valid serialization (the op read
    version N; rows appended after it are simply untouched — Delta's
    WriteSerializable), so the appended dirs/files carry verbatim into
    the DML's manifest. Anything else — a concurrent COW/metadata
    commit rewrote or re-described files the DML's plan may also cover,
    or the schema evolved under it — raises
    :class:`SnapshotConflictError`; recompute on the current version.
    Returns the tip manifest to graft carried state from."""
    for v in range(parent["version"] + 1, tip_version + 1):
        try:
            m = _load_manifest(spark, path, v)
        except SnapshotVersionError:
            # a concurrent vacuum reclaimed the intervening manifest —
            # the append-only proof is unobtainable, so conflict (the
            # caller recomputes on the current tip, same as any other
            # unprovable interleaving)
            raise SnapshotConflictError(
                f"intervening manifest v{v} at {path} was vacuumed while "
                f"{operation!r} (computed at v{parent['version']}) was in "
                "flight; recompute on the current version"
            )
        if m.get("mode") != "append":
            raise SnapshotConflictError(
                f"concurrent {m.get('operation', m.get('mode'))!r} commit v{v} at "
                f"{path} conflicts with {operation!r} computed at "
                f"v{parent['version']}; recompute on the current version"
            )
        if "columns" in parent:
            if m.get("columns") != parent.get("columns"):
                raise SnapshotConflictError(
                    f"schema evolved at v{v} under {operation!r} computed at "
                    f"v{parent['version']} at {path}; recompute on the current version"
                )
        elif "columns" in m:
            # legacy parent manifest predates column recording: there is
            # no recorded parent schema to prove the intervening append
            # didn't extend it — conflict rather than rebase silently
            # under a possible schema drift (ADVICE r7)
            raise SnapshotConflictError(
                f"cannot prove schema stability: parent v{parent['version']} "
                f"at {path} predates column recording but commit v{v} records "
                f"columns; recompute {operation!r} on the current version"
            )
    return _load_manifest(spark, path, tip_version)


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
    write_snapshot — and because ``keep_files`` was computed against
    ``parent``, any log movement since (first attempt OR retry) goes
    through :func:`_rebase_over_appends`: appended dirs/files carry
    into the new manifest, non-append interleavings raise instead of
    silently dropping the other writer's commit."""
    root = path.rstrip("/")
    partition_by = parent.get("partition_by", [])
    if rewrite_df is not None:
        # an UPDATE/MERGE rewrite can introduce violations; DELETE can't
        # but the check is one aggregate over the touched rows only
        _validate_constraints(rewrite_df, parent.get("constraints"))
    parent_dirs = set(parent.get("data_dirs", []))
    parent_files = set(parent.get("data_files", []))
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        tip_v = versions[-1] if versions else -1
        base = (
            parent
            if tip_v == parent["version"]
            else _rebase_over_appends(spark, path, parent, tip_v, operation)
        )
        extra_dirs = [d for d in base.get("data_dirs", []) if d not in parent_dirs]
        extra_files = [
            f for f in base.get("data_files", []) if f not in parent_files
        ]
        version = tip_v + 1
        data_rel = f"{DATA_DIR}/v{version}-{uuid.uuid4().hex[:8]}"
        dirs: list[str] = []
        # carry the BASE's stats refs verbatim (parent's plus any
        # rebased appends'): entries for files this commit drops are
        # inert (lookups key on listed files) and the next checkpoint
        # prunes them — the commit itself stays O(commit), never
        # O(table files)
        stats = dict(base.get("stats", {}))
        stats_refs = list(base.get("stats_refs", []))
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
                new_stats = _collect_file_stats(
                    spark, root, data_rel, bloom=parent.get("bloom")
                )
                if new_stats:
                    stats_refs.append(_write_stats_ref(spark, path, new_stats))
        manifest = {
            "version": version,
            "mode": "overwrite",
            "operation": operation,
            # rebased appends' dirs ride along untouched (the DML never
            # read them; they stay uncompacted/unmerged, exactly as if
            # the append happened after the DML)
            "data_dirs": dirs + extra_dirs,
            "data_files": sorted(keep_files + extra_files),
            "partition_by": partition_by,
            "committed_at_unix": time.time(),
            "stats": stats,
            "stats_refs": stats_refs,
            # the BASE's txn ledger: dropping a rebased append's txn
            # entry would let a streaming replay double-commit
            "txns": dict(base.get("txns", {})),
            # rewritten files materialized their merge-on-read deletes;
            # entries narrow to the files carried verbatim (appends add
            # no delete entries, so the parent's set is the full set)
            "deletes": _carry_deletes(parent, keep_files),
            **({"bloom": parent["bloom"]} if "bloom" in parent else {}),
            # COW ops never change the table schema or its constraints
            **({"columns": parent["columns"]} if "columns" in parent else {}),
            **(
                {"constraints": parent["constraints"]}
                if "constraints" in parent
                else {}
            ),
            **(
                {"properties": parent["properties"]}
                if "properties" in parent
                else {}
            ),
        }
        _maybe_checkpoint_stats(spark, path, manifest)
        if _try_commit_manifest(spark, path, version, manifest):
            return version
    raise SnapshotConflictError(
        f"lost the manifest-create race {max_retries} times at {path}"
    )


def _commit_metadata(
    spark: SparkSession,
    path: str,
    parent: dict,
    mutate,
    operation: str,
    max_retries: int = 5,
    on_log_advance: str = "conflict",
) -> int:
    """Commit a new version that reuses the parent's data references —
    no data IO, just a manifest describing the same (or logically
    narrowed) rows. ``mutate(manifest, version)`` edits the draft in
    place before the atomic manifest-create; it re-runs on each
    optimistic-concurrency retry against the fresh version number.

    ``on_log_advance`` decides what happens when the log moved past
    ``parent`` (a concurrent commit landed since the caller resolved
    its snapshot): ``"rebase"`` — carry intervening pure appends via
    :func:`_rebase_over_appends` (sound for ops that only annotate or
    narrow the files they actually resolved, e.g. merge-on-read delete
    entries); ``"conflict"`` — raise (ops whose validity depends on
    the WHOLE table at commit time, e.g. ``set_constraints``' full-data
    validation); ``"ignore"`` — legacy claim-the-next-version (RESTORE,
    whose very point is to override the tip)."""
    if on_log_advance not in ("rebase", "conflict", "ignore"):
        raise ValueError(f"bad on_log_advance {on_log_advance!r}")
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        tip_v = versions[-1] if versions else -1
        base = parent
        if on_log_advance != "ignore" and tip_v != parent["version"]:
            if on_log_advance == "conflict":
                raise SnapshotConflictError(
                    f"log advanced to v{tip_v} under {operation!r} computed at "
                    f"v{parent['version']} at {path}; recompute on the current "
                    "version"
                )
            base = _rebase_over_appends(spark, path, parent, tip_v, operation)
        version = tip_v + 1
        manifest = {
            "version": version,
            "mode": "overwrite",
            "operation": operation,
            "data_dirs": list(base["data_dirs"]),
            "data_files": list(base.get("data_files", [])),
            "partition_by": base.get("partition_by", []),
            "committed_at_unix": time.time(),
            "stats": dict(base.get("stats", {})),
            "stats_refs": list(base.get("stats_refs", [])),
            "txns": dict(base.get("txns", {})),
            "deletes": [dict(e) for e in base.get("deletes", [])],
            **({"bloom": base["bloom"]} if "bloom" in base else {}),
            **({"columns": base["columns"]} if "columns" in base else {}),
            **(
                {"constraints": base["constraints"]}
                if "constraints" in base
                else {}
            ),
            **(
                {"properties": base["properties"]}
                if "properties" in base
                else {}
            ),
        }
        mutate(manifest, version)
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
    mode: str = "copy_on_write",
) -> dict:
    """DELETE with a choice of physical strategy (Delta/Iceberg parity).

    ``mode='copy_on_write'`` (default): files whose stats prove no row
    matches are carried into the new version untouched (zero IO); only
    files that *may* contain matches are read and rewritten without the
    matching rows. Rewrite cost is sized by the touched files, not the
    table.

    ``mode='merge_on_read'``: no data is rewritten at all — the commit
    records a delete entry (this predicate, scoped to the files whose
    stats say they may match) in the manifest. Readers apply it on the
    fly; the next copy-on-write commit or :func:`compact_snapshot` over
    a covered file materializes it. At 100 TB this turns "delete 100
    rows spread over 50 multi-GB files" from a 50-file rewrite into a
    one-manifest commit.

    Returns ``{"version", "files_kept", "files_rewritten"}``
    (merge-on-read reports the covered files as ``files_kept`` and
    ``files_rewritten=0``).
    """
    if mode not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"delete mode must be copy_on_write|merge_on_read, got {mode!r}")
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    touched, keep = resolve_scan(spark, path, version, where)
    root = path.rstrip("/")
    if mode == "merge_on_read":
        if not touched:  # stats prove a no-op: nothing to record
            return {"version": version, "files_kept": len(keep), "files_rewritten": 0}

        def mutate(manifest: dict, v: int) -> None:
            manifest["deletes"].append(
                {"id": v, "predicate": _json_safe_predicate(where), "files": touched}
            )

        new_version = _commit_metadata(
            spark, path, parent, mutate, "delete_mor", on_log_advance="rebase"
        )
        return {
            "version": new_version,
            "files_kept": len(keep) + len(touched),
            "files_rewritten": 0,
        }
    rewrite = None
    if touched:
        rewrite = _read_with_deletes(spark, root, touched, parent).filter(
            ~_where_to_column(where)
        )
    new_version = _commit_cow(spark, path, parent, keep, rewrite, "delete")
    return {
        "version": new_version,
        "files_kept": len(keep),
        "files_rewritten": len(touched),
    }


def delete_keys_from_snapshot(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_cols: list[str],
    version: int | None = None,
) -> dict:
    """Merge-on-read *equality delete* (the Iceberg equality-delete
    file, aka the GDPR shape): write the distinct key tuples as a small
    parquet file and record a delete entry pointing at it, scoped via
    the keys' own [min,max] range to the target files that may contain
    them. No table data is rewritten — readers LEFT ANTI join the key
    file (broadcast — it is small by construction) against only the
    covered files; compaction or any copy-on-write commit materializes
    it. Cost at 100 TB: O(keys) written + one manifest, independent of
    table size."""
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    keys = keys.select(*key_cols).dropDuplicates().localCheckpoint(eager=True)
    bounds = keys.agg(
        *[F.min(k).alias(f"lo_{k}") for k in key_cols],
        *[F.max(k).alias(f"hi_{k}") for k in key_cols],
    ).collect()[0]
    where: Predicate = [
        (k, "between", (bounds[f"lo_{k}"], bounds[f"hi_{k}"])) for k in key_cols
        if bounds[f"lo_{k}"] is not None
    ]
    if not where:  # empty key set: no-op
        return {"version": version, "files_covered": 0, "n_keys": 0}
    touched, _keep = resolve_scan(spark, path, version, where)
    if not touched:
        return {"version": version, "files_covered": 0, "n_keys": keys.count()}
    root = path.rstrip("/")

    def mutate(manifest: dict, v: int) -> None:
        # attempt-unique like data dirs: a racing delete of the same
        # version can never clobber this attempt's key file
        keys_rel = f"{DELETES_DIR}/v{v}-{uuid.uuid4().hex[:8]}"
        # key files are tiny: one file keeps the read-side broadcast cheap
        keys.coalesce(1).write.mode("overwrite").parquet(f"{root}/{keys_rel}")
        manifest["deletes"].append(
            {"id": v, "keys_dir": keys_rel, "key_cols": list(key_cols),
             "files": touched}
        )

    new_version = _commit_metadata(
        spark, path, parent, mutate, "delete_keys", on_log_advance="rebase"
    )
    return {
        "version": new_version,
        "files_covered": len(touched),
        "n_keys": keys.count(),
    }


def delete_positions_from_snapshot(
    spark: SparkSession,
    path: str,
    positions: dict[str, "list[int]"],
    version: int | None = None,
) -> dict:
    """Merge-on-read *positional delete* — the shape of a Delta
    deletion vector or an Iceberg position-delete file: physical row
    indexes within named data files. No table data is rewritten — the
    commit writes the (file, pos) pairs as a small parquet sidecar and
    records a delete entry covering exactly those files; readers LEFT
    ANTI join the sidecar against scan-time ``_metadata.row_index``
    (covered files only), and any copy-on-write commit or
    :func:`compact_snapshot` materializes it. This is the entry kind
    :func:`convert_from_delta_log` lowers real deletion vectors into
    (O(DV bytes), zero data IO) and :func:`export_delta_log` raises
    back into DV files.

    ``positions`` maps manifest-relative data file paths to iterables
    of 0-based row indexes; every named file must be live at
    ``version``. Returns ``{"version", "files_covered",
    "n_positions"}``; an empty mapping is a no-op."""
    from urllib.parse import unquote as _unq

    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    # callers may name files in manifest (URI-encoded) or literal form;
    # normalize to LITERAL (the sidecar's space) and keep the
    # manifest-form names for the entry's coverage list
    positions = {_unq(f): sorted(set(p)) for f, p in positions.items() if p}
    if not positions:
        return {"version": version, "files_covered": 0, "n_positions": 0}
    live_by_lit = {
        _unq(m): m for m in _manifest_files(spark, path, parent)[0]
    }
    missing = sorted(set(positions) - set(live_by_lit))
    if missing:
        raise SnapshotVersionError(
            f"positional delete names files not live at v{version}: "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''}"
        )
    touched = sorted(live_by_lit[f] for f in positions)
    n_pos = sum(len(p) for p in positions.values())
    root = path.rstrip("/")

    def mutate(manifest: dict, v: int) -> None:
        # attempt-unique like data dirs: a racing commit of the same
        # version can never clobber this attempt's sidecar
        pos_rel = f"{DELETES_DIR}/pos-v{v}-{uuid.uuid4().hex[:8]}"
        _write_positions_parquet(spark, root, pos_rel, positions)
        manifest["deletes"].append(
            {"id": v, "positions_dir": pos_rel, "files": touched}
        )

    new_version = _commit_metadata(
        spark, path, parent, mutate, "delete_mor", on_log_advance="rebase"
    )
    return {
        "version": new_version,
        "files_covered": len(touched),
        "n_positions": n_pos,
    }


def _write_positions_parquet(
    spark: SparkSession, root: str, rel: str, positions: dict[str, list[int]]
) -> None:
    """One small (file, pos) parquet sidecar, written driver-side via
    pyarrow — a deletion vector is metadata, so this never needs a
    Spark job; one file keeps the read-side broadcast cheap."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    files: list[str] = []
    idxs: list[int] = []
    for f in sorted(positions):
        ps = positions[f]
        files.extend([f] * len(ps))
        idxs.extend(ps)
    table = pa.table(
        {
            "file": pa.array(files, type=pa.string()),
            "pos": pa.array(idxs, type=pa.int64()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf, compression="zstd")
    fs, jvm = _fs(spark, root)
    fs.mkdirs(_jpath(jvm, root, rel))
    stream = fs.create(_jpath(jvm, root, rel, "positions.parquet"), True)
    try:
        stream.write(bytearray(buf.getvalue()))
    finally:
        stream.close()


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
        # merge-on-read deletes on touched files materialize here
        df = _read_with_deletes(spark, root, touched, parent)
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
        # merge-on-read deletes on touched files materialize here
        target = _read_with_deletes(spark, root, touched, parent)
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
    cluster_mode: str = "linear",
    where: Predicate | None = None,
) -> dict:
    """OPTIMIZE: rewrite the current version's (possibly many small)
    files into one right-sized data dir, committed as a new version —
    bit-identical rows, fewer files. Readers pinned to old versions are
    unaffected; vacuum reclaims the small files once retention allows.
    File count is computed from actual on-disk bytes of the current
    version, so a long append chain of micro-batches collapses to
    ~target-sized files.

    ``where`` scopes the rewrite (Delta's ``OPTIMIZE ... WHERE``):
    only files whose stats may match are rewritten; the rest carry into
    the new version verbatim — on a 100 TB table you compact the hot
    partition's micro-batch debris without touching cold data. Note
    merge-on-read delete entries materialize only for the REWRITTEN
    files; entries on carried files stay active."""
    version = _resolve_version(spark, path, version)
    parent = _load_manifest(spark, path, version)
    all_files, _ = _manifest_files(spark, path, parent)
    if where:
        files, keep = resolve_scan(spark, path, version, where)
    else:
        files, keep = all_files, []
    root = path.rstrip("/")
    fs, jvm = _fs(spark, root)
    total = sum(fs.getFileStatus(_jpath(jvm, root, f)).getLen() for f in files)
    n = max(1, -(-total // max(1, target_file_bytes)))  # ceil-div
    df = (
        _read_with_deletes(spark, root, files, parent)
        if where
        else read_snapshot(spark, path, version=version)
    )
    partition_by = parent.get("partition_by", [])
    if cluster_by:
        # OPTIMIZE + cluster: rewritten files get narrow [min,max]
        # intervals on the clustering columns, re-arming file skipping
        # that a long append chain of unordered batches has eroded
        # (cluster_mode='zorder' = OPTIMIZE ZORDER BY, two columns)
        df = _cluster_for_skipping(df, cluster_by, int(n), cluster_mode)
    elif partition_by:
        # spread within partitions without a global shuffle key collision
        df = df.repartition(int(n), *partition_by)
    else:
        df = df.repartition(int(n))
    new_version = _commit_cow(spark, path, parent, keep, df, "compact")
    return {
        "version": new_version,
        "files_before": len(files),
        "files_kept": len(keep),
        "target_files": int(n),
    }


def set_snapshot_constraints(
    spark: SparkSession,
    path: str,
    not_null: list[str] | None = None,
    check: dict[str, str] | None = None,
) -> int:
    """ADD CONSTRAINT (Delta parity): record NOT NULL columns and named
    CHECK expressions as table metadata. Existing rows are validated
    first — one aggregate scan, the same price Delta pays — so a
    constraint can never be added to data that already violates it.
    Every subsequent append / overwrite / UPDATE / MERGE validates its
    incoming rows before any data file lands. Returns the new version.
    """
    version = _resolve_version(spark, path, None)
    parent = _load_manifest(spark, path, version)
    prev = parent.get("constraints", {})
    cons = {
        "not_null": sorted(set(prev.get("not_null", [])) | set(not_null or [])),
        "check": {**prev.get("check", {}), **(check or {})},
    }
    _validate_constraints(read_snapshot(spark, path, version=version), cons)

    def mutate(manifest: dict, v: int) -> None:
        manifest["constraints"] = cons

    return _commit_metadata(spark, path, parent, mutate, "set_constraints")


def drop_snapshot_constraints(
    spark: SparkSession,
    path: str,
    not_null: list[str] | None = None,
    check_names: list[str] | None = None,
) -> int:
    """DROP CONSTRAINT: metadata-only commit removing the named
    constraints; future writes stop validating them."""
    parent = _load_manifest(spark, path, _resolve_version(spark, path, None))
    prev = parent.get("constraints", {"not_null": [], "check": {}})
    cons = {
        "not_null": [c for c in prev.get("not_null", []) if c not in set(not_null or [])],
        "check": {
            n: e for n, e in prev.get("check", {}).items()
            if n not in set(check_names or [])
        },
    }

    def mutate(manifest: dict, v: int) -> None:
        manifest["constraints"] = cons

    return _commit_metadata(
        spark, path, parent, mutate, "drop_constraints", on_log_advance="rebase"
    )


def set_snapshot_properties(
    spark: SparkSession, path: str, properties: dict[str, str]
) -> int:
    """SET TBLPROPERTIES (round 12, VERDICT r11 #6): a metadata-only
    commit merging free-form table properties into the manifest. They
    ride every subsequent commit (like constraints), and
    :func:`~azure_etl_spark.sources.delta_export.export_delta_log`
    emits them into the Delta metaData configuration — so
    engine-recognised keys (``delta.checkpointPolicy=v2``) and
    user/team annotations survive the interop boundary both ways.
    Returns the new version."""
    parent = _load_manifest(spark, path, _resolve_version(spark, path, None))
    props = {
        **parent.get("properties", {}),
        **{str(k): str(v) for k, v in (properties or {}).items()},
    }

    def mutate(manifest: dict, v: int) -> None:
        manifest["properties"] = props

    return _commit_metadata(
        spark, path, parent, mutate, "set_properties", on_log_advance="rebase"
    )


def unset_snapshot_properties(
    spark: SparkSession, path: str, keys: list[str]
) -> int:
    """UNSET TBLPROPERTIES: metadata-only commit removing the named
    properties; unknown keys are ignored (Delta's IF EXISTS shape)."""
    parent = _load_manifest(spark, path, _resolve_version(spark, path, None))
    drop = set(keys or [])
    props = {
        k: v for k, v in parent.get("properties", {}).items() if k not in drop
    }

    def mutate(manifest: dict, v: int) -> None:
        if props:
            manifest["properties"] = props
        elif "properties" in manifest:
            del manifest["properties"]

    return _commit_metadata(
        spark, path, parent, mutate, "unset_properties", on_log_advance="rebase"
    )


def snapshot_table_properties(
    spark: SparkSession, path: str, version: int | None = None
) -> dict[str, str]:
    """SHOW TBLPROPERTIES: the table's free-form properties at
    ``version`` (default: latest)."""
    parent = _load_manifest(spark, path, _resolve_version(spark, path, version))
    return dict(parent.get("properties", {}))


def restore_snapshot(spark: SparkSession, path: str, to_version: int) -> dict:
    """RESTORE TABLE TO VERSION N (Delta parity): commit a NEW version
    whose manifest reproduces version N's data references, stats, and
    merge-on-read entries — the rollback is itself a commit, so history
    is preserved, time travel still reaches the rolled-back versions
    until vacuum, and concurrent readers are unaffected. No data is
    copied: the restore is O(manifest) at any table size.

    Streaming-transaction watermarks (``txns``) are taken from the
    CURRENT version, not the restored one — an exactly-once sink must
    not regress its seen-batch map, or a replayed micro-batch would
    double-commit after a restore."""
    cur = _load_manifest(spark, path, _resolve_version(spark, path, None))
    target = _load_manifest(spark, path, to_version)  # raises if vacuumed

    def mutate(manifest: dict, v: int) -> None:
        manifest["txns"] = dict(cur.get("txns", {}))
        # constraints are current table metadata, not part of the
        # restored data state
        if "constraints" in cur:
            manifest["constraints"] = cur["constraints"]
        elif "constraints" in manifest:
            del manifest["constraints"]
        if "properties" in cur:
            manifest["properties"] = cur["properties"]
        elif "properties" in manifest:
            del manifest["properties"]

    new_version = _commit_metadata(
        spark, path, target, mutate, "restore", on_log_advance="ignore"
    )
    return {"version": new_version, "restored_to": to_version}


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


def vacuum_snapshots(
    spark: SparkSession, path: str, keep_last: int = 2, min_age_s: float = 60.0
) -> list[int]:
    """Drop manifests and data dirs of all but the ``keep_last`` newest
    versions, plus orphan data dirs no retained manifest references
    (crashed or race-losing writers). Returns removed version numbers.

    Data dirs still referenced by a retained manifest are kept even if
    their own version's manifest is dropped (append chains share dirs).

    Unreferenced debris (stats sidecars, orphan data dirs, orphan
    delete-key dirs) is only reclaimed once older than ``min_age_s`` on
    the FILESYSTEM'S clock (:func:`_fs_now_ms`, the same guard as
    :func:`repair_snapshot_log`): an in-flight writer stages its data
    dir and stats sidecar BEFORE committing its manifest, so a
    zero-age vacuum racing that window would delete the sidecar and
    leave the subsequently committed manifest with a dangling
    stats_ref. A live writer publishes within milliseconds; anything
    unreferenced after a minute is a genuine orphan. Pass
    ``min_age_s=0.0`` only when no concurrent writer can exist
    (tests, single-writer maintenance windows).
    """
    versions = _list_versions(spark, path)
    if len(versions) <= keep_last:
        keep = set(versions)
    else:
        keep = set(versions[-keep_last:])
    referenced: set[str] = set()
    referenced_deletes: set[str] = set()
    referenced_refs: set[str] = set()
    for v in keep:
        m = _load_manifest(spark, path, v)
        referenced.update(m["data_dirs"])
        # COW manifests reference individual untouched files inside old
        # version dirs — those dirs must survive vacuum too
        referenced.update(_base_dir_of(f) for f in m.get("data_files", []))
        # merge-on-read equality-delete key files a retained manifest
        # still applies at read time
        referenced_deletes.update(
            e[k]
            for e in m.get("deletes", [])
            for k in ("keys_dir", "positions_dir")
            if k in e
        )
        # stats sidecars / checkpoints a retained manifest still loads
        referenced_refs.update(m.get("stats_refs", []))
    # write-audit-publish stages (round 8): a staged-but-unpublished
    # commit's data dirs and stats refs are live — the stage is
    # reclaimed explicitly via discard_staged_commit, never by vacuum
    for staged in _list_staged(spark, path):
        referenced.update(staged.get("data_dirs", []))
        referenced_refs.update(staged.get("stats_refs", []))
    fs, jvm = _fs(spark, path)
    removed = [v for v in versions if v not in keep]
    for v in removed:
        fs.delete(_jpath(jvm, path, MANIFEST_DIR, f"v{v}.json"), False)
    now_ms = _fs_now_ms(spark, path, fs, jvm) if min_age_s > 0 else 0.0

    def _aged(st) -> bool:
        if min_age_s <= 0:
            return True
        return now_ms - float(st.getModificationTime()) >= min_age_s * 1000.0

    # stats sidecars no retained manifest references (dropped versions,
    # race losers, pre-checkpoint debris)
    mdir = _jpath(jvm, path, MANIFEST_DIR)
    if fs.exists(mdir):
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if (
                name.startswith(_STATS_REF_PREFIX)
                and name not in referenced_refs
                and _aged(st)
            ):
                fs.delete(st.getPath(), False)
    ddir = _jpath(jvm, path, DATA_DIR)
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            rel = f"{DATA_DIR}/{st.getPath().getName()}"
            if rel not in referenced and _aged(st):
                fs.delete(st.getPath(), True)
    deldir = _jpath(jvm, path, DELETES_DIR)
    if fs.exists(deldir):
        for st in fs.listStatus(deldir):
            rel = f"{DELETES_DIR}/{st.getPath().getName()}"
            if rel not in referenced_deletes and _aged(st):
                fs.delete(st.getPath(), True)
    return removed


def is_snapshot_table(spark: SparkSession, path: str) -> bool:
    fs, jvm = _fs(spark, path)
    return fs.exists(_jpath(jvm, path, MANIFEST_DIR))


def _fs_now_ms(spark: SparkSession, path: str, fs, jvm) -> float:
    """The filesystem's idea of "now": mtime of a just-touched probe
    file. Comparing claim ages against this (instead of driver
    ``time.time()``) makes the repair age guard immune to driver/FS
    clock skew. Falls back to driver time if the probe can't be
    written (read-only mount) — the documented assumption then is
    clock alignment within ``min_age_s``."""
    probe = _jpath(jvm, path, MANIFEST_DIR, f".now-probe-{uuid.uuid4().hex[:8]}")
    try:
        fs.mkdirs(_jpath(jvm, path, MANIFEST_DIR))
        fs.create(probe, True).close()
        try:
            return float(fs.getFileStatus(probe).getModificationTime())
        finally:
            fs.delete(probe, False)
    except Exception:
        return time.time() * 1000.0


def repair_snapshot_log(
    spark: SparkSession, path: str, min_age_s: float = 60.0
) -> list[int]:
    """Remove claimed-but-never-published manifests left by crashed
    writers, un-sticking the log.

    A writer that dies between claiming ``v{N}.json`` and publishing its
    JSON leaves an empty (or truncated) manifest: every subsequent
    writer lists v{N}, tries to parent on it, and fails — the log is
    wedged until the claim is removed (Delta has the same failure shape;
    its recovery is also log surgery). A claim is repairable only when
    its content does not parse AND its modification time is older than
    ``min_age_s`` — a live writer publishes within milliseconds, so the
    age guard keeps repair from racing an in-flight commit. Returns the
    removed version numbers; orphaned attempt dirs are left for
    :func:`vacuum_snapshots`.

    "Now" comes from the FILESYSTEM'S clock (:func:`_fs_now_ms`), not
    the driver's — with driver/FS clock skew, driver ``time.time()``
    could make a live in-flight claim look older than ``min_age_s``
    and get destructively mis-repaired. Probe and claims age on the
    same clock, so skew cancels out.
    """
    fs, jvm = _fs(spark, path)
    removed: list[int] = []
    now_ms = _fs_now_ms(spark, path, fs, jvm)
    for v in _list_versions(spark, path):
        mpath = _jpath(jvm, path, MANIFEST_DIR, f"v{v}.json")
        try:
            content = _read_small_file(jvm, fs, mpath)
            json.loads(content.decode("utf-8"))
            continue  # published fine
        except Exception:
            pass
        age_ms = now_ms - fs.getFileStatus(mpath).getModificationTime()
        if age_ms >= min_age_s * 1000.0:
            fs.delete(mpath, False)
            removed.append(v)
    return removed


def convert_to_snapshot(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    collect_stats: bool = True,
) -> int:
    """Adopt the snapshot format IN PLACE over an existing parquet
    directory — the ``CONVERT TO DELTA`` migration story.

    The directory's children (part files, or Hive ``col=val`` partition
    subdirs — pass ``partition_by`` so readers re-derive the columns)
    are RENAMED under an attempt-unique ``data/v0-{token}`` dir: renames
    are O(metadata) on HDFS/ABFS-with-HNS/local, so converting a 100 TB
    table costs a directory listing plus (optionally) one stats pass —
    no data is read or rewritten unless stats are requested. Commit is
    the same atomic manifest create every writer uses; version 0 then
    behaves like any committed snapshot (time travel, DML, vacuum).

    Like Delta's CONVERT, this is a single-administrator operation: it
    refuses to run on an existing snapshot table, and a lost commit
    race (a writer slipped in mid-convert) raises rather than guess.
    """
    if is_snapshot_table(spark, path):
        raise SnapshotConflictError(f"{path} is already a snapshot table")
    fs, jvm = _fs(spark, path)
    root = path.rstrip("/")
    rootp = _jpath(jvm, root)
    if not fs.exists(rootp):
        raise SnapshotVersionError(f"nothing to convert at {path}")
    data_rel = f"{DATA_DIR}/v0-{uuid.uuid4().hex[:8]}"
    target = _jpath(jvm, root, data_rel)
    fs.mkdirs(target)
    moved = 0
    for st in fs.listStatus(rootp):
        name = st.getPath().getName()
        if name in (DATA_DIR, MANIFEST_DIR, DELETES_DIR) or name.startswith(
            ("_", ".")
        ):
            continue
        if not fs.rename(st.getPath(), _jpath(jvm, root, data_rel, name)):
            raise SnapshotConflictError(
                f"convert: rename of {name} under {path} failed — "
                "concurrent modification during convert?"
            )
        moved += 1
    if moved == 0:
        fs.delete(target, True)
        raise SnapshotVersionError(f"no parquet content to convert at {path}")
    df = spark.read.option("basePath", f"{root}/{data_rel}").parquet(
        f"{root}/{data_rel}"
    )
    stats = (
        _collect_file_stats(spark, root, data_rel, bloom=None)
        if collect_stats
        else {}
    )
    manifest = {
        "version": 0,
        "mode": "convert",
        "data_dirs": [data_rel],
        "data_files": [],
        "partition_by": list(partition_by or []),
        "committed_at_unix": time.time(),
        "stats": {},
        "stats_refs": [_write_stats_ref(spark, path, stats)] if stats else [],
        "txns": {},
        "deletes": [],
        "columns": list(df.columns),
    }
    if not _try_commit_manifest(spark, path, 0, manifest):
        raise SnapshotConflictError(
            f"convert: version 0 appeared at {path} mid-convert; the moved "
            f"data is intact under {data_rel} — recover manually"
        )
    return 0


# ---------------------------------------------- write-audit-publish (round 8)

_STAGED_PREFIX = "staged-"


def _staged_name(stage_id: str) -> str:
    return f"{_STAGED_PREFIX}{stage_id}.json"


def _list_staged(spark: SparkSession, path: str) -> list[dict]:
    """All pending staged-commit manifests (empty if none) — read by
    vacuum to keep staged data dirs/stats alive until an explicit
    publish or discard resolves them."""
    fs, jvm = _fs(spark, path)
    mdir = _jpath(jvm, path, MANIFEST_DIR)
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith(_STAGED_PREFIX) and name.endswith(".json"):
            try:
                raw = _read_small_file(jvm, fs, st.getPath())
                out.append(json.loads(raw.decode("utf-8")))
            except Exception:
                # the marker vanished between list and read (a racing
                # publish adopted it / a racing discard dropped it) or
                # is mid-write: skip — published dirs are now
                # manifest-referenced, discarded dirs are gone, and a
                # mid-write stage's fresh dirs ride the vacuum age
                # guard (markers are write-once, so an unreadable one
                # is always one of those three)
                continue
    return out


def _load_staged(spark: SparkSession, path: str, stage_id: str) -> dict:
    fs, jvm = _fs(spark, path)
    mpath = _jpath(jvm, path, MANIFEST_DIR, _staged_name(stage_id))
    if not fs.exists(mpath):
        raise SnapshotVersionError(
            f"no staged commit {stage_id!r} at {path} (published or discarded?)"
        )
    return json.loads(_read_small_file(jvm, fs, mpath).decode("utf-8"))


def stage_snapshot_commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    collect_stats: bool = True,
) -> str:
    """Write-audit-publish stage 1 (the Iceberg WAP / Delta-branch
    operational pattern, round 8): land ``df``'s files and stats under
    the table WITHOUT committing a version — readers cannot see them
    (``_list_versions`` only resolves ``vN.json`` manifests; the staged
    marker is a ``staged-<id>.json`` sidecar). Returns the ``stage_id``
    handle for :func:`read_staged_snapshot` (audit),
    :func:`publish_staged_commit` (atomically make it version N+1) and
    :func:`discard_staged_commit` (drop it as if it never happened).

    The staged data dir is ``data/stage-<id>`` — attempt-unique, kept
    alive by vacuum via the staged marker (reclaim is an EXPLICIT
    discard, never an age-out), and adopted verbatim by publish: the
    data is written ONCE; audit and publish are manifest-sized
    operations (O(1) in table data — the whole point at 100 TB, where
    re-writing a validated batch would double the ingest cost).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"stage mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    stage_id = uuid.uuid4().hex[:12]
    data_rel = f"{DATA_DIR}/stage-{stage_id}"
    root = path.rstrip("/")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{root}/{data_rel}")
    stats_refs: list[str] = []
    if collect_stats:
        # honor the table's bloom config so published files keep
        # equality-skipping parity with directly-written ones
        versions = _list_versions(spark, path)
        bloom_cfg = (
            _load_manifest(spark, path, versions[-1]).get("bloom")
            if versions
            else None
        )
        new_stats = _collect_file_stats(spark, root, data_rel, bloom=bloom_cfg)
        if new_stats:
            stats_refs = [_write_stats_ref(spark, path, new_stats)]
    staged = {
        "stage_id": stage_id,
        "mode": mode,
        "data_dirs": [data_rel],
        "partition_by": list(partition_by or []),
        "stats_refs": stats_refs,
        "columns": list(df.columns),
        "staged_at_unix": time.time(),
    }
    _write_ref_bytes(
        spark,
        path,
        _staged_name(stage_id),
        json.dumps(staged, sort_keys=True).encode("utf-8"),
    )
    return stage_id


def read_staged_snapshot(
    spark: SparkSession, path: str, stage_id: str
) -> DataFrame:
    """The AUDIT view: the table exactly as it would read if the staged
    commit published right now — staged rows alone for an ``overwrite``
    stage (or a first commit), current table plus staged rows for an
    ``append`` stage. Run expectations against this frame; readers of
    :func:`read_snapshot` still see nothing."""
    staged = _load_staged(spark, path, stage_id)
    root = path.rstrip("/")
    new = spark.read.parquet(*[f"{root}/{d}" for d in staged["data_dirs"]])
    if staged["mode"] == "overwrite" or not _list_versions(spark, path):
        return new
    return read_snapshot(spark, path).unionByName(new, allowMissingColumns=True)


def publish_staged_commit(
    spark: SparkSession,
    path: str,
    stage_id: str,
    expectations: dict | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    max_retries: int = 5,
) -> int:
    """Write-audit-publish stage 3: atomically commit the staged files
    as the next table version — the staged data dir is adopted verbatim
    (no rewrite), so publish is O(manifest).

    ``expectations`` (name -> boolean Column, the
    operators/quality.split_expectations rules) are the AUDIT gate: any
    violating row in the as-if-published view raises
    :class:`SnapshotConstraintError` with per-rule counts and leaves
    the stage INTACT for inspection (discard or fix-and-restage —
    readers never saw anything either way). Table constraints recorded
    in the manifest are enforced on the staged rows regardless, exactly
    as :func:`write_snapshot` enforces them on direct writes.

    Publishing runs the same optimistic-concurrency loop as
    :func:`write_snapshot`: the parent re-resolves inside the retry,
    txn ledger replays return -1, appends re-check schema drift against
    the CURRENT tip each attempt — a staged append can race direct
    writers and other publishers safely (probed by
    tools/snapshot_race_probe.py's stage+publish writer)."""
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")
    staged = _load_staged(spark, path, stage_id)
    mode = staged["mode"]
    root = path.rstrip("/")
    if expectations:
        from azure_etl_spark.operators.quality import flag_expectations

        viol = (
            flag_expectations(
                read_staged_snapshot(spark, path, stage_id), expectations
            )
            .select(F.explode("__violations").alias("rule"))
            .groupBy("rule")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        if viol:
            counts = {r["rule"]: r["n"] for r in viol}
            raise SnapshotConstraintError(
                f"audit failed for staged commit {stage_id} at {path}: "
                f"violations per rule {counts}; stage left intact "
                "(discard_staged_commit to drop it)"
            )
    staged_df = spark.read.parquet(*[f"{root}/{d}" for d in staged["data_dirs"]])
    validated = False
    for _ in range(max_retries):
        versions = _list_versions(spark, path)
        parent = _load_manifest(spark, path, versions[-1]) if versions else None
        txns = dict(parent.get("txns", {})) if parent else {}
        if txn_app_id is not None and txns.get(txn_app_id, -1) >= txn_version:
            return -1  # replayed publish: already durable
        if not validated and parent is not None:
            _validate_constraints(staged_df, parent.get("constraints"))
            validated = True
        if mode == "append" and parent is not None and "columns" in parent:
            drift = set(staged["columns"]) ^ set(parent["columns"])
            if drift:
                raise ValueError(
                    f"staged append schema drift {sorted(drift)} vs table "
                    f"columns {parent['columns']}"
                )
        version = (versions[-1] + 1) if versions else 0
        dirs = list(staged["data_dirs"])
        carried_files: list[str] = []
        stats: dict[str, dict] = {}
        stats_refs = list(staged.get("stats_refs", []))
        deletes: list[dict] = []
        if mode == "append" and parent is not None:
            dirs = parent["data_dirs"] + dirs
            carried_files = list(parent.get("data_files", []))
            stats = dict(parent.get("stats", {}))
            stats_refs = parent.get("stats_refs", []) + stats_refs
            deletes = [dict(e) for e in parent.get("deletes", [])]
        if txn_app_id is not None:
            txns[txn_app_id] = txn_version
        columns = list(staged["columns"])
        if mode == "append" and parent is not None and "columns" in parent:
            columns = parent["columns"]
        partition_by = staged.get("partition_by", [])
        if mode == "append" and parent is not None:
            partition_by = parent.get("partition_by", [])
        manifest = {
            "version": version,
            "mode": mode,
            "operation": "wap_publish",
            "data_dirs": dirs,
            "data_files": carried_files,
            "partition_by": partition_by,
            "committed_at_unix": time.time(),
            "stats": stats,
            "stats_refs": stats_refs,
            "txns": txns,
            "deletes": deletes,
            "columns": columns,
            **(
                {"bloom": parent["bloom"]}
                if parent is not None and parent.get("bloom")
                else {}
            ),
            **(
                {"constraints": parent["constraints"]}
                if parent is not None and "constraints" in parent
                else {}
            ),
            **(
                {"properties": parent["properties"]}
                if parent is not None and "properties" in parent
                else {}
            ),
        }
        _maybe_checkpoint_stats(spark, path, manifest)
        if _try_commit_manifest(spark, path, version, manifest):
            # the staged marker's job is done; its dirs are now
            # manifest-referenced (marker removal is non-critical: a
            # crash here leaves a stale marker whose dirs vacuum keeps
            # anyway, and a re-publish of it would conflict on txns or
            # produce a duplicate append the caller's txn ids prevent)
            fs, jvm = _fs(spark, path)
            fs.delete(_jpath(jvm, path, MANIFEST_DIR, _staged_name(stage_id)), False)
            return version
    raise SnapshotConflictError(
        f"lost the manifest-create race {max_retries} times publishing "
        f"stage {stage_id} at {path}"
    )


def discard_staged_commit(spark: SparkSession, path: str, stage_id: str) -> None:
    """Drop a staged commit as if it never happened: its data dirs,
    stats sidecars, and the staged marker. Readers never saw any of it
    (that is the WAP contract); the marker goes LAST so a crash
    mid-discard leaves debris that is still explicitly discardable,
    never a marker pointing at deleted data adopted by a publish."""
    staged = _load_staged(spark, path, stage_id)
    fs, jvm = _fs(spark, path)
    for d in staged.get("data_dirs", []):
        fs.delete(_jpath(jvm, path, d), True)
    for ref in staged.get("stats_refs", []):
        fs.delete(_jpath(jvm, path, MANIFEST_DIR, ref), False)
    fs.delete(_jpath(jvm, path, MANIFEST_DIR, _staged_name(stage_id)), False)
