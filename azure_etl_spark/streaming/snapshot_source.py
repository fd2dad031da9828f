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
- the first offset snapshots the table's CURRENT version as one initial
  load (all files), then tails subsequent commits.

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
    with open(os.path.join(table, MANIFEST_DIR, f"v{version}.json")) as f:
        return json.load(f)


def _manifest_files(table: str, m: dict) -> list[str]:
    files = list(m.get("data_files", []))
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
    st = m.get("stats", {}).get(rel_file)
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


class _SnapshotFilePartition(InputPartition):
    def __init__(self, abs_path: str, part_values: list[tuple[str, object]]):
        self.abs_path = abs_path
        self.part_values = part_values


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table = options["path"]
        self.ignore_changes = str(options.get("ignorechanges", "false")).lower() == "true"
        self.columns = [f.name for f in schema.fields]
        self.schema = schema

    # -- offsets ------------------------------------------------------
    def initialOffset(self):
        # version -1 = "nothing seen": the first batch loads the whole
        # current version, then the tail follows commits
        return {"version": -1}

    def latestOffset(self):
        vs = _versions(self.table)
        return {"version": vs[-1] if vs else -1}

    def commit(self, end):
        pass

    # -- planning (driver-side) --------------------------------------
    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        if hi <= lo:
            return []
        added: list[tuple[str, list]] = []
        if lo < 0:
            m = _manifest(self.table, hi)
            for f in _manifest_files(self.table, m):
                added.append((f, _partition_constants(m, f)))
        else:
            prev = set(_manifest_files(self.table, _manifest(self.table, lo)))
            for v in range(lo + 1, hi + 1):
                m = _manifest(self.table, v)
                cur = set(_manifest_files(self.table, m))
                if m.get("operation") == "compact":
                    prev = cur  # layout-only: nothing to emit
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
                for f in sorted(cur - prev):
                    added.append((f, _partition_constants(m, f)))
                prev = cur
        return [
            _SnapshotFilePartition(os.path.join(self.table, f), pv)
            for f, pv in added
        ]

    # -- execution (executor-side, Arrow-vectorized) ------------------
    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        tbl = pq.read_table(partition.abs_path)
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
        return from_arrow_schema(pa.schema(ordered))

    def streamReader(self, schema):
        return SnapshotStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(SnapshotTableSource)
