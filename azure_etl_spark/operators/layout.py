"""Physical-layout operators: sort-based data skipping and Z-ordering.

Parquet/ORC store per-row-group min/max statistics; readers (Spark's
parquet filter pushdown, and every lakehouse engine) skip row groups
whose stats exclude the predicate. The stats are only selective if the
write is CLUSTERED on the filter columns — an unsorted 100 TB table has
every row group spanning the whole key range, so nothing skips and a
point query scans the table.

- ``sort_for_skipping``: range-sort on the filter column(s) before
  writing — one-dimensional clustering; row-group ranges become
  disjoint, point/range filters touch O(result) groups.
- ``morton_key``: bit-interleaved (Z-order) composite of two bucketized
  columns — the standard multi-dimensional clustering trick (used by
  Delta OPTIMIZE ZORDER, Iceberg sort orders): sorting by the Morton
  code keeps BOTH dimensions' ranges narrow within each row group, so
  filters on either column (or both) skip, where sorting by ``(a, b)``
  only skips on ``a``.

Tests verify both against actual parquet footer statistics (pyarrow).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_for_skipping(df: DataFrame, cols: Sequence[str], partitions: int | None = None) -> DataFrame:
    """Range-repartition + in-partition sort on ``cols`` so parquet
    row-group stats become selective for those columns. ``repartitionByRange``
    + ``sortWithinPartitions`` (NOT a global ``orderBy``): tasks stay
    parallel and no single-partition sort materializes."""
    parts = [F.col(c) for c in cols]
    rp = df.repartitionByRange(partitions, *parts) if partitions else df.repartitionByRange(*parts)
    return rp.sortWithinPartitions(*parts)


def _spread16(c: Column) -> Column:
    """Spread a 16-bit int's bits to even positions (0bxyz -> 0bx0y0z0...).
    Column ``|``/``&`` are BOOLEAN operators in PySpark — bitwise ops go
    through ``bitwiseOR``/``bitwiseAND``."""
    x = c.cast("bigint")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(x_bucket: Column, y_bucket: Column) -> Column:
    """Z-order (Morton) code of two 16-bit bucket ids: interleaves their
    bits so Z-sorted data is clustered in BOTH dimensions. Buckets must
    be in [0, 65535] — compute them with ``width_bucket``/``ntile``/
    scaling against known min/max. Pure bit arithmetic under codegen."""
    return _spread16(x_bucket).bitwiseOR(F.shiftleft(_spread16(y_bucket), 1))


def zorder_for_skipping(
    df: DataFrame, cols: Sequence[str], partitions: int | None = None
) -> DataFrame:
    """Two-dimensional clustering (Delta's OPTIMIZE ZORDER BY (a, b)):
    bucketize both columns to 16 bits against their actual min/max (one
    lightweight agg, driver-side bounds), interleave with
    :func:`morton_key`, then range-sort on the Morton code. Every
    written file then covers a narrow rectangle in (a, b) space, so
    per-file min/max stats skip on EITHER column — where a linear sort
    on (a, b) only ever skips on ``a`` (the secondary column's range
    spans the whole domain in every file).

    Columns must be numeric/date/timestamp (bucketization needs an
    order-preserving cast to double); cluster strings with
    :func:`sort_for_skipping` or pre-bucket them yourself. Nulls sort
    into bucket 0. Scale: the bounds agg is one column-pruned pass; the
    Z-sort is the same single range-shuffle a linear clustered write
    already pays — Z-ordering changes the sort KEY, not the plan shape.
    """
    if len(cols) != 2:
        raise ValueError(f"zorder_for_skipping takes exactly 2 columns, got {list(cols)}")

    def as_num(c: str) -> Column:
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if dt == "date":
            col = F.datediff(col, F.lit("1970-01-01"))
        elif dt.startswith("timestamp"):
            col = F.unix_timestamp(col)
        elif dt == "string":
            raise ValueError(
                f"zorder column {c!r} is a string; bucketize it first or "
                "use sort_for_skipping"
            )
        return col.cast("double")

    nx, ny = (as_num(c) for c in cols)
    b = df.agg(
        F.min(nx).alias("x_lo"), F.max(nx).alias("x_hi"),
        F.min(ny).alias("y_lo"), F.max(ny).alias("y_hi"),
    ).collect()[0]

    def bucket(col: Column, lo, hi) -> Column:
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("bigint")
        scaled = F.floor((col - F.lit(float(lo))) / F.lit(float(hi - lo)) * 65535)
        return F.coalesce(
            F.least(F.lit(65535), F.greatest(F.lit(0), scaled)), F.lit(0)
        ).cast("bigint")

    tmp = "__zorder_key"
    out = df.withColumn(tmp, morton_key(bucket(nx, b["x_lo"], b["x_hi"]),
                                        bucket(ny, b["y_lo"], b["y_hi"])))
    return sort_for_skipping(out, [tmp], partitions).drop(tmp)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (hash-clustered) catalog table.

    Two tables written with the SAME bucket count and key join with
    ZERO shuffle: Spark's scan reports HashPartitioning(key, n), so the
    SortMergeJoin's Exchange requirement is already satisfied and each
    task merges bucket i of both tables (with ``sort_cols`` the
    per-bucket sort is also free). At 100 TB this turns the dominant
    cost of a recurring fact/dim join into a one-time layout cost
    amortized over every downstream query — the same trade
    ``sort_for_skipping`` makes for filters, applied to joins. The
    reference has no recurring join (SURVEY.md §2.4 — single-table
    pipeline); this is the engine's scale path for repeated equi-joins.
    Bucketed output requires ``saveAsTable`` (bucket metadata lives in
    the catalog, not the files). ``table`` must be an unqualified name
    in the current database. On overwrite the previous location is
    removed explicitly: with the default in-memory catalog a NEW session
    does not know about a prior run's table, so ``saveAsTable`` alone
    would fail with LOCATION_ALREADY_EXISTS on the leftover directory."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if mode == "overwrite":
        jvm = spark._jvm
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + table.lower())
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(loc, True)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
