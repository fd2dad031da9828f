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
