"""S3/K1: JDBC scan + sink.

The reference reads its staging table single-threaded (ADF
`partitionOption: "None"`, resources_2/datafactory.tf:34) and writes it
with a Python row-loop of f-string INSERTs (etl-vini-azure.py:94-104 —
also SQL-injection-prone). The engine replaces both:

- ``read_jdbc``: partitioned parallel scan (partitionColumn/bounds/
  numPartitions) — the single-reader pattern is the first thing that
  dies at scale.
- ``write_jdbc``: Spark's batched, parameterized JDBC writer
  (mode="overwrite" issues the DROP/CREATE the reference hand-rolled).

No JDBC driver jars ship in this container, so tests exercise the
option-assembly logic only; the call surface is stock Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrameReader:
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC scan needs lower_bound/upper_bound/num_partitions"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r


def read_jdbc(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    return jdbc_reader(spark, url, table, **kw).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
