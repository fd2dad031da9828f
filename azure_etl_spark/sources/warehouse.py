"""K5: staged-copy DW sink.

The reference loads Synapse through the Databricks ``sqldw`` connector:
Spark writes parquet to a Gen2 ``tempDir``, the warehouse bulk-ingests
from there (goldToSynapse.scala:10-12,39-46). The engine exposes that
pattern explicitly:

- ``write_warehouse(mode="direct")``  -> plain ``df.write.jdbc`` batched
  inserts (fine for small serving tables);
- ``write_warehouse(mode="staged")``  -> write parquet to ``temp_dir``
  (parallel, no JDBC bottleneck) and return the staged path + the COPY
  statement for the warehouse to execute. At 100 TB staged copy is the
  only viable route: the cluster writes N files in parallel and the MPP
  warehouse ingests files, not rows.

Without a JDBC driver or warehouse offline, ``mode="staged"`` is fully
testable (parquet + generated COPY DDL); ``direct`` delegates to
sources/jdbc.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from azure_etl_spark.sources.files import write_parquet
from azure_etl_spark.sources.jdbc import write_jdbc


@dataclass
class StagedCopy:
    staged_path: str
    table: str
    copy_sql: str


def staged_copy_sql(table: str, staged_path: str, fmt: str = "PARQUET") -> str:
    """T-SQL COPY INTO the connector issues behind the scenes."""
    return (
        f"COPY INTO {table} FROM '{staged_path}' "
        f"WITH (FILE_TYPE = '{fmt}', AUTO_CREATE_TABLE = 'OFF')"
    )


def write_warehouse(
    df: DataFrame,
    table: str,
    mode: str = "staged",
    url: str | None = None,
    temp_dir: str | None = None,
    jdbc_mode: str = "append",
    **options,
) -> StagedCopy | None:
    if mode == "direct":
        if url is None:
            raise ValueError("direct mode needs a JDBC url")
        write_jdbc(df, url, table, mode=jdbc_mode, **options)
        return None
    if mode == "staged":
        if temp_dir is None:
            raise ValueError("staged mode needs temp_dir")
        staged = f"{temp_dir.rstrip('/')}/{table}"
        write_parquet(df, staged, mode="overwrite")
        return StagedCopy(staged, table, staged_copy_sql(table, staged))
    raise ValueError(f"unknown warehouse write mode: {mode}")
