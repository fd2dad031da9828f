"""Source/sink connectors (SURVEY.md §2.1 / §2.2)."""

from azure_etl_spark.sources.files import (
    TABLES,
    load_table,
    load_tables,
    read_parquet,
    write_parquet,
    write_partitioned,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_parquet",
    "write_parquet",
    "write_partitioned",
]
