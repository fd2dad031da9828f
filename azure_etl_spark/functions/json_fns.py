"""JSON functions (SURVEY.md §2.9 F7 / §2.1 S2).

The reference's ingest decodes Binance JSON with ``pd.read_json``
(etl-vini-azure.py:74); the engine uses ``from_json`` / ``get_json_object``
so decode happens distributed, next to the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def json_get(col: str | Column, path: str) -> Column:
    """Extract one field as string: ``get_json_object(col, '$.path')``."""
    return F.get_json_object(col, f"$.{path}")


def parse_json(df: DataFrame, col: str, schema: StructType | str, out: str = "parsed") -> DataFrame:
    return df.withColumn(out, F.from_json(F.col(col), schema))
