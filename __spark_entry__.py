"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``azure_etl_spark.plans.queries`` — the engine's named
query registry. Each registry entry pairs a PySpark builder with the
equivalent DuckDB oracle SQL (or None for non-SQL-expressible ops, which
get a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_etl_spark.plans import queries as Q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's gold aggregation
    (silverToGold.scala:11-21) re-expressed Spark-first."""
    return Q.flagship_gold_minmax(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
