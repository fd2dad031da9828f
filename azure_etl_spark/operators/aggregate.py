"""Aggregation operators (SURVEY.md §2.5).

Reference parity:
- A1 grouped min/max        (silverToGold.scala:12-15)
- A4 micro-batch union      (etl-vini-azure.py:75,77)
Plus the general grouped-agg surface (sum/count/avg/cube/rollup/approx)
that comes free with Spark and is exercised by the TPC-H-ish tests.

Scale notes: ``groupBy(...).agg(...)`` plans a partial (map-side)
HashAggregate before the shuffle, so the shuffle carries one row per
(partition, key) — at 100 TB with low-cardinality keys (the reference's
5 crypto symbols; lineitem's returnflag/linestatus) the shuffle is tiny
regardless of input size. Nothing to hand-tune; AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_min_max(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    min_alias: str | None = None,
    max_alias: str | None = None,
) -> DataFrame:
    """A1: the reference's gold aggregation, generalized to any key/value."""
    min_alias = min_alias or f"min_{value}"
    max_alias = max_alias or f"max_{value}"
    return df.groupBy(*keys).agg(
        F.min(value).alias(min_alias), F.max(value).alias(max_alias)
    )


def grouped_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """General grouped aggregation with pre-aliased agg columns."""
    return df.groupBy(*keys).agg(*aggs)


def union_all(dfs: Iterable[DataFrame]) -> DataFrame:
    """A4: union of micro-batches/snapshots, by column name.

    ``unionByName`` keeps this safe under column-order drift between
    batches; Spark unions are metadata-only (no shuffle).
    """
    return reduce(DataFrame.unionByName, dfs)
