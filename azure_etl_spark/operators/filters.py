"""Filters / projections (SURVEY.md §2.3 P1-P3, §2.7 O1-O2).

Reference parity:
- P1 IN-list filter  (etl-vini-azure.py:78)
- P2/P3 projection   (k8s/prints/query_synapse.png)
- O1 global sort     (bronzeToSilver.scala:9, silverToGold.scala:20)
- O2 top-k / limit   (query_synapse.png SELECT TOP (100))

Scale notes: all of these push into the scan. ``isin`` becomes a parquet
row-group filter (`PushedFilters: [In(symbol, ...)]`); projection prunes
`ReadSchema`. Ordered top-k plans as `TakeOrderedAndProject` — each task
keeps k rows, the driver merges — no global sort at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_isin(df: DataFrame, column: str, values: Sequence) -> DataFrame:
    return df.filter(F.col(column).isin(list(values)))


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    return df.select(*cols)


def sort(df: DataFrame, *cols: str | Column) -> DataFrame:
    """O1: global sort (range-partitioned exchange + per-partition sort)."""
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *order_cols: str | Column) -> DataFrame:
    """O2: ordered top-k. Pass a unique tiebreaker column for
    deterministic results (ties at the k-th row are engine-dependent)."""
    return df.orderBy(*order_cols).limit(k)
