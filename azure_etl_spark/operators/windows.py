"""Window-function operators (SURVEY.md §2.6).

None in the reference; SURVEY.md notes the gold min/max-per-symbol is
equivalently a window — exposed here plus the general ranked-top-n
pattern.

Scale notes: a window partitioned by a key is one hash shuffle on that
key + per-partition sort; an *unpartitioned* window is a single-task
global sort and must never appear in a 100 TB plan (add_id's
deterministic mode is the only deliberate exception, for small outputs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def over_partition(
    df: DataFrame,
    partition_by: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Per-row analytic aggregates over a partition (no frame => whole
    partition). Example: min/max price over symbol, the window twin of
    silverToGold.scala:12-15."""
    w = Window.partitionBy(*partition_by)
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def ranked_top_n(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-n rows per group via row_number (deterministic if order_by
    includes a unique tiebreaker). One shuffle on the group key; each
    group sorted locally — survives any number of groups."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def lag_lead_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value: str,
    delta_col: str = "delta",
) -> DataFrame:
    """Row-to-previous-row difference within a group (sessionization /
    time-series building block)."""
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(delta_col, F.col(value) - F.lag(value, 1).over(w))
