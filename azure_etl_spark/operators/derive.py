"""Derived-column operators (SURVEY.md §2.3 P4-P7).

Reference parity:
- P4 arithmetic expr column   (silverToGold.scala:16)
- P5 date-part stamping       (silverToGold.scala:17-19)
- P6 cast-all narrowing       (goldToCosmosdb.scala:27-33, goldToSynapse.scala:28-34)
- P7 synthetic unique id      (goldToCosmosdb.scala:26)

The reference stamps ``current_date()`` which is run-dependent; we take an
explicit ``as_of`` parameter (default: today) so results are
oracle-checkable and backfills are reproducible.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_expr(df: DataFrame, name: str, expr: str) -> DataFrame:
    """P4: ``withColumn(name, expr(...))`` — stays inside codegen."""
    return df.withColumn(name, F.expr(expr))


def stamp_date_parts(
    df: DataFrame,
    as_of: _dt.date | None = None,
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
) -> DataFrame:
    """P5: add year/month/day columns of the processing date.

    With a literal ``as_of`` these fold to constants at plan time
    (ConstantFolding), so they cost nothing per-row at any scale.
    """
    d = F.lit(as_of) if as_of is not None else F.current_date()
    return (
        df.withColumn(year_col, F.year(d))
        .withColumn(month_col, F.month(d))
        .withColumn(day_col, F.dayofmonth(d))
    )


def cast_all(df: DataFrame, dtype: str = "string") -> DataFrame:
    """P6: cast every column to ``dtype`` (the serving-layer narrowing)."""
    return df.select([F.col(c).cast(dtype).alias(c) for c in df.columns])


def add_id(df: DataFrame, name: str = "id", deterministic_order: list[str] | None = None) -> DataFrame:
    """P7: synthetic unique id.

    Default is ``monotonically_increasing_id`` — embarrassingly parallel,
    the right choice at 100 TB (no shuffle, no global coordination).
    ``deterministic_order`` switches to ``row_number() over (order by ...)``
    which IS a single global sort + unpartitioned window — only for small
    serving outputs or oracle-checked tests.
    """
    if deterministic_order is None:
        return df.withColumn(name, F.monotonically_increasing_id())
    w = Window.orderBy(*[F.col(c) for c in deterministic_order])
    return df.withColumn(name, F.row_number().over(w) - F.lit(1))
