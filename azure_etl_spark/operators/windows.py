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


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event in the partition exceeds ``gap_seconds``.

    Classic two-window composition: lag -> boundary flag -> running sum.
    One shuffle on the partition key serves both windows (same
    partitioning+ordering, Catalyst reuses the sort). Scale: state is
    per-row arithmetic, any number of users.
    """
    order_cols = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("long") - prev_ts.cast("long")) > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(*partition_by).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_sess).withColumn(
        session_col, F.sum("__new").over(running)
    ).drop("__new")


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


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    order_cols: Sequence[str],
    valid_from_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log: keep
    only rows where ``attr_col`` changed (per key, in ``order_cols``
    order), stamp each surviving row with ``valid_from`` (its own order
    column), ``valid_to`` (the next change's, NULL while current) and
    ``is_current``.

    Two windows over the SAME partitioning+ordering (lag to detect
    change, lead to close the interval), so one shuffle on the key
    serves both. The change filter runs between them, shrinking the
    second window's input to change points only. Scale: per-key state is
    one row of lookback — any number of keys, any history length.
    """
    vf = valid_from_col or order_cols[0]
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = df.withColumn("__prev", F.lag(attr_col).over(w)).filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col))
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(vf))
        .withColumn("valid_to", F.lead(vf).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__prev")
    )


def ewma_bounded(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value: str,
    alpha: float = 0.5,
    depth: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over a bounded lookback:
    ``ewma_i = sum_k w_k * x_{i-k} / sum_k w_k`` with ``w_k =
    alpha*(1-alpha)^k`` over the last ``depth`` rows (missing/null lags
    drop out of both numerator and denominator).

    The unbounded recursive EWMA needs ``(1-alpha)^(-rownum)`` scaling
    that overflows doubles on long partitions; the bounded form is the
    numerically-safe streaming-friendly variant (weights below
    ``alpha*(1-alpha)^depth`` are negligible anyway) and is pure lag
    arithmetic — one shuffle on the partition key, identical
    expression order on any engine, so it is oracle-checkable.
    """
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(depth):
        wk = alpha * (1.0 - alpha) ** k
        lagged = F.lag(F.col(value), k).over(w)
        num = num + F.coalesce(lagged * F.lit(wk), F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(wk)).otherwise(F.lit(0.0))
    return df.withColumn(
        out_col, F.when(den == 0.0, F.lit(None)).otherwise(num / den)
    )


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    out_col: str = "value_filled",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Linear interpolation of NULL gaps in a per-key time series.

    For each null, finds the nearest non-null neighbors on both sides
    (``last(..., ignorenulls)`` backward + ``first(..., ignorenulls)``
    forward over the same key partition) and fills
    ``prev + (next-prev) * (t-t_prev)/(t_next-t_prev)``; leading/
    trailing gaps take the single available neighbor. Two window passes
    over ONE partitioning+sort — Spark plans a single Exchange+Sort
    shared by both frames. Complements LOCF gap-fill (step function)
    where a continuous signal should ramp instead.
    """
    t = F.col(ts_col).cast("double")
    v = F.col(value_col)
    order = [ts_col, *tiebreak]  # tiebreak for duplicate timestamps:
    # without it, which neighbor 'last'/'first' sees is partition-order
    # dependent and the fill is nondeterministic
    back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd)
    ramp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_t == prev_t, prev_v)
        .otherwise(ramp)
    )
    return df.withColumn(out_col, filled)
