"""Grouped-map normalization via ``applyInPandas``.

Demonstrates the Arrow grouped-map path for per-group logic that is
awkward as window expressions (sklearn-style scalers, per-group model
scoring). Each group arrives as ONE pandas DataFrame, so groups must fit
in executor memory — fine for bounded groups (per event-type, per
language), wrong for unbounded ones; the window-function twin
(``zscore_window``) is the scale-safe default and the correctness oracle
for the pandas path.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_apply_in_pandas(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score ((x - mean) / population std) through the Arrow
    grouped-map path."""
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out_col} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf[out_col] = 0.0 if std == 0 else (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(*keys).applyInPandas(norm, schema=schema)


def zscore_window(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "z"
) -> DataFrame:
    """The built-in twin: same z-score as window expressions — no Python,
    no group-fits-in-memory constraint; preferred at scale."""
    w = Window.partitionBy(*keys)
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    return df.withColumn(
        out_col,
        F.when(std == 0, F.lit(0.0)).otherwise((F.col(value_col) - mean) / std),
    )


def cogrouped_order_reconcile(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Co-grouped Arrow path (``cogroup().applyInPandas``): both sides
    of a key arrive as pandas frames in ONE call — the shape for
    per-entity reconciliation/merge logic that would otherwise need a
    join plus a grouped-map. Sums are integer cents (int64) so the
    result is exact and independent of row order within the group.
    Plan-wise this is one co-partitioned shuffle of both inputs on the
    key — same cost as a shuffle join — and each KEY group must fit in
    memory (fine for per-order lines; wrong for unbounded groups).
    """

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        (orderkey,) = key
        cents = np.floor(ldf["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                "o_orderkey": [orderkey],
                "n_lines": [len(ldf)],
                "line_cents": [int(cents.sum())],
                "has_order_row": [len(odf) > 0],
            }
        )

    return (
        orders.groupby("o_orderkey")
        .cogroup(lineitem.groupby(F.col("l_orderkey").alias("o_orderkey")))
        .applyInPandas(
            reconcile,
            schema="o_orderkey long, n_lines long, line_cents long, has_order_row boolean",
        )
    )


def mad_outlier_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier statistics via median absolute deviation:
    ``outlier := |x - median| > k * MAD``. Returns one row per group with
    the group size, median, MAD, and outlier count.

    Three aggregate passes over the input, each reduced per group, with
    the tiny per-group stats broadcast back — the input is never
    shuffled, only scanned. At 100 TB the exact ``percentile`` becomes
    the bottleneck (it buffers per-group values); swap in
    ``percentile_approx`` (mergeable t-digest-style sketch) for the
    scale path — same plan shape, bounded memory.
    """
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(F.broadcast(med), list(keys))
    mad = with_med.groupBy(*keys).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad"),
        F.first("med").alias("med"),
        F.count("*").alias("n"),
    )
    with_mad = df.join(F.broadcast(mad), list(keys))
    return with_mad.groupBy(*keys).agg(
        F.first("n").alias("n"),
        F.sum(
            F.when(
                F.abs(F.col(value_col) - F.col("med")) > F.lit(k) * F.col("mad"), 1
            ).otherwise(0)
        ).alias("n_outliers"),
        F.round(F.first("med"), 4).alias("med"),
        F.round(F.first("mad"), 4).alias("mad"),
    )
