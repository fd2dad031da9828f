"""One-pass data profiling (per-column quality summary).

The reference's only schema introspection is ``df.printSchema()`` before
each serving write (goldToCosmosdb.scala:36, goldToSynapse.scala:37);
a real engine wants row-level profiling too — null rates, cardinality,
value ranges — computed in ONE scan however many columns are profiled,
because at 100 TB every extra pass is hours. All metrics for all
columns are gathered in a single ``agg`` (Catalyst plans one
hash-aggregate; the distinct counts expand internally but still share
the scan), then the wide single row is unpivoted to one row per column
with ``stack``.

Numeric ranges are surfaced as DECIMAL(18,2)-formatted strings so the
profile has a uniform schema regardless of column types (and so the
DuckDB oracle formats identically — raw double→string formatting is
engine-specific, decimals are not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) in one scan: rows of
    ``(column, n_nulls, n_distinct, min_value, max_value)``."""
    cols = list(cols) if cols is not None else df.columns
    types = {f.name: f.dataType for f in df.schema.fields}

    def _fmt(col):
        def inner(c: str):
            agg = col(F.col(c))  # extreme in the column's own type...
            if isinstance(types[c], NumericType):
                agg = agg.cast("decimal(18,2)")
            return agg.cast("string")  # ...then formatted uniformly

        return inner

    _mn, _mx = _fmt(F.min), _fmt(F.max)
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nl_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            _mn(c).alias(f"__mn_{c}"),
            _mx(c).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nl_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)"
    )
