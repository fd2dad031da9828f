"""Audit every registered query's output for hash-fragile representations.

The driver compares Spark vs DuckDB results through a pandas-level value
hash; types whose text/pandas form is scale- or nullability-dependent
(DECIMAL trailing zeros, NULL cells in integer columns -> float64 NaN)
can hash-mismatch even when values are identical.  This script runs every
registered query at the given SF and reports:

  * DecimalType output columns (must be cast to DOUBLE at the edge)
  * numeric columns that actually contain NULL cells (must be COALESCEd)

Usage: python tools/audit_outputs.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import types as T

from azure_etl_spark.plans.queries import QUERIES
from azure_etl_spark.session import get_session

NUMERIC = (
    T.DecimalType,
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="audit")
    bad_decimal: dict[str, list[str]] = {}
    bad_nulls: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, spec in sorted(QUERIES.items()):
        try:
            df = spec.fn(spark, sf_dir)
            dec_cols = [
                f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)
            ]
            if dec_cols:
                bad_decimal[name] = dec_cols
            num_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, NUMERIC) and f.nullable
            ]
            if num_cols:
                from pyspark.sql import functions as F

                null_counts = df.select(
                    [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in num_cols]
                ).collect()[0]
                withnull = [c for c in num_cols if (null_counts[c] or 0) > 0]
                if withnull:
                    bad_nulls[name] = withnull
        except Exception as e:  # noqa: BLE001 - audit must survive one bad query
            errors[name] = f"{type(e).__name__}: {e}"[:200]
    print("== DECIMAL output columns ==")
    for name, cols in sorted(bad_decimal.items()):
        print(f"  {name}: {cols}")
    print("== NULL cells in numeric columns ==")
    for name, cols in sorted(bad_nulls.items()):
        print(f"  {name}: {cols}")
    print("== errors ==")
    for name, err in sorted(errors.items()):
        print(f"  {name}: {err}")
    print(
        f"summary: {len(bad_decimal)} decimal, {len(bad_nulls)} nullable-numeric, "
        f"{len(errors)} errors / {len(QUERIES)} queries"
    )


if __name__ == "__main__":
    main()
