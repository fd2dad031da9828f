"""Vector math over array<float|double> columns — built-ins only.

Dot products and norms are expressed with ``zip_with`` + ``aggregate``
higher-order functions: they run in the JVM per-row with a sequential
left fold, which makes the result bit-reproducible (same fold order) —
important because the correctness oracle recomputes these in DuckDB.

At 100 TB the brute-force path is a map-only scan per query vector (no
shuffle); the scale path buckets candidates first (see
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product in double precision."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
