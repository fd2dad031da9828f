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


def with_quantized_embedding(
    df,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    codes_col: str = "q_codes",
):
    """Per-vector symmetric int8 quantization, staged through columns.

    ``scale = max|v| / 127`` materializes as a column BEFORE the codes
    transform references it — a lambda re-evaluates captured outer
    expressions per element, so inlining the max would be O(d^2) per
    row. ``code_i = floor(v_i / scale + 0.5)``: the floor-based rounder
    is used instead of ``round()`` because engines disagree on ties
    (HALF_UP vs HALF_EVEN) while this formulation is bit-reproducible
    anywhere IEEE doubles are IEEE doubles. 4x memory reduction for ANN
    candidate scanning; reconstruction error is bounded by scale/2 per
    element. Zero vectors quantize to zeros with scale 0.
    """
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(
        127.0
    )
    out = df.withColumn(scale_col, scale)
    s = F.col(scale_col)
    codes = F.when(
        s == 0.0, F.transform(v, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x.cast("double") / s + F.lit(0.5)).cast("int"))
    )
    return out.withColumn(codes_col, codes)


def dequantize_int8(scale: Column, codes: Column) -> Column:
    """Inverse of :func:`with_quantized_embedding` (error <= scale/2)."""
    return F.transform(codes, lambda c: c.cast("double") * scale)
