"""Deterministic sampling for training-data pipelines.

Spark's native ``df.sample`` is seeded per-partition, so its output
changes with partitioning — unusable for reproducible dataset curation
or an external oracle. These operators sample by **content hash of a
key** instead: a row's fate depends only on its key, so samples are
reproducible across runs, partitionings, engines (any engine with md5),
and table versions — the property training-data splits actually need
(a document must never migrate between train and test when the corpus
is re-partitioned).

Mechanism: the first two hex chars of ``md5(key)`` are a uniform byte
(256 buckets); a lexicographic threshold selects ``k/256`` of keys.
Pure expression work under codegen — map-only, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_byte(key_col: str | Column) -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.substring(F.md5(c.cast("string")), 1, 2)


def hash_bucket_threshold(fraction: float) -> str:
    """Two-hex-char threshold selecting ~fraction of uniform keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(256, round(fraction * 256)), "02x")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by md5(key) bucket — stable
    under re-partitioning and re-runs, unlike ``df.sample``."""
    return df.filter(_hash_byte(key_col) < F.lit(hash_bucket_threshold(fraction)))


def train_test_tag(
    df: DataFrame, key_col: str, test_fraction: float = 0.2, out_col: str = "split"
) -> DataFrame:
    """Tag each row 'test'/'train' by key hash. All rows sharing a key
    (e.g. all events of one user) land on the same side — the leakage
    guard random row sampling does not give."""
    thr = hash_bucket_threshold(test_fraction)
    return df.withColumn(
        out_col,
        F.when(_hash_byte(key_col) < F.lit(thr), F.lit("test")).otherwise(F.lit("train")),
    )


def deterministic_shard(key_col: str | Column, n_shards: int) -> Column:
    """Shard id in [0, n_shards) from md5(key) — the reproducible
    'global shuffle' a training exporter needs. Unlike
    ``df.repartition(n)`` (round-robin/hash over Spark's internal
    partitioning, different every run), the assignment depends only on
    the key, so the same corpus produces byte-identical shards across
    runs, cluster sizes, and engines. Pure expression (md5 + conv +
    pmod) under codegen; pair with ``partitionBy(shard)`` on write."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    word = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
    return F.pmod(word, F.lit(n_shards))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    web text, keep all rare-language docs). Strata absent from
    ``fractions`` are dropped."""
    expr: Column | None = None
    byte = _hash_byte(key_col)
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == stratum) & (
            byte < F.lit(hash_bucket_threshold(frac))
        )
        expr = cond if expr is None else expr | cond
    if expr is None:
        raise ValueError("fractions must not be empty")
    return df.filter(expr)
