"""Data-quality expectations: declarative row rules -> clean/quarantine
split + per-rule violation counts, in ONE pass.

The DLT-expectations / Great-Expectations pattern as plain DataFrame
ops: each rule is a boolean Column; rows failing any rule route to a
quarantine frame carrying the names of the rules they violated. Both
outputs derive from one flagged projection, so Spark scans the input
once per action (cache the flagged frame when materializing both), and
violation counts ride the clean write as Observation metrics rather
than extra count() scans — the same zero-extra-action accounting the
medallion silver stage uses.

At 100 TB the wrong implementation is N rule-filters = N scans; this is
one scan with N codegen'd predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def flag_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append ``__violations`` (array of failed rule names; empty =
    clean). NULL rule results count as violations — an expectation that
    cannot be evaluated is not met."""
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)) for name, cond in rules.items()
    ]
    return df.withColumn(
        "__violations", F.array_compact(F.array(*flags))
    )


def split_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_flag_col, quarantined_rows_with_violations).
    Cache the flagged intermediate if materializing both sides."""
    flagged = flag_expectations(df, rules)
    clean = flagged.filter(F.size("__violations") == 0).drop("__violations")
    quarantine = flagged.filter(F.size("__violations") > 0)
    return clean, quarantine


def expectation_observation(rules: dict[str, Column]) -> tuple[Observation, list[Column]]:
    """Observation + metric columns (rows, per-rule violation counts) to
    attach to the clean-side write:
    ``df.observe(obs, *metrics)`` — counters ride the job for free."""
    obs = Observation("expectations")
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(f"viol_{name}")
        for name, cond in rules.items()
    ]
    return obs, metrics


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Train a logistic-regression classifier IN the engine: full-batch
    gradient descent where each step is ONE distributed aggregation
    (`avg((sigmoid(w·x) - y) * x_j)` per feature) and the only
    driver-side state is the weight vector itself (len(feature_cols)
    floats). The fasttext-style quality-classifier step of an LLM data
    pipeline, without any ML library: at 100 TB each iteration is a
    single map-side-combined pass over the corpus, and `iters` is fixed
    so runs are reproducible (zero init, deterministic feature order —
    the same property that lets kmeans_fit's oracle unroll in SQL).

    Include a constant ``1.0`` column for the bias term. Returns the
    learned weights aligned with ``feature_cols``.
    """
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        z = F.lit(0.0)
        for wj, c in zip(w, feature_cols):
            z = z + F.lit(float(wj)) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = df.agg(
            *[
                F.avg((p - F.col(label_col)) * F.col(c)).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        w = [wj - lr * float(g[f"g{j}"]) for j, wj in enumerate(w)]
    return w


def logreg_score(
    df: DataFrame, feature_cols: list[str], weights: list[float],
    out_col: str = "prob",
) -> DataFrame:
    """Score rows with trained weights: sigmoid(w·x) as a pure codegen
    expression — no UDF, no model object, broadcastable by construction
    (the "model" is len(feature_cols) literals folded into the plan)."""
    z = F.lit(0.0)
    for wj, c in zip(weights, feature_cols):
        z = z + F.lit(float(wj)) * F.col(c)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8,
    n: int = 3,
    prefix: str = "x",
) -> DataFrame:
    """fastText-style text features for the quality classifier
    (Joulin et al. 2016, arXiv:1607.01759): char n-grams of the
    lower-cased text hashed into a FIXED bucket count; feature ``b`` is
    the fraction of the doc's grams landing in bucket ``b``. Ties
    :func:`logreg_fit` to raw text instead of engineered stats only.

    Appends ``{prefix}1 .. {prefix}{n_buckets}`` double columns. The
    hash is the integer value of the first 8 hex digits of
    ``md5(gram)`` — oracle-recomputable in DuckDB digit-by-digit (the
    ``simhash_md5_chunks`` trick); xxhash64 would be the production
    pick but has no SQL twin. Everything is in-row higher-order
    functions under codegen: one grams array, one bucket array, then
    ``n_buckets`` filtered counts — no explode, no shuffle, and the
    feature width is fixed regardless of vocabulary (the whole point
    of the hashing trick at 100 TB: no vocabulary table to build,
    ship, or skew)."""
    s = F.lower(F.trim(F.col(text_col)))
    grams = F.when(
        F.length(s) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(s) - (n - 1)),
            lambda i: F.substring(s, i, F.lit(n)),
        )
    )

    def bucket(g):
        return (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
            % n_buckets
        )

    df = df.withColumn("__bk", F.transform(grams, bucket))
    ng = F.size("__bk")
    for b in range(n_buckets):
        df = df.withColumn(
            f"{prefix}{b + 1}",
            F.when(ng == 0, F.lit(0.0)).otherwise(
                F.size(F.filter(F.col("__bk"), lambda x: x == b)).cast("double")
                / ng
            ),
        )
    return df.drop("__bk")
