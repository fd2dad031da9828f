"""Expectations operator: one-pass clean/quarantine split with per-rule
violation accounting (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_spark.operators.quality import (
    expectation_observation,
    flag_expectations,
    split_expectations,
)
from azure_etl_spark.sources.files import load_table


def _rules():
    return {
        "custkey_not_null": F.col("c_custkey").isNotNull(),
        "acctbal_in_range": F.col("c_acctbal").between(-1000, 10000),
        "mktsegment_known": F.col("c_mktsegment").isin(
            "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
        ),
    }


def test_split_partitions_rows_exactly(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    clean, quarantine = split_expectations(c, _rules())
    n, nc, nq = c.count(), clean.count(), quarantine.count()
    assert nc + nq == n and nc > 0
    # quarantine rows name the rule(s) they broke
    bad = quarantine.select(F.explode("__violations").alias("rule")).distinct()
    assert {r["rule"] for r in bad.collect()} <= set(_rules())
    # clean side satisfies every rule
    for name, cond in _rules().items():
        assert clean.filter(~F.coalesce(cond, F.lit(False))).count() == 0, name


def test_null_rule_result_is_violation(spark):
    df = spark.createDataFrame([(None,), (5,)], "x int")
    flagged = flag_expectations(df, {"x_positive": F.col("x") > 0})
    rows = {r["x"]: list(r["__violations"]) for r in flagged.collect()}
    assert rows[None] == ["x_positive"]  # NULL comparison -> violation
    assert rows[5] == []


def test_observation_counts_ride_the_write(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    rules = _rules()
    obs, metrics = expectation_observation(rules)
    clean, quarantine = split_expectations(c, rules)
    observed = c.observe(obs, *metrics)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = dict(obs.get)
    assert got["rows"] == c.count()
    assert got["viol_acctbal_in_range"] == (
        c.filter(~F.col("c_acctbal").between(-1000, 10000)).count()
    )


def test_logreg_learns_separable_labels(spark):
    """In-engine GD logistic regression: on linearly separable data the
    learned weights order every positive above every negative, scoring
    is the pure-expression sigmoid, and fixed iterations + zero init
    make refits bit-identical."""
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.quality import logreg_fit, logreg_score

    df = spark.range(200).select(
        F.col("id"),
        F.lit(1.0).alias("x0"),
        # positives (even ids) cluster at x1~+2, negatives at x1~-2
        F.when(F.col("id") % 2 == 0, 2.0 + (F.col("id") % 5) * 0.1)
        .otherwise(-2.0 - (F.col("id") % 5) * 0.1)
        .alias("x1"),
        (F.col("id") % 2 == 0).cast("double").alias("y"),
    )
    w = logreg_fit(df, ["x0", "x1"], "y", iters=5, lr=1.0)
    assert w[1] > 0  # the separating feature gets a positive weight

    scored = logreg_score(df, ["x0", "x1"], w)
    rows = scored.select("y", "prob").collect()
    min_pos = min(r["prob"] for r in rows if r["y"] == 1.0)
    max_neg = max(r["prob"] for r in rows if r["y"] == 0.0)
    assert min_pos > max_neg

    # reproducibility: a refit returns the identical weight vector
    assert logreg_fit(df, ["x0", "x1"], "y", iters=5, lr=1.0) == w
