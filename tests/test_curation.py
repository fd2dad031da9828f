"""Unit semantics for the corpus-curation operators (operators/curation.py,
plus the MAD / SCD2 helpers): planted-case checks complementing the
oracle-parity gate in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_spark.operators.curation import contamination_overlap, pack_token_budget
from azure_etl_spark.operators.normalize import mad_outlier_stats
from azure_etl_spark.operators.windows import scd2_intervals


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_contamination_flags_planted_overlap(spark):
    eval_text = "one two three four five six seven eight tail words here"
    train = _docs(
        spark,
        [
            # contains the eval 8-gram "one ... eight" verbatim
            (1, "train", "prefix one two three four five six seven eight suffix"),
            # disjoint vocabulary -> clean
            (2, "train", "alpha beta gamma delta epsilon zeta eta theta iota"),
        ],
    )
    ev = _docs(spark, [(100, "eval", eval_text)])
    got = {
        r.doc_id: (r.overlap_ngrams, r.contaminated)
        for r in contamination_overlap(train, ev, n=8).collect()
    }
    assert got[1][0] >= 1 and got[1][1] is True
    assert got[2] == (0, False)


def test_pack_token_budget_contiguous_fill(spark):
    # 5 docs x 4 tokens, budget 8 -> seqs of 2,2,1 docs within one shard
    rows = [(i, "s", "a b c d") for i in range(5)]
    out = (
        pack_token_budget(_docs(spark, rows), budget=8)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.n_tokens for r in out] == [4] * 5
    assert [r.seq_id for r in out] == [0, 0, 1, 1, 2]


def test_pack_token_budget_is_per_shard(spark):
    rows = [(i, f"s{i % 2}", "a b c d") for i in range(4)]
    out = pack_token_budget(_docs(spark, rows), budget=100).collect()
    # each shard restarts at seq 0 regardless of the other shard's fill
    assert {r.seq_id for r in out} == {0}
    assert len({r.source for r in out}) == 2


def test_mad_outliers_robust_to_single_spike(spark):
    vals = [float(v) for v in (10, 11, 12, 13, 14, 1000)]
    df = spark.createDataFrame([("t", v) for v in vals], "event_type string, value double")
    row = mad_outlier_stats(df, keys=["event_type"], value_col="value").collect()[0]
    # median/MAD ignore the spike (unlike mean/stddev); only the spike flags
    assert row.n == 6 and row.n_outliers == 1
    assert row.med == 12.5 and row.mad == 1.5


def test_scd2_intervals_change_points_only(spark):
    df = spark.createDataFrame(
        [(1, "O", 1), (1, "O", 2), (1, "F", 3), (1, "F", 4), (1, "O", 5), (2, "P", 1)],
        "k long, status string, t long",
    )
    out = scd2_intervals(
        df, key_cols=["k"], attr_col="status", order_cols=["t"]
    ).orderBy("k", "valid_from")
    rows = [(r.k, r.status, r.valid_from, r.valid_to, r.is_current) for r in out.collect()]
    assert rows == [
        (1, "O", 1, 3, False),
        (1, "F", 3, 5, False),
        (1, "O", 5, None, True),
        (2, "P", 1, None, True),
    ]
