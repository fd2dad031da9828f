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


def test_decontaminate_spans_removes_only_covered_words(spark):
    from azure_etl_spark.operators.curation import decontaminate_spans

    eval_text = "one two three four five six seven eight tail words here"
    train = _docs(
        spark,
        [
            # the eval 8-gram "one..eight" sits mid-document: exactly its
            # 8 words must go, prefix/suffix survive
            (1, "train", "prefix one two three four five six seven eight suffix"),
            # no overlap -> untouched
            (2, "train", "alpha beta gamma delta epsilon zeta eta theta iota"),
            # document IS a contaminated span -> fully removed
            (3, "train", "one two three four five six seven eight"),
        ],
    )
    ev = _docs(spark, [(100, "eval", eval_text)])
    got = {r.doc_id: r for r in decontaminate_spans(train, ev, n=8).collect()}
    assert got[1].cleaned_text == "prefix suffix"
    assert (got[1].n_words_kept, got[1].n_words_removed) == (2, 8)
    assert got[2].cleaned_text == "alpha beta gamma delta epsilon zeta eta theta iota"
    assert got[2].n_words_removed == 0
    assert got[3].cleaned_text == ""
    assert (got[3].n_words_kept, got[3].n_words_removed) == (0, 8)


def test_decontaminate_spans_overlapping_grams_union(spark):
    """Two overlapping contaminated grams cover the UNION of their
    positions — no double counting, no gaps."""
    from azure_etl_spark.operators.curation import decontaminate_spans

    # eval contains 'a1..a8' and 'a3..a10' (overlapping windows)
    ev = _docs(spark, [(100, "eval", " ".join(f"a{i}" for i in range(1, 11)))])
    train = _docs(
        spark,
        [(1, "train", "keep0 " + " ".join(f"a{i}" for i in range(1, 11)) + " keep1")],
    )
    got = decontaminate_spans(train, ev, n=8).collect()[0]
    assert got.cleaned_text == "keep0 keep1"
    assert got.n_words_removed == 10


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


def test_profile_columns_one_row_per_column(spark):
    from azure_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 10.0), (3, "b", None)], "id long, s string, v double"
    )
    got = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 2)
    # numeric min/max surface as uniform decimal strings
    assert (got["v"].min_value, got["v"].max_value) == ("2.50", "10.00")
    assert got["id"].min_value == "1.00"


def test_incremental_dedup_seen_and_within_batch(spark):
    from azure_etl_spark.operators.dedup import incremental_dedup

    seen = _docs(spark, [(1, "s", "old doc body")])
    batch = _docs(
        spark,
        [
            (10, "s", "old doc body"),      # dup of ingested corpus -> dropped
            (11, "s", "fresh content a"),   # survives
            (12, "s", "fresh content a"),   # within-batch dup -> dropped
            (13, "s", "fresh content b"),   # survives
        ],
    )
    ids = sorted(r.doc_id for r in incremental_dedup(batch, seen).collect())
    assert ids == [11, 13]


def test_weighted_sample_favors_heavy_rows(spark):
    from azure_etl_spark.operators.curation import weighted_sample_topk

    # 200 docs: even ids are 50x heavier than odd ids
    rows = [(i, "s", ("w " * (100 if i % 2 == 0 else 2)).strip()) for i in range(200)]
    picked = [r.doc_id for r in weighted_sample_topk(_docs(spark, rows), k=40).collect()]
    heavy = sum(1 for i in picked if i % 2 == 0)
    assert len(picked) == 40 and heavy >= 30  # heavily weighted side dominates
    # determinism: same input -> identical sample
    again = [r.doc_id for r in weighted_sample_topk(_docs(spark, rows), k=40).collect()]
    assert picked == again


def test_domain_rebalance_weights_direction(spark):
    from azure_etl_spark.operators.curation import domain_rebalance_weights

    rows = [(i, "big", "w " * 50) for i in range(90)] + [
        (100 + i, "small", "w w") for i in range(10)
    ]
    got = {r.source: r for r in domain_rebalance_weights(_docs(spark, rows)).collect()}
    assert got["big"].weight < 1.0       # over-represented -> downsample
    assert got["small"].weight == 5.0    # under-represented -> clamped upsample
    assert abs(got["big"].token_share + got["small"].token_share - 1.0) < 1e-9


def test_sorted_run_entropy_edge_cases(spark):
    """Fold-based entropy (operators/text.py:sorted_run_entropy) on the
    inputs that break naive formulations: empty text (normalizes to the
    single token ''), a uniform doc (entropy 0), and a known mix."""
    import math

    from pyspark.sql import functions as F

    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.text import sorted_run_entropy

    df = spark.createDataFrame(
        [(1, ""), (2, "x x x x"), (3, "a a b b"), (4, "one")], "id long, text string"
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id", F.inline(F.array(sorted_run_entropy(F.split(normalized_text("text"), " "))))
        ).collect()
    }
    # '' tokenizes to [''] — one token, one distinct word, entropy 0
    assert out[1]["n_tokens"] == 1 and out[1]["n_distinct_words"] == 1
    assert out[1]["entropy"] == 0.0
    assert out[2]["n_tokens"] == 4 and out[2]["n_distinct_words"] == 1
    assert out[2]["entropy"] == 0.0
    assert out[3]["n_distinct_words"] == 2
    assert abs(out[3]["entropy"] - math.log(2)) < 1e-6
    assert out[4]["n_tokens"] == 1 and out[4]["entropy"] == 0.0


def test_apply_cdc_insert_update_delete(spark):
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.aggregate import apply_cdc

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")],
        "k long, v string, op string",
    )
    out = {r["k"]: r["v"] for r in apply_cdc(target, changes, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 2 updated, 4 inserted


def test_heavy_hitters_matches_exact_topk(spark, sf_dir):
    """Two-phase candidate-pruned top-k == exact top-k (values AND
    counts) on the fixture word distribution, with a candidate budget
    far below the vocabulary size — the pruned shuffle really was
    smaller, and nothing a partition pruned mattered."""
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.text import heavy_hitters
    from azure_etl_spark.sources.files import ensure_min_partitions, load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.split(normalized_text("text"), " ")).alias("w")
    )
    vocab_size = words.distinct().count()
    budget = 60
    assert budget < vocab_size or vocab_size < 60  # prune is real on big vocab
    got = [(r["v"], r["n"]) for r in heavy_hitters(words, "w", k=10, candidates_per_partition=budget).collect()]
    exact = [
        (r["w"], r["n"])
        for r in words.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(10)
        .collect()
    ]
    assert got == exact


def test_chunk_sliding_windows_overlap_and_truncation(spark):
    from azure_etl_spark.operators.curation import chunk_sliding_windows

    words = " ".join(f"w{i}" for i in range(10))  # 10 words
    df = spark.createDataFrame(
        [(1, words), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_words"], r["chunk_text"])
        for r in chunk_sliding_windows(df, window=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6 (ceil((10-4)/3)=2 -> 3 windows), last truncates at 10
    assert rows[(1, 0)] == (4, "w0 w1 w2 w3")
    assert rows[(1, 1)] == (4, "w3 w4 w5 w6")
    assert rows[(1, 2)] == (4, "w6 w7 w8 w9")
    # overlap: stride 3 < window 4 -> one shared word between windows
    assert rows[(1, 1)][1].split()[0] == rows[(1, 0)][1].split()[-1]
    # short and empty docs yield exactly one window each
    assert rows[(2, 0)] == (1, "solo")
    assert rows[(3, 0)] == (1, "")
    assert len(rows) == 5


def test_remove_duplicate_spans_cross_doc(spark):
    """ExactSubstr at k-gram resolution: a span duplicated across docs
    is removed from BOTH, a span straddling what segment-dedup would
    call a boundary cannot escape, unique text survives, and
    within-doc-only repetition does not trigger (min_dup_docs=2)."""
    from azure_etl_spark.operators.curation import remove_duplicate_spans

    dup = "the quick brown fox jumps over the lazy dog today"  # 10 words
    docs = _docs(
        spark,
        [
            (1, "a", f"alpha beta {dup} gamma delta"),
            (2, "b", f"start {dup} end"),
            # unique doc: untouched
            (3, "c", "unique words that appear nowhere else in this corpus ok"),
            # repeats an 8-gram only within ITSELF -> not cross-doc
            (4, "d", "w1 w2 w3 w4 w5 w6 w7 w8 filler w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
    )
    got = {r.doc_id: r for r in remove_duplicate_spans(docs, k=8).collect()}
    # the 10 duplicated words go; unique flanks survive
    assert got[1].cleaned_text == "alpha beta gamma delta"
    assert (got[1].n_words_kept, got[1].n_words_removed) == (4, 10)
    assert got[2].cleaned_text == "start end"
    assert (got[2].n_words_kept, got[2].n_words_removed) == (2, 10)
    assert got[3].n_words_removed == 0
    assert got[4].n_words_removed == 0  # within-doc repeat, 1 distinct doc

    # by='occurrences' (the paper's literal criterion) also catches the
    # within-doc repetition — and ONLY it, unique docs stay intact
    got1 = {
        r.doc_id: r
        for r in remove_duplicate_spans(docs, k=8, by="occurrences").collect()
    }
    assert got1[4].n_words_removed == 16  # both 8-word copies; the
    assert got1[4].cleaned_text == "filler"  # uncovered middle survives
    assert got1[3].n_words_removed == 0


def test_doc_to_segments_empty_word_array_edge(spark):
    """Spark's sequence(0, -1) DESCENDS; an explicitly empty word array
    used to fabricate TWO bogus segments. Clamped: one empty segment,
    same as a ['']-word doc."""
    from azure_etl_spark.operators.curation import segment_docs

    df = spark.createDataFrame(
        [(1, []), (2, [""]), (3, ["a", "b", "c", "d"])],
        "doc_id long, words array<string>",
    )
    out = segment_docs(df, F.col("words"), seg_len=3)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["doc_id"], []).append((r["seg_idx"], r["segment"]))
    assert by_id[1] == [(0, "")]
    assert by_id[2] == [(0, "")]
    assert sorted(by_id[3]) == [(0, "a b c"), (1, "d")]


def test_remove_dup_segments_null_words_doc_kept(spark):
    """NULL-words edge (round-14, ADVICE r13): a doc whose words column
    is NULL yields one NULL segment row; the round-13 left join KEEPS
    that doc (cleaned_text '', NULL segment counted in n_seg_kept)
    where the old inner join on 'segment' silently dropped it. Pin the
    deliberate keep-the-doc behavior."""
    from azure_etl_spark.operators.curation import remove_duplicate_segments

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, None)],
        "doc_id long, words array<string>",
    )
    got = {
        r.doc_id: r
        for r in remove_duplicate_segments(
            df, F.col("words"), seg_len=3
        ).collect()
    }
    assert set(got) == {1, 2}  # the NULL-words doc does not vanish
    assert got[2].cleaned_text == ""
    assert (got[2].n_seg_kept, got[2].n_seg_dropped) == (1, 0)
    assert got[1].cleaned_text == "a b c"
