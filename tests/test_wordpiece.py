"""WordPiece tokenizer (operators/wordpiece.py) vs its pure-Python
executable spec (operators/wordpiece_ref.py): hand-checked likelihood-
ratio merges on the classic toy corpus, greedy longest-match encode
semantics (## continuation, [UNK] fallbacks), and randomized-corpus
train+encode equivalence."""

from __future__ import annotations

import pytest
import random

from pyspark.sql import functions as F

from azure_etl_spark.operators import wordpiece_ref as R
from azure_etl_spark.operators.wordpiece import (
    UNK,
    WP_WORD_MAX,
    wordpiece_encode,
    wordpiece_train,
    wordpiece_vocab,
)


def _toy_words(spark):
    rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    return spark.createDataFrame(rows, ["word", "cnt"])


def test_wordpiece_train_hand_checked_merges(spark):
    """Likelihood-ratio scoring picks RARE-symbol pairs first — the
    published contrast with BPE's raw-count argmax: on the toy corpus
    round 1 is (##i, ##d) at 3/(3*3)=1/3 (BPE picks (e, s) at count 9,
    which here scores only 9/(14*9))."""
    merges, _ = wordpiece_train(_toy_words(spark), n_merges=4)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in merges.orderBy("rank").collect()
    ]
    assert got == [
        (1, "##i", "##d", "##id", 3),
        (2, "w", "##id", "wid", 3),
        (3, "l", "##o", "lo", 7),
        (4, "##s", "##t", "##st", 9),
    ]
    # and the scores match the reference bit-for-bit
    ref = R.train({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)[0]
    got_s = [r["score"] for r in merges.orderBy("rank").collect()]
    assert got_s == [m[5] for m in ref]


def test_wordpiece_encode_longest_match_and_unk(spark):
    _, rounds = wordpiece_train(_toy_words(spark), n_merges=4)
    vocab = wordpiece_vocab(_toy_words(spark), rounds)
    docs = spark.createDataFrame(
        [
            (1, "lowest newest low"),
            (2, "zzz"),  # no 'z' in the alphabet -> [UNK]
            (3, "wid " + "a" * (WP_WORD_MAX + 1)),  # over-length -> [UNK]
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["wp_tokens"] for r in wordpiece_encode(docs, vocab).collect()}
    # greedy longest-first: 'lo' beats 'l', '##st' beats '##s'
    assert out[1] == ["lo", "##w", "##e", "##st", "n", "##e", "##w", "##e",
                      "##st", "lo", "##w"]
    assert out[2] == [UNK]
    assert out[3] == ["wid", UNK]
    assert out[4] == []


def test_wordpiece_segmentation_lossless_unless_unk(spark, sf_dir):
    """Stripping ## and concatenating a word's pieces restores the word
    exactly for every non-[UNK] segmentation on the fixture corpus."""
    from azure_etl_spark.operators.wordpiece import word_frequencies
    from azure_etl_spark.sources.files import load_table

    d = load_table(spark, sf_dir, "documents")
    words = word_frequencies(d)
    _, rounds = wordpiece_train(words, n_merges=8)
    vocab = wordpiece_vocab(words, rounds)
    enc = wordpiece_encode(d, vocab)
    words_arr = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w.rlike("^[a-z]+$"),
    )
    rebuilt = F.concat_ws(
        "", F.transform("wp_tokens", lambda t: F.replace(t, F.lit("##"), F.lit("")))
    )
    # every fixture word is trainable (<= WP_WORD_MAX, alphabet covered)
    # so no [UNK] should appear and the rebuild must be exact
    bad = enc.filter(
        (F.array_contains("wp_tokens", UNK))
        | (rebuilt != F.concat_ws("", words_arr))
    )
    assert bad.count() == 0


@pytest.mark.slow
def test_randomized_corpora_match_reference(spark):
    """Train + encode on randomized word tables must equal the pure-
    Python spec exactly — merges (incl. float scores), vocab, and every
    document's token sequence."""
    rng = random.Random(7)
    for trial in range(3):
        n_words = rng.randint(4, 12)
        words = {}
        for _ in range(n_words):
            w = "".join(
                rng.choice("abcd") for _ in range(rng.randint(1, WP_WORD_MAX))
            )
            words[w] = rng.randint(1, 9)
        wdf = spark.createDataFrame(list(words.items()), ["word", "cnt"])
        merges_df, rounds = wordpiece_train(wdf, n_merges=5)
        ref_merges, _ = R.train(words, 5)
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"], r["score"])
            for r in merges_df.orderBy("rank").collect()
        ]
        assert got == ref_merges, f"trial {trial}: merge divergence"

        vocab_df = wordpiece_vocab(wdf, rounds)
        ref_vocab = R.vocab(words, ref_merges)
        assert {r["piece"] for r in vocab_df.collect()} == ref_vocab

        pool = list(words) + ["zzz", "a" * (WP_WORD_MAX + 2)]
        docs = [
            (i, " ".join(rng.choice(pool) for _ in range(rng.randint(0, 6))))
            for i in range(5)
        ]
        ddf = spark.createDataFrame(docs, ["doc_id", "text"])
        enc = {
            r["doc_id"]: r["wp_tokens"]
            for r in wordpiece_encode(ddf, vocab_df).collect()
        }
        for i, text in docs:
            assert enc[i] == R.encode_doc(text, ref_vocab), (
                f"trial {trial} doc {i}: encode divergence"
            )
