"""Unigram-LM tokenizer (operators/unigram.py) vs the pure-Python
executable spec (operators/unigram_ref.py): train and encode must match
bit-for-bit on the fixture corpus AND on randomized corpora, plus
hand-checked DP semantics (longest-piece tie-break, OOV passthrough,
empty docs)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from azure_etl_spark.operators import unigram_ref as R
from azure_etl_spark.operators.tokenize import word_frequencies
from azure_etl_spark.operators.unigram import (
    WORD_MAX,
    unigram_encode,
    unigram_train,
)
from azure_etl_spark.sources.files import load_table


def _ref_words(rows) -> dict[str, int]:
    words: dict[str, int] = {}
    for t in rows:
        t = t.strip().lower()
        for w in (re.split(r"\s+", t) if t else []):
            if re.fullmatch("[a-z]+", w):
                words[w] = words.get(w, 0) + 1
    return words


def _train_pair(spark, docs_df):
    vocab = unigram_train(word_frequencies(docs_df))
    got = {
        r["piece"]: (r["n_uses"], round(r["logp"], 9))
        for r in vocab.collect()
    }
    wref = _ref_words([r["text"] for r in docs_df.select("text").collect()])
    vref = R.train(wref)
    tot = sum(vref.values())
    want = {
        p: (n, round(math.log(n) - math.log(tot), 9)) for p, n in vref.items()
    }
    return got, want, vocab, vref


def test_train_matches_reference_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got, want, _, _ = _train_pair(spark, docs)
    assert got == want and len(got) > 10


def test_encode_matches_reference_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    _, _, vocab, vref = _train_pair(spark, docs)
    lp = R.logprobs(vref)
    enc = unigram_encode(
        docs, vocab.select("piece", F.col("n_uses").alias("n_occ"))
    )
    for r in enc.select("doc_id", "text", "uni_tokens").collect():
        t = r["text"].strip().lower()
        ws = [
            w for w in (re.split(r"\s+", t) if t else [])
            if re.fullmatch("[a-z]+", w)
        ]
        want = [tk for w in ws for tk in R.encode_word(w, lp)]
        assert r["uni_tokens"] == want
        # segmentation is lossless per word stream
        assert "".join(r["uni_tokens"]) == "".join(ws)


@pytest.mark.slow
def test_randomized_corpora_match_reference(spark):
    """Property check: seeded random corpora (fresh vocabularies, word
    shapes the fixture never produces) still match the reference
    end-to-end — train counts, log-probs, and every segmentation."""
    import random

    for seed in (11, 47):
        rng = random.Random(seed)
        alphabet = "abcdef"
        lexicon = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
            for _ in range(40)
        ]
        texts = [
            " ".join(rng.choice(lexicon) for _ in range(rng.randint(0, 12)))
            for _ in range(60)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        got, want, vocab, vref = _train_pair(spark, docs)
        assert got == want
        lp = R.logprobs(vref)
        enc = unigram_encode(
            docs, vocab.select("piece", F.col("n_uses").alias("n_occ"))
        )
        for r in enc.select("text", "uni_tokens").collect():
            t = r["text"].strip().lower()
            ws = [
                w for w in (re.split(r"\s+", t) if t else [])
                if re.fullmatch("[a-z]+", w)
            ]
            assert r["uni_tokens"] == [
                tk for w in ws for tk in R.encode_word(w, lp)
            ]


def test_viterbi_prefers_longest_piece_on_ties():
    """'ab' with lp(a)+lp(b) == lp(ab): the tie resolves to the single
    longest piece in the reference — the same CASE order both engines
    unroll."""
    lp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert R.viterbi("ab", lp) == ["ab"]
    assert R.viterbi("aab", lp) == ["a", "ab"]


def test_oov_and_empty_doc_handling(spark):
    docs = spark.createDataFrame(
        [
            (1, "abc " + "z" * (WORD_MAX + 5) + " abc"),
            (2, ""),
            (3, "   "),
        ],
        "doc_id int, text string",
    )
    vocab = unigram_train(word_frequencies(docs))
    enc = {
        r["doc_id"]: (r["n_uni_tokens"], r["uni_tokens"])
        for r in unigram_encode(
            docs, vocab.select("piece", F.col("n_uses").alias("n_occ"))
        ).collect()
    }
    assert enc[2] == (0, []) and enc[3] == (0, [])
    n, toks = enc[1]
    # the 17-char word passes through whole; abc segments both times
    assert "z" * (WORD_MAX + 5) in toks
    assert "".join(toks) == "abc" + "z" * (WORD_MAX + 5) + "abc"


def test_reference_seed_respects_caps():
    words = {"abcdefghijklmnop": 5, "ab": 3}  # first is over WORD_MAX
    seed = R.seed_vocab(words)
    assert all(len(p) <= R.PIECE_MAX for p in seed)
    # the capped-out word contributes nothing
    assert set("".join(seed)) <= set("ab")
