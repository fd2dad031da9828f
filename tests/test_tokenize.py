"""BPE tokenizer training/encoding (operators/tokenize.py).

Hand-checked merges on the classic Sennrich-style toy corpus, plus a
losslessness property on the fixture corpus (BPE segmentation is a
partition of each word: concatenating a word's tokens restores it).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_spark.operators.tokenize import (
    bpe_encode,
    bpe_train,
    word_frequencies,
)
from azure_etl_spark.sources.files import load_table


def _toy_words(spark):
    rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    return spark.createDataFrame(rows, ["word", "cnt"])


def test_bpe_train_hand_checked_merges(spark):
    """low*5 lower*2 newest*6 widest*3: pair counts make round 1 a tie
    (e,s)=9 vs (s,t)=9 -> lexicographic tie-break picks (e,s); then
    (es,t)=9; then the (l,o)/(o,w) 7-7 tie picks (l,o)."""
    merges, _ = bpe_train(_toy_words(spark), n_merges=3)
    got = [(r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
    ]


def test_bpe_encode_applies_merges_in_order(spark):
    _, rounds = bpe_train(_toy_words(spark), n_merges=3)
    docs = spark.createDataFrame([(1, "lowest newest low")], ["doc_id", "text"])
    out = bpe_encode(docs, rounds).collect()[0]
    # lowest: l o w e s t -> es -> est -> lo  => [lo, w, est]
    assert out["bpe_tokens"] == ["lo", "w", "est", "n", "e", "w", "est", "lo", "w"]
    assert out["n_bpe_tokens"] == 9


def test_bpe_segmentation_is_lossless(spark, sf_dir):
    """Concatenated tokens must exactly rebuild the filtered word
    stream for every fixture document (no characters created or lost
    by the sentinel encoding + greedy merges)."""
    d = load_table(spark, sf_dir, "documents")
    _, rounds = bpe_train(word_frequencies(d), n_merges=8)
    enc = bpe_encode(d, rounds)
    words = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w.rlike("^[a-z]+$"),
    )
    bad = enc.withColumn("__orig", F.concat_ws("", words)).filter(
        F.concat_ws("", F.col("bpe_tokens")) != F.col("__orig")
    )
    assert bad.count() == 0


def test_bpe_oracle_guard_survives_vocab_exhaustion(spark):
    """ADVICE r5: when every pair is merged before the unrolled round
    count, the oracle's per-round merge CTE is EMPTY — the guarded
    LEFT JOIN must carry words/docs through unchanged (mirroring the
    engine's early-stop) instead of emptying every later CTE."""
    import duckdb
    import pandas as pd

    from azure_etl_spark.plans.queries import _bpe_encode_oracle, _BPE_N_MERGES

    docs = [(1, "ab ab"), (2, "ab b"), (3, "b")]
    sdf = spark.createDataFrame(docs, "doc_id int, text string")
    merges, rounds = bpe_train(word_frequencies(sdf), n_merges=_BPE_N_MERGES)
    assert merges.count() < _BPE_N_MERGES  # vocabulary exhausted early

    enc = {
        r["doc_id"]: (r["n_bpe_tokens"], " ".join(r["bpe_tokens"]))
        for r in bpe_encode(sdf, rounds).collect()
    }

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    got = {
        int(r.doc_id): (int(r.n_bpe_tokens), r.tok_str)
        for r in con.sql(_bpe_encode_oracle()).df().itertuples()
    }
    assert got == enc and len(got) == 3


# ------------------------- byte-fallback encode (round 8, VERDICT r7 #8)


def test_bpe_encode_bytes_lossless_on_arbitrary_utf8(spark, sf_dir):
    """The GPT-2 no-UNK contract: decode(encode(text)) must equal the
    whitespace-normalized input for ARBITRARY UTF-8 — 200 seeded random
    strings mixing ASCII, accents, CJK, emoji, control bytes, the ▁
    marker char itself, plus the adversarial fixed rows. One Spark job
    for all examples."""
    import random
    import re

    from azure_etl_spark.operators.tokenize import (
        bpe_decode_bytes,
        bpe_encode_bytes,
        bpe_train,
        word_frequencies,
    )
    from azure_etl_spark.sources.files import load_table

    rng = random.Random(8)
    pools = [
        "abcdefghijklmnopqrstuvwxyz",
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789!@#$%^&*()_+-=[]{};:'\",.<>/?\\|`~",
        " \t\n\r\x0b\x0c",
        "àéîõüßñçøæ日本語テスト中文한국어",
        "🚀🎉😀🏳️‍🌈👍🏽",
        "▁\x1f\x1e\x00",  # the marker + the BPE sentinels + NUL
    ]
    cases = ["", " ", "\t\n", "▁", "a▁b", "<0x41>"]  # adversarial fixed rows
    for _ in range(200):
        s = "".join(
            rng.choice(rng.choice(pools)) for _ in range(rng.randrange(0, 40))
        )
        cases.append(s)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "doc_id long, text string"
    )
    _, rounds = bpe_train(
        word_frequencies(load_table(spark, sf_dir, "documents").limit(200)), 8
    )
    out = bpe_encode_bytes(df, rounds).withColumn(
        "decoded", bpe_decode_bytes("bpe_tokens")
    )
    ws = re.compile(r"[ \t\n\x0b\x0c\r]+")  # Java \s, exactly
    got = {r["doc_id"]: r["decoded"] for r in out.collect()}
    for i, s in enumerate(cases):
        want = " ".join(t for t in ws.split(s.strip(" ")) if t)
        assert got[i] == want, f"case {i}: {s!r} -> {got[i]!r}, want {want!r}"


def test_bpe_encode_bytes_no_unk_and_merge_parity(spark, sf_dir):
    """In-vocabulary words tokenize IDENTICALLY to plain bpe_encode
    (same merges applied), OOV words become only <0xHH> byte tokens,
    and nothing is ever dropped or UNK'd."""
    from azure_etl_spark.operators.tokenize import (
        bpe_encode,
        bpe_encode_bytes,
        bpe_train,
        word_frequencies,
    )
    from azure_etl_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    _, rounds = bpe_train(word_frequencies(docs), 8)
    plain = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, rounds).select("doc_id", "bpe_tokens").collect()
    }
    withb = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_bytes(docs, rounds)
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    import re

    bt = re.compile(r"^<0x[0-9A-F]{2}>$")
    for did, toks in withb.items():
        # strip markers and byte tokens -> must equal the plain encode
        # of the [a-z]+ words (the docs fixture is lowercase ASCII text,
        # so byte tokens only appear for punctuation/digit words)
        alpha = [t for t in toks if t != "▁" and not bt.match(t)]
        assert alpha == plain[did], did
        assert "[UNK]" not in toks and "" not in toks
