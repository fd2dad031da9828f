"""Unigram-LM (SentencePiece-style) tokenizer: train + encode
(Kudo 2018, arXiv:1804.10959 — the other production tokenizer family
next to BPE; reference has no tokenizer ops, SURVEY.md §2 engine
extension). Deterministic fixed-iteration Viterbi-EM, the same
"unrolled iterative algorithm as static column stages" strategy the
engine already uses for k-means/BPE/MMR — which is what makes a DuckDB
oracle able to replay it bit-for-bit (plans/queries.py
``unigram_train_vocab`` / ``unigram_encode_docs``).

Semantics (executable spec: ``operators/unigram_ref.py``):

- **seed**: every substring of length 1..PIECE_MAX of the (length-
  capped) word table scored by occurrence count; top SEED_MULTI
  multi-char pieces (count desc, piece asc) + ALL single chars.
- **EM_ITERS Viterbi-EM rounds**: segment each word by max-sum DP
  under current piece log-probs (ties -> LONGEST piece), count piece
  uses weighted by word frequency, renormalize with add-one smoothing
  on single chars (coverage guarantee), drop zero-count pieces.
- **encode**: Viterbi-segment each document's words under the final
  vocabulary; words longer than WORD_MAX pass through as single OOV
  tokens.

Scale shape: the corpus is touched ONCE (word_frequencies' shuffle);
every EM round runs over the Heaps-law-bounded word table with the
piece-probability map broadcast as a 1-row join — per-round cost is
O(|vocab words| * WORD_MAX * PIECE_MAX) codegen expressions, no
shuffle beyond the piece-count hash aggregate. Encoding segments only
DISTINCT words and joins the segmentation back — a 100 TB corpus pays
one explode + one broadcast-ish join, never per-occurrence DP.

The Viterbi DP is UNROLLED into WORD_MAX static column stages
(forward scores b1..bW, then W backtrace steps). Float ties resolve
identically in Spark, DuckDB, and the Python reference because all
three evaluate the same expression tree in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PIECE_MAX = 3
WORD_MAX = 12
SEED_MULTI = 60
EM_ITERS = 2
NEG_INF = -1e9


def _lp(map_col: Column, piece: Column) -> Column:
    return F.coalesce(F.element_at(map_col, piece), F.lit(NEG_INF))


def with_logprobs(counts: DataFrame) -> DataFrame:
    """(piece, n_occ) -> (piece, logp): ln(n) - ln(total)."""
    tot = counts.agg(F.sum("n_occ").alias("__t"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece", (F.log("n_occ") - F.log("__t")).alias("logp")
    )


def vocab_map(vocab_counts: DataFrame) -> DataFrame:
    """1-row (piece -> logp) map for broadcast into the DP lookups."""
    return with_logprobs(vocab_counts).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("piece", "logp")))
        ).alias("__lp")
    )


def with_viterbi_tokens(
    df: DataFrame, word_col: str, map_df: DataFrame, out_col: str = "__toks"
) -> DataFrame:
    """Append the Viterbi segmentation (array<string>) of ``word_col``
    (length <= WORD_MAX) under the broadcast piece->logp map.

    Both DP passes are ``F.aggregate`` FOLDS, not withColumn chains: a
    chain of stages whose expressions reference earlier stages gets
    textually inlined by CollapseProject — with 3 candidate references
    per stage that is a 3^WORD_MAX expression-tree blowup (the same
    hazard simhash64's docstring records for 64 array folds). A fold's
    lambda is one small expression evaluated WORD_MAX times at runtime,
    so the tree stays linear. The DuckDB oracle unrolls the identical
    recurrences as chained single-reference CTEs (linear there too) —
    same float ops in the same order, so ties resolve identically.
    """
    df = df.join(F.broadcast(map_df))
    W = F.col(word_col)
    lpm = F.col("__lp")

    # forward: B = [b_0 .. b_WORD_MAX], b_0 = 0; element_at is 1-based
    # so b_q lives at B[q + 1]
    def step_fwd(acc: Column, i: Column) -> Column:
        cands = []
        for k in range(1, PIECE_MAX + 1):
            cand = F.element_at(acc, i - k + 1) + _lp(
                lpm, F.substring(W, i - k + 1, F.lit(k))
            )
            cands.append(F.when(i >= k, cand))  # null (skipped) when k > i
        return F.concat(acc, F.array(F.greatest(*cands)))

    df = df.withColumn(
        "__B",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(WORD_MAX)),
            F.array(F.lit(0.0)),
            step_fwd,
        ),
    )
    B = F.col("__B")

    def bb(q: Column) -> Column:
        # guarded index: q can be formally negative on never-taken
        # branches (vectorized AND does not short-circuit)
        return F.element_at(B, F.greatest(q + 1, F.lit(1)))

    # backtrace: WORD_MAX folded steps over acc = (p, toks); each step
    # picks the LONGEST k whose piece achieves the optimal score
    def step_back(acc: Column, _t: Column) -> Column:
        p = acc["p"]

        def eqk(k: int) -> Column:
            piece = F.substring(W, p - k + 1, F.lit(k))
            return (p >= k) & (bb(p) == bb(p - k) + _lp(lpm, piece))

        kc = F.when(p <= 0, F.lit(0))
        for k in range(PIECE_MAX, 1, -1):
            kc = kc.when(eqk(k), F.lit(k))
        kc = kc.otherwise(F.lit(1))
        return F.when(p <= 0, acc).otherwise(
            F.struct(
                (p - kc).alias("p"),
                F.concat(
                    acc["toks"], F.array(F.substring(W, p - kc + 1, kc))
                ).alias("toks"),
            )
        )

    df = df.withColumn(
        out_col,
        F.aggregate(
            F.sequence(F.lit(1), F.lit(WORD_MAX)),
            F.struct(
                F.length(W).cast("int").alias("p"),
                F.array().cast("array<string>").alias("toks"),
            ),
            step_back,
            lambda acc: F.reverse(acc["toks"]),
        ),
    )
    return df.drop("__B", "__lp")


def seed_vocab(words: DataFrame) -> DataFrame:
    """(piece, n_occ): substring occurrence counts, pruned to the top
    SEED_MULTI multi-char pieces + all single chars."""
    w = words.filter(F.length("word") <= WORD_MAX)
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(PIECE_MAX)),
                    lambda k: F.struct(
                        F.substring(F.col("word"), i, k).alias("p"),
                        k.alias("k"),
                    ),
                ),
                lambda s: F.length(s["p"]) == s["k"],
            ),
        )
    )
    subs = w.select(F.explode(pieces).alias("s"), "cnt").select(
        F.col("s.p").alias("piece"), "cnt"
    )
    occ = subs.groupBy("piece").agg(F.sum("cnt").alias("n_occ"))
    chars = occ.filter(F.length("piece") == 1)
    multi = (
        occ.filter(F.length("piece") > 1)
        .orderBy(F.desc("n_occ"), F.asc("piece"))
        .limit(SEED_MULTI)
    )
    return chars.unionByName(multi)


def em_step(words: DataFrame, vocab_counts: DataFrame) -> DataFrame:
    """One Viterbi-EM round over the word table: next (piece, n_occ)."""
    w = words.filter(F.length("word") <= WORD_MAX)
    seg = with_viterbi_tokens(w, "word", vocab_map(vocab_counts))
    uses = (
        seg.select(F.explode("__toks").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("__u"))
    )
    smoothed = F.coalesce(F.col("__u"), F.lit(0)) + F.when(
        F.length("piece") == 1, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        vocab_counts.select("piece")
        .join(uses, "piece", "left")
        .select("piece", smoothed.alias("n_occ"))
        .filter(F.col("n_occ") > 0)
    )


def unigram_train(words: DataFrame) -> DataFrame:
    """EM_ITERS Viterbi-EM rounds; returns (piece, n_uses, logp)."""
    vocab = seed_vocab(words).localCheckpoint(eager=True)
    for _ in range(EM_ITERS):
        vocab = em_step(words, vocab).localCheckpoint(eager=True)
    return vocab.join(with_logprobs(vocab), "piece").select(
        "piece", F.col("n_occ").alias("n_uses"), "logp"
    )


def unigram_encode(
    docs: DataFrame,
    vocab_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each document's words under the trained vocabulary:
    adds ``uni_tokens`` (array<string>) and ``n_uni_tokens``. Only
    DISTINCT words run the DP; per-occurrence cost is one join."""
    words_arr = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x.rlike("^[a-z]+$"),
    )
    dw = docs.select(
        id_col, F.posexplode(words_arr).alias("__pos", "__w")
    )
    short = dw.filter(F.length("__w") <= WORD_MAX)
    longw = dw.filter(F.length("__w") > WORD_MAX).select(
        id_col, "__pos", F.array("__w").alias("__toks")
    )
    distinct_words = short.select(F.col("__w").alias("word")).distinct()
    seg = with_viterbi_tokens(
        distinct_words, "word", vocab_map(vocab_counts)
    ).select(F.col("word").alias("__w"), "__toks")
    per_word = short.join(seg, "__w").select(id_col, "__pos", "__toks")
    agg = (
        per_word.unionByName(longw)
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__toks"))),
                    lambda s: s["__toks"],
                )
            ).alias("uni_tokens")
        )
    )
    return (
        docs.join(agg, id_col, "left")
        .withColumn(
            "uni_tokens",
            F.coalesce("uni_tokens", F.array().cast("array<string>")),
        )
        .withColumn("n_uni_tokens", F.size("uni_tokens"))
    )
