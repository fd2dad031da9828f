"""Pure-Python reference for the unigram-LM tokenizer (Viterbi-EM) —
the executable spec that operators/unigram.py (Spark) and its DuckDB
oracle must both match bit-for-bit. Kept dependency-free and boring on
purpose; used by tests/test_unigram.py property checks.

Algorithm (deterministic SentencePiece-style unigram LM, Kudo 2018,
arXiv:1804.10959, simplified to fixed-iteration hard-EM):

- seed vocabulary: every substring of length 1..PIECE_MAX of the
  (length-capped) word table, scored by occurrence count; the top
  SEED_MULTI multi-char pieces (count desc, piece asc) plus ALL single
  chars; initial prob  count / total.
- EM_ITERS rounds of Viterbi-EM: segment every word with the current
  piece log-probs (max-sum DP, ties broken toward the LONGEST piece),
  count piece uses weighted by word frequency, re-normalize with
  add-one smoothing on single chars (so the vocabulary always covers
  any word), drop pieces whose smoothed count is zero.
- encode: Viterbi-segment each word with the final vocabulary; words
  longer than WORD_MAX pass through as single OOV tokens.
"""

from __future__ import annotations

import math

PIECE_MAX = 3
WORD_MAX = 12
SEED_MULTI = 60
EM_ITERS = 2
NEG_INF = -1e9


def seed_vocab(words: dict[str, int]) -> dict[str, int]:
    """(piece -> occurrence count) over words of length <= WORD_MAX."""
    occ: dict[str, int] = {}
    for w, c in words.items():
        if len(w) > WORD_MAX:
            continue
        for i in range(len(w)):
            for k in range(1, PIECE_MAX + 1):
                if i + k <= len(w):
                    occ[w[i : i + k]] = occ.get(w[i : i + k], 0) + c
    multi = sorted(
        ((p, c) for p, c in occ.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:SEED_MULTI]
    vocab = {p: c for p, c in occ.items() if len(p) == 1}
    vocab.update(dict(multi))
    return vocab


def logprobs(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c) - math.log(total) for p, c in counts.items()}


def viterbi(w: str, lp: dict[str, float]) -> list[str]:
    """Max-sum segmentation; backtrace prefers the LONGEST piece that
    achieves the optimal score (exact float equality — the engines
    recompute the identical expression, so equality is faithful)."""
    b = [0.0]
    for i in range(1, len(w) + 1):
        b.append(
            max(
                b[i - k] + lp.get(w[i - k : i], NEG_INF)
                for k in range(1, PIECE_MAX + 1)
                if k <= i
            )
        )
    pieces: list[str] = []
    p = len(w)
    while p > 0:
        k_pick = 1
        for k in range(PIECE_MAX, 1, -1):
            if k <= p and b[p] == b[p - k] + lp.get(w[p - k : p], NEG_INF):
                k_pick = k
                break
        pieces.append(w[p - k_pick : p])
        p -= k_pick
    return list(reversed(pieces))


def em_step(
    words: dict[str, int], vocab: dict[str, int], lp: dict[str, float]
) -> dict[str, int]:
    """One Viterbi-EM round: smoothed piece-use counts for the NEXT
    vocabulary (add-one on single chars; zero-count pieces dropped)."""
    uses: dict[str, int] = {}
    for w, c in words.items():
        if len(w) > WORD_MAX:
            continue
        for piece in viterbi(w, lp):
            uses[piece] = uses.get(piece, 0) + c
    out: dict[str, int] = {}
    for p in vocab:
        n = uses.get(p, 0) + (1 if len(p) == 1 else 0)
        if n > 0:
            out[p] = n
    return out


def train(words: dict[str, int]) -> dict[str, int]:
    """Final (piece -> smoothed use count) after EM_ITERS rounds."""
    vocab = seed_vocab(words)
    for _ in range(EM_ITERS):
        vocab = em_step(words, vocab, logprobs(vocab))
    return vocab


def encode_word(w: str, lp: dict[str, float]) -> list[str]:
    if len(w) > WORD_MAX:
        return [w]  # OOV passthrough
    return viterbi(w, lp)
