"""Pure-Python reference for the WordPiece tokenizer — the executable
spec that operators/wordpiece.py (Spark) and its DuckDB oracle must
both match bit-for-bit. Dependency-free and boring on purpose; used by
tests/test_wordpiece.py property checks (same role as unigram_ref.py
for the unigram-LM tokenizer).

Semantics (Schuster & Nakajima 2012 / BERT WordPiece):

- train: per round, over the current (symbol-sequence, count) word
  table, pick the adjacent pair maximizing the likelihood-ratio score
  ``pair_count / (n_lhs * n_rhs)`` (counts weighted by word
  frequency); ties break to the lexicographically smallest
  ``lhs + RS + rhs`` pair key. Merge greedily left-to-right inside
  every word; the merged piece is ``lhs + rhs-without-##``. Non-initial
  symbols carry the ``##`` continuation marker.
- vocab: the initial alphabet (plain + ##-marked characters) plus one
  merged piece per round — grow-only.
- encode: greedy longest-match-first per word (##-form for non-initial
  positions); no match at any position, or length > WP_WORD_MAX, makes
  the whole word ``[UNK]``.
"""

from __future__ import annotations

WP_WORD_MAX = 12
UNK = "[UNK]"
PSEP = "\x1e"  # pair-key separator for tie-breaks (matches tokenize.PSEP)


def symbolize(word: str) -> list[str]:
    return [word[0]] + ["##" + c for c in word[1:]]


def train(
    words: dict[str, int], n_merges: int = 8
) -> tuple[list[tuple], dict[tuple[str, ...], int]]:
    """Returns (merges, final_word_table): merges is a list of
    (rank, lhs, rhs, merged, pair_count, score)."""
    table: dict[tuple[str, ...], int] = {}
    for w, c in words.items():
        key = tuple(symbolize(w))
        table[key] = table.get(key, 0) + c
    merges: list[tuple] = []
    for r in range(1, n_merges + 1):
        sym_n: dict[str, int] = {}
        pair_n: dict[tuple[str, str], int] = {}
        for seq, c in table.items():
            for s in seq:
                sym_n[s] = sym_n.get(s, 0) + c
            for a, b in zip(seq, seq[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + c
        if not pair_n:
            break
        best = min(
            pair_n.items(),
            key=lambda kv: (
                -(float(kv[1]) / (float(sym_n[kv[0][0]]) * float(sym_n[kv[0][1]]))),
                kv[0][0] + PSEP + kv[0][1],
            ),
        )
        (lhs, rhs), pc = best
        score = float(pc) / (float(sym_n[lhs]) * float(sym_n[rhs]))
        merged = lhs + rhs[2:]
        merges.append((r, lhs, rhs, merged, pc, score))
        new_table: dict[tuple[str, ...], int] = {}
        for seq, c in table.items():
            out: list[str] = []
            i = 0
            while i < len(seq):  # greedy leftmost non-overlapping merge
                if i + 1 < len(seq) and seq[i] == lhs and seq[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            k = tuple(out)
            new_table[k] = new_table.get(k, 0) + c
        table = new_table
    return merges, table


def vocab(words: dict[str, int], merges: list[tuple]) -> set[str]:
    v: set[str] = set()
    for w in words:
        v.update(symbolize(w))
    v.update(m[3] for m in merges)
    return v


def encode_word(word: str, v: set[str]) -> list[str]:
    if len(word) > WP_WORD_MAX:
        return [UNK]
    toks: list[str] = []
    p = 0
    while p < len(word):
        for k in range(min(WP_WORD_MAX, len(word) - p), 0, -1):
            piece = word[p : p + k] if p == 0 else "##" + word[p : p + k]
            if piece in v:
                toks.append(piece)
                p += k
                break
        else:
            return [UNK]
    return toks


def encode_doc(text: str, v: set[str]) -> list[str]:
    import re

    out: list[str] = []
    for w in text.strip().lower().split():
        if re.fullmatch(r"[a-z]+", w):
            out.extend(encode_word(w, v))
    return out
