"""In-engine BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909).

Classic byte-pair-encoding trains on a WORD-FREQUENCY table, not the raw
corpus: the corpus is scanned once to count distinct words (Heaps' law
keeps the vocabulary sublinear in corpus size — the 100 TB corpus
becomes a few-million-row word table), then every merge round runs on
that small table only. Each round is:

  1. explode adjacent symbol pairs weighted by word count,
  2. a 1-row global argmax (highest count, lexicographically smallest
     pair on ties — fully deterministic),
  3. broadcast the winning pair back and merge it inside every word.

All string work is JVM built-ins. A word's symbol sequence is encoded
as a single string with every symbol wrapped in US (``\\x1f``)
sentinels — ``abc`` -> ``\\x1fa\\x1f\\x1fb\\x1f\\x1fc\\x1f`` — so
"merge pair (a, b)" is exactly one ``replace`` of
``\\x1fa\\x1f\\x1fb\\x1f`` with ``\\x1fab\\x1f``: the doubled inner
sentinels make adjacent matches share no characters, which turns the
engine's leftmost-non-overlapping ``replace`` into precisely BPE's
greedy left-to-right merge (``a a a`` + pair ``(a,a)`` -> ``aa a``).
Both Spark and DuckDB implement ``replace`` with those semantics, so
the fixed ``n_merges`` rounds unroll into an exact SQL oracle
(plans/queries.py). Tokens are restricted to ``^[a-z]+$`` so the
sentinel bytes can never occur in a symbol.

Scale: one corpus-wide word-count shuffle, then ``n_merges`` linear
passes over the vocabulary table with a 1-row broadcast each — no
further corpus reads, no UDFs, no driver-side loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_spark.operators.text import tokens

SEP = "\x1f"  # US: wraps every symbol
DSEP = SEP + SEP  # between adjacent symbols
PSEP = "\x1e"  # RS: pair-key separator, sorts below [a-z] for tie-breaks


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercased whitespace tokens matching ^[a-z]+$."""
    w = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
    return (
        w.filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def symbolize(col) -> "F.Column":
    """Word -> sentinel-wrapped initial (character) symbol string."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, r"(?!^)"), lambda x: F.length(x) > 0)
    return F.concat(F.lit(SEP), F.array_join(chars, DSEP), F.lit(SEP))


def _symbols(s) -> "F.Column":
    """Symbol string -> array of symbols."""
    c = F.col(s) if isinstance(s, str) else s
    return F.split(F.substring(c, 2, F.length(c) - 2), DSEP)


def _adjacent_pairs(arr) -> "F.Column":
    n = F.size(arr)
    return F.when(
        n > 1,
        F.zip_with(
            F.slice(arr, 1, n - 1),
            F.slice(arr, 2, n - 1),
            lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))


def bpe_train(words: DataFrame, n_merges: int = 8) -> tuple[DataFrame, list[DataFrame]]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) table.

    Returns ``(merges, rounds)``: ``merges`` is a DataFrame
    (rank, lhs, rhs, merged, pair_count) ordered by learning rank, and
    ``rounds`` the list of 1-row per-round DataFrames (each already
    localCheckpoint-ed) for callers that chain the merge replacements
    themselves (see :func:`bpe_encode`).
    """
    cur = words.select(symbolize("word").alias("s"), F.col("cnt")).localCheckpoint(
        eager=True
    )
    rounds: list[DataFrame] = []
    for r in range(1, n_merges + 1):
        pairs = cur.select(
            F.explode(_adjacent_pairs(_symbols("s"))).alias("p"), "cnt"
        ).select(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"), "cnt")
        counted = pairs.groupBy("lhs", "rhs").agg(F.sum("cnt").alias("pair_count"))
        key = F.struct(
            (-F.col("pair_count")).alias("neg"),
            F.concat(F.col("lhs"), F.lit(PSEP), F.col("rhs")).alias("pk"),
        )
        best = counted.agg(
            F.min_by(F.struct("lhs", "rhs", "pair_count"), key).alias("b")
        ).select(
            F.lit(r).alias("rank"),
            F.col("b.lhs").alias("lhs"),
            F.col("b.rhs").alias("rhs"),
            F.concat("b.lhs", "b.rhs").alias("merged"),
            F.col("b.pair_count").alias("pair_count"),
            F.concat(
                F.lit(SEP), F.col("b.lhs"), F.lit(DSEP), F.col("b.rhs"), F.lit(SEP)
            ).alias("pat"),
            F.concat(F.lit(SEP), F.col("b.lhs"), F.col("b.rhs"), F.lit(SEP)).alias(
                "rep"
            ),
        ).localCheckpoint(eager=True)
        # vocabulary fully merged before n_merges rounds: the argmax over
        # an empty pair table is a NULL row — stop instead of letting a
        # NULL pattern poison every word via replace(s, NULL, NULL)
        if best.first()["lhs"] is None:
            break
        rounds.append(best)
        cur = (
            cur.join(F.broadcast(best.select("pat", "rep")))
            .withColumn("s", F.replace(F.col("s"), F.col("pat"), F.col("rep")))
            .select("s", "cnt")
            .localCheckpoint(eager=True)
        )
    if not rounds:  # no adjacent pairs at all (every word is one symbol)
        empty = words.sparkSession.createDataFrame(
            [], "rank int, lhs string, rhs string, merged string, pair_count bigint"
        )
        return empty, rounds
    merges = rounds[0].drop("pat", "rep")
    for b in rounds[1:]:
        merges = merges.unionByName(b.drop("pat", "rep"))
    return merges, rounds


def bpe_encode(
    df: DataFrame, rounds: list[DataFrame], text_col: str = "text"
) -> DataFrame:
    """Apply learned merges to a corpus: adds ``bpe_tokens``
    (array<string>) and ``n_bpe_tokens``.

    The merge list is assembled into ONE rank-ordered array (a 1-row
    broadcast), and all merges apply in a single corpus pass: per word,
    ``aggregate`` folds the (pat, rep) array over the symbol string with
    one JVM ``replace`` per merge — chained replaces are exactly the
    fold, which is also how the oracle unrolls them. Zero shuffles, one
    scan, regardless of merge count.
    """
    if not rounds:
        return df.withColumn(
            "bpe_tokens",
            F.filter(tokens(F.lower(F.col(text_col))), lambda w: w.rlike("^[a-z]+$")),
        ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    merged = rounds[0].select("rank", "pat", "rep")
    for b in rounds[1:]:
        merged = merged.unionByName(b.select("rank", "pat", "rep"))
    ms = merged.agg(
        F.array_sort(F.collect_list(F.struct("rank", "pat", "rep"))).alias("__ms")
    )
    words = F.filter(
        tokens(F.lower(F.col(text_col))), lambda w: w.rlike("^[a-z]+$")
    )
    out = df.join(F.broadcast(ms)).withColumn(
        "__syms",
        F.transform(
            words,
            lambda w: F.aggregate(
                F.col("__ms"),
                symbolize(w),
                lambda acc, m: F.replace(acc, m["pat"], m["rep"]),
            ),
        ),
    )
    toks = F.flatten(F.transform(F.col("__syms"), lambda s: _symbols(s)))
    return (
        out.withColumn("bpe_tokens", toks)
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
        .drop("__syms", "__ms")
    )
