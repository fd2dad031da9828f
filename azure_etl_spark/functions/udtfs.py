"""Python UDTFs (table functions), Spark 4 API surface.

UDTFs are the row-to-rows extension point (LATERAL-join shape). They
run in Python workers — the slow path — so the engine only reaches for
one when the expansion logic genuinely can't be an array expression +
``explode`` (the JVM-side twin used by the dedup/text operators). The
bigram UDTF here is deliberately oracle-checkable to prove the plumbing.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class WordBigrams:
    """Emit (position, bigram) per consecutive word pair of the
    lowercased, whitespace-split input text."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        words = [w for w in text.lower().split() if w]
        for i in range(len(words) - 1):
            yield i, words[i] + " " + words[i + 1]


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (LATERAL word_bigrams(text))."""
    spark.udtf.register("word_bigrams", WordBigrams)
