"""Corpus-curation operators for LLM training-data pipelines.

Capability extensions beyond the reference surface (which processes a
single 2-column crypto table end-to-end — SURVEY.md §2): benchmark
decontamination and token-budget sequence packing, the two curation
steps that sit between dedup/quality-filtering and tokenizer sharding
in a training-data pipeline. Both are pure built-in-expression plans —
no Python in the hot path — so they scale as ordinary shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from azure_etl_spark.operators.dedup import word_shingles


def contamination_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_threshold: int = 1,
) -> DataFrame:
    """Per-train-document eval-set contamination via exact word n-gram
    overlap (the standard "13-gram decontamination" recipe, here with a
    configurable n).

    Returns one row per train document: ``overlap_ngrams`` = number of
    distinct n-grams shared with ANY eval document, ``contaminated`` =
    overlap >= flag_threshold.

    Scale shape: the eval set is small by construction (benchmarks are
    KBs–MBs against a 100 TB corpus), so its distinct n-gram set is
    broadcast and the train side stays a map-only scan + broadcast-hash
    semi-aggregation — no shuffle of the corpus. If the eval side ever
    outgrows broadcast, the same plan degrades gracefully to a
    shuffled-hash join on the fixed-width n-gram key.
    """
    eval_grams = (
        eval_docs.select(F.explode(word_shingles(text_col, n)).alias("ngram")).distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("ngram")
    )
    hits = (
        train_grams.join(F.broadcast(eval_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("overlap_ngrams", F.coalesce(F.col("overlap_ngrams"), F.lit(0)))
        .withColumn("contaminated", F.col("overlap_ngrams") >= flag_threshold)
    )


def decontaminate_spans(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence-level decontamination: where :func:`contamination_overlap`
    FLAGS whole documents, this removes the contaminated *spans* — every
    word covered by an n-gram the eval set also contains — and
    reassembles the rest, which is what production decontamination
    pipelines do (dropping a 10k-word document over one leaked 8-gram
    wastes the other 9,992 words).

    Returns (id, cleaned_text, n_words_kept, n_words_removed).

    Plan shape at scale: the eval n-gram set is broadcast (benchmarks
    are KBs–MBs vs a 100 TB corpus), positional train n-grams join it
    map-side, and only the HIT positions (a tiny fraction) are
    aggregated and joined back — AQE broadcasts the per-doc start lists.
    Span coverage and reassembly are in-row array HOFs under codegen; no
    corpus-wide shuffle anywhere, same as the flagging variant.
    """
    from azure_etl_spark.operators.dedup import normalized_text, word_shingles

    eval_grams = (
        eval_docs.select(F.explode(word_shingles(text_col, n)).alias("ngram")).distinct()
    )
    t = train.select(
        F.col(id_col), F.split(normalized_text(text_col), " ").alias("__w")
    )
    # positional n-grams (same window rule as word_shingles: starts
    # 0..L-n, one short gram for docs under n words)
    idx = F.sequence(F.lit(0), F.greatest(F.size("__w") - n, F.lit(0)))
    pos_grams = t.select(
        id_col,
        F.posexplode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__w", i + 1, n)))
        ).alias("pos", "ngram"),
    )
    starts = (
        pos_grams.join(F.broadcast(eval_grams), "ngram")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__starts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + n - 1),
            )
        )
    )
    kept = F.filter(
        F.col("__w"), lambda w, i: ~F.array_contains(F.col("__covered"), i)
    )
    return (
        t.join(starts, id_col, "left")
        .withColumn("__covered", covered)
        .select(
            id_col,
            F.array_join(kept, " ").alias("cleaned_text"),
            F.size(kept).alias("n_words_kept"),
            (F.size("__w") - F.size(kept)).alias("n_words_removed"),
        )
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    shard_col: str = "source",
    order_cols: Sequence[str] = ("doc_id",),
    n_tokens: Column | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    contiguous fill: within each shard, documents (in deterministic
    order) are laid end-to-end and ``seq_id = floor(exclusive-prefix-sum
    of tokens / budget)``.

    Packing is per-``shard_col`` on purpose: the window shuffles by the
    shard key instead of collapsing the corpus into one partition, which
    is how packing is done at scale anyway (each output shard is packed
    independently; cross-shard packing buys nothing). A greedy best-fit
    packer would need per-bin state; contiguous fill is the
    deterministic, embarrassingly-parallel variant with bounded waste
    (< one document per boundary).

    Adds ``n_tokens`` (whitespace token count unless an expression is
    supplied) and ``seq_id`` columns.
    """
    if n_tokens is None:
        from azure_etl_spark.operators.dedup import normalized_text

        n_tokens = F.size(F.split(normalized_text(), " "))
    out = df.withColumn("n_tokens", n_tokens)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn("seq_id", F.floor(cum_excl / F.lit(budget)).cast("int"))


def domain_rebalance_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    max_weight: float = 5.0,
) -> DataFrame:
    """Per-domain sampling weights that rebalance the corpus token mix
    toward a uniform target: ``weight = clamp(target_share / actual
    token share, <= max_weight)``. Over-represented domains get weight
    < 1 (downsample), under-represented ones > 1 (upsample / repeat),
    capped so no domain is repeated unboundedly.

    One aggregation to per-domain token counts, then window totals over
    the tiny aggregate (rows = #domains, not #documents) — the corpus
    itself is scanned once and never shuffled beyond the groupBy.
    """
    from azure_etl_spark.operators.dedup import normalized_text

    n_tokens = F.size(F.split(normalized_text(text_col), " "))
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"), F.sum(n_tokens).alias("tokens")
    )
    wtot = Window.partitionBy()
    share = F.col("tokens").cast("double") / F.sum("tokens").over(wtot).cast("double")
    target = F.lit(1.0) / F.count("*").over(wtot).cast("double")
    return per.select(
        domain_col,
        "n_docs",
        "tokens",
        F.round(share, 6).alias("token_share"),
        F.round(F.least(target / share, F.lit(max_weight)), 4).alias("weight"),
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets priority ``u^(1/w)`` with
    ``u`` a uniform derived from md5(id) — reproducible across runs,
    partitionings, and engines — and the global top-k priorities win.
    Longer/heavier rows are proportionally likelier to be kept.

    Single pass + ``TakeOrderedAndProject`` (per-partition top-k, then
    k-way merge on the driver) — no global sort materialization however
    large the input.
    """
    if weight is None:
        from azure_etl_spark.operators.dedup import normalized_text

        weight = F.size(F.split(normalized_text(text_col), " ")).cast("double")
    c = F.col(id_col)
    u = (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    pri = F.pow(u, F.lit(1.0) / weight)
    return (
        df.withColumn("priority", F.round(pri, 10))
        .orderBy(F.col("priority").desc(), c)
        .limit(k)
        .select(id_col, "priority")
    )


def segment_docs(
    df: DataFrame,
    words_col: Column,
    id_col: str = "doc_id",
    seg_len: int = 3,
) -> DataFrame:
    """Split each doc's word array into consecutive ``seg_len``-word
    segments -> (id, seg_idx, segment string). The unit of corpus-level
    duplicate-segment removal (C4's line dedup, over synthetic
    fixed-width segments when documents carry no newlines). Segment
    construction is array HOF work (sequence/slice/array_join) under
    codegen; the posexplode is the only row expansion."""
    # greatest() guards the empty-array edge: Spark's sequence(0, -1)
    # DESCENDS ([0, -1] — the round-8 byte-tokens lesson), which would
    # fabricate two bogus segments for a zero-word doc; clamping yields
    # one empty segment, same as a ['']-word doc
    nseg = F.greatest(
        F.ceil(F.size(words_col) / F.lit(seg_len)).cast("int"), F.lit(1)
    )
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(words_col, i * seg_len + 1, seg_len), " "),
    )
    return df.select(id_col, F.posexplode(segs).alias("seg_idx", "segment"))


def chunk_sliding_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-width word windows per document — the context-
    window chunking step of a pretraining/RAG pipeline (stride < window
    gives ``window - stride`` words of overlap so no boundary context is
    lost). Starts are 0, stride, 2*stride, …; the final window truncates
    at the document end.

    All per-row HOF work (sequence/slice/array_join) under codegen; the
    posexplode is the only row expansion, so the op is map-only — no
    shuffle at any corpus size, and chunk ids are deterministic
    (doc_id, chunk_idx) regardless of partitioning.

    Returns (id, chunk_idx, n_words, chunk_text).
    """
    if not 0 < stride <= window:
        raise ValueError("require 0 < stride <= window")
    from azure_etl_spark.operators.dedup import normalized_text

    words = F.split(normalized_text(text_col), " ")
    n = F.size(words)
    nw = (
        F.lit(1)
        + F.ceil(F.greatest(n - window, F.lit(0)).cast("double") / F.lit(float(stride)))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda i: F.array_join(F.slice(words, i * stride + 1, window), " "),
    )
    out = df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return out.select(
        id_col,
        "chunk_idx",
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_words"),
        "chunk_text",
    )


def remove_duplicate_segments(
    df: DataFrame,
    words_col: Column,
    id_col: str = "doc_id",
    seg_len: int = 3,
    max_occurrences: int = 4,
) -> DataFrame:
    """Corpus-wide boilerplate removal: drop every segment whose exact
    text occurs in > ``max_occurrences`` documents, reassemble the
    survivors in document order -> (id, cleaned_text, n_seg_kept,
    n_seg_dropped).

    Plan shape at scale: one aggregation keyed by segment (the corpus-
    wide frequency table — this is the shuffle that MUST exist, dedup
    is a meeting of values), one join back (AQE picks broadcast when
    the hot-segment table is small), one per-doc reassembly keyed by
    id. Reassembly sorts (seg_idx, segment) structs inside the row via
    array_sort — no window, no secondary shuffle.
    """
    segs = segment_docs(df, words_col, id_col, seg_len)
    # Join back only the BOILERPLATE subset (round 13, guide §3.2
    # spirit — shrink the joined side before it moves): the keep/drop
    # decision needs just "is this segment hot", so the corpus-wide
    # frequency table collapses to the segments occurring in more than
    # ``max_occurrences`` docs — tiny by construction (boilerplate is
    # the exception, and the filter rides the aggregate) — and a LEFT
    # join + null test replaces the inner join against every distinct
    # segment. Results identical for non-NULL segments: every segment
    # row survives the left join exactly once, and ``__hot IS NULL``
    # <=> ``n_docs_with <= max_occurrences``. NULL-segment edge (a doc
    # whose ``words_col`` is NULL yields one NULL segment row): the old
    # inner join on 'segment' DROPPED such docs from the output; the
    # left join keeps them with cleaned_text '' and the NULL segment
    # counted in n_seg_kept — the deliberate behavior now (a document
    # should not vanish because its text was NULL; pinned by
    # test_remove_dup_segments_null_words_doc_kept). AQE picks the join
    # strategy from the hot table's runtime size (broadcast in the
    # common case).
    hot = (
        segs.groupBy("segment")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs_with"))
        .filter(F.col("n_docs_with") > max_occurrences)
        .select("segment", F.lit(1).alias("__hot"))
    )
    tagged = segs.join(hot, "segment", "left")
    kept = F.when(F.col("__hot").isNull(), 1).otherwise(0)
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__hot").isNull(),
                                F.struct("seg_idx", "segment"),
                            )
                        )
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("cleaned_text"),
            F.sum(kept).alias("n_seg_kept"),
            F.sum(1 - kept).alias("n_seg_dropped"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_dup: int = 2,
    by: str = "docs",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide exact-substring dedup (the ExactSubstr criterion of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): remove every word covered by a ``k``-gram that is
    duplicated in the corpus, and reassemble the rest ->
    (id, cleaned_text, n_words_kept, n_words_removed).

    ``by='docs'`` counts DISTINCT documents per gram (cross-document
    duplication, ``min_dup`` defaulting to 2); ``by='occurrences'``
    counts total occurrences, which additionally catches a span
    repeated within a single document — the paper's literal criterion.
    Both remove EVERY occurrence of a duplicated span (the conservative
    variant); keep-one-copy semantics would need a second global
    tie-break pass over the hit list.

    This matches the suffix-array formulation exactly at ``k``-token
    resolution: any duplicated span of length >= k is tiled by
    duplicated k-grams, so the union of duplicated k-windows IS the set
    of tokens inside cross-document duplicated spans of length >= k —
    no suffix array needed, just one frequency aggregation.

    Relation to the siblings: :func:`remove_duplicate_segments` keys on
    fixed SEGMENTS (boilerplate lines), so a duplicated span straddling
    a segment boundary escapes; this operator slides the window, so it
    cannot. :func:`decontaminate_spans` is the same coverage machinery
    against an external eval set instead of the corpus itself.

    Plan shape at scale: positional k-grams are map-side; ONE
    aggregation keyed by gram text builds the corpus frequency table
    (the shuffle that must exist — dedup is a meeting of values), the
    duplicated-gram subset (usually tiny) joins back against the
    positional grams (AQE broadcasts it when small), and coverage +
    reassembly are in-row array HOFs under codegen. The corpus rows
    themselves never shuffle. At 100 TB the gram-text shuffle key can
    be narrowed to xxhash64(gram) (8 bytes vs ~50), trading an
    astronomically unlikely hash-collision over-deletion — the same
    trade production implementations make; kept as text here so the
    DuckDB oracle can replay the exact pipeline.
    """
    from azure_etl_spark.operators.dedup import normalized_text

    if by not in ("docs", "occurrences"):
        raise ValueError(f"by must be docs|occurrences, got {by!r}")
    t = df.select(
        F.col(id_col), F.split(normalized_text(text_col), " ").alias("__w")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("__w") - k, F.lit(0)))
    pos_grams = t.select(
        id_col,
        F.posexplode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__w", i + 1, k)))
        ).alias("pos", "gram"),
    )
    freq = (
        F.count_distinct(F.col(id_col)) if by == "docs" else F.count(F.lit(1))
    )
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(freq.alias("__nd"))
        .filter(F.col("__nd") >= min_dup)
        .select("gram")
    )
    starts = (
        pos_grams.join(dup_grams, "gram")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__starts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + k - 1),
            )
        )
    )
    kept = F.filter(
        F.col("__w"), lambda w, i: ~F.array_contains(F.col("__covered"), i)
    )
    return (
        t.join(starts, id_col, "left")
        .withColumn("__covered", covered)
        .select(
            id_col,
            F.array_join(kept, " ").alias("cleaned_text"),
            F.size(kept).alias("n_words_kept"),
            (F.size("__w") - F.size(kept)).alias("n_words_removed"),
        )
    )
