"""Exactly-once micro-batch sinks (foreachBatch patterns).

Structured Streaming guarantees each batch id is delivered at least
once to ``foreachBatch`` after a failure/restart — exactly-once output
is the SINK's job, achieved by making the write per-batch idempotent.
The standard pattern: key the output layout by ``batch_id`` and
overwrite, so a replayed batch replaces its own previous (possibly
partial) output instead of appending a duplicate.

The reference has no streaming at all (SURVEY.md §2.10 — its "stream"
is a bounded 180 s poll loop, etl-vini-azure.py:69-75); this module is
part of the engine's streaming capability extension, and the pattern is
what the poll-collector's micro-batches write through in production.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop FS API — works
    on any Hadoop-supported filesystem (local, HDFS, cloud object
    stores), unlike ``os.path`` which only sees the driver's disk."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _list_batch_ids(spark: SparkSession, root: str) -> list[int]:
    """Committed ``batch_id=N`` partition directories under ``root``
    (empty list if the root does not exist yet)."""
    fs, jpath = _hadoop_fs(spark, root)
    if not fs.exists(jpath):
        return []
    ids = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("batch_id="):
            ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def idempotent_batch_writer(
    target_root: str, fmt: str = "parquet"
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to its own
    ``batch_id=N`` directory with overwrite semantics.

    Replay-safe: if batch N is re-delivered after a crash, the rewrite
    lands in the same directory — readers of ``target_root`` (Hive-
    partitioned by ``batch_id``) never see duplicated rows. Scale: each
    batch writes only its own data; no global state, no read-back of
    the target, any number of concurrent historical batches retained.
    """

    def write(df: DataFrame, batch_id: int) -> None:
        path = os.path.join(target_root, f"batch_id={batch_id}")
        df.write.mode("overwrite").format(fmt).save(path)

    return write


def snapshot_append_writer(
    table_path: str,
    app_id: str,
    partition_by: list[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function appending each micro-batch to a
    versioned snapshot table (sources/snapshot.py) with transactional
    idempotence: the commit carries ``(txn_app_id=app_id,
    txn_version=batch_id)``, and the snapshot log's carried-forward
    ``txns`` map rejects a replayed batch id — the Delta
    ``txnAppId``/``txnVersion`` pattern without delta-spark.

    Versus :func:`idempotent_batch_writer` this gives readers a single
    atomically-versioned table (time travel, stats-based file skipping,
    compaction via ``compact_snapshot``) instead of a raw batch_id Hive
    layout. Scale: each commit writes only its batch's rows; the
    manifest append is metadata-sized.
    """
    from azure_etl_spark.sources.snapshot import write_snapshot

    def write(df: DataFrame, batch_id: int) -> None:
        write_snapshot(
            df,
            table_path,
            mode="append",
            partition_by=partition_by,
            txn_app_id=app_id,
            txn_version=batch_id,
        )

    return write


def incremental_dedup_writer(
    target_root: str,
    index_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function for streaming corpus ingest with
    cross-batch exact dedup: the production shape of
    ``operators/dedup.incremental_dedup`` (batch twin, same md5-of-
    normalized-text canonicalization).

    Per micro-batch: (1) read the cumulative digest index — a Hive
    layout partitioned by ``batch_id``, so the read is a digest-only
    column scan, never the corpus; (2) drop batch rows whose digest is
    already indexed, keep the min-id row per digest within the batch;
    (3) overwrite the batch's own ``batch_id=N`` directories in BOTH
    the corpus target and the index.

    Replay-safe like :func:`idempotent_batch_writer`, with one extra
    rule: the index read EXCLUDES the current batch id, so a replayed
    batch is deduped against exactly the same "seen" set as its first
    delivery (including its own first-attempt digests would wrongly
    empty the replay). Steady-state cost per batch: one batch scan +
    one anti-join against digests — the corpus is never re-read.

    The missing-index (first-batch) case is detected EXPLICITLY via the
    Hadoop FS API rather than by swallowing read errors: a transiently
    unreadable or corrupt index fails the batch (the streaming query
    retries it) instead of silently admitting duplicates. ``fresh`` is
    materialized once before the two sink writes so the corpus and the
    digest index always agree even if the upstream plan were not
    bit-deterministic across re-evaluations.
    """
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.dedup import normalized_text

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        hashed = df.withColumn("__h", F.md5(normalized_text(text_col)))
        prior = [b for b in _list_batch_ids(spark, index_root) if b != batch_id]
        if prior:  # errors reading an index that EXISTS must propagate
            seen = (
                spark.read.option("basePath", index_root)
                .parquet(
                    *[os.path.join(index_root, f"batch_id={b}") for b in prior]
                )
                .select("__h")
                .distinct()
            )
            hashed = hashed.join(seen, "__h", "left_anti")
        first = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
        fresh = hashed.join(first, [id_col, "__h"], "left_semi")
        # one evaluation feeds both sinks (corpus and index stay in step)
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop("__h").write.mode("overwrite").format("parquet").save(
            os.path.join(target_root, f"batch_id={batch_id}")
        )
        fresh.select("__h").write.mode("overwrite").format("parquet").save(
            os.path.join(index_root, f"batch_id={batch_id}")
        )

    return write


def compact_digest_index(
    spark: SparkSession, index_root: str, cols: tuple = ("__h",)
) -> int:
    """Consolidate the digest index written by
    :func:`incremental_dedup_writer` so a long-running stream does not
    accumulate one tiny ``batch_id=N`` directory per micro-batch forever
    (unbounded file count over bounded data). ``cols`` names the index
    key columns — default the text digest; pass
    ``("media_type", "__sig")`` for the perceptual signature index of
    :func:`incremental_media_dedup_writer` (same layout, same replay
    rule, same compaction).

    All batch partitions EXCEPT the latest are rewritten into the
    highest compacted partition; the latest is left untouched because it
    is the only batch Structured Streaming can still replay (earlier
    batches are committed in the checkpoint), and a replay of batch N
    must keep excluding exactly ``batch_id=N``. Crash-safe/idempotent:
    the consolidated digests are written (overwrite) into the kept
    directory FIRST, then the absorbed directories are deleted — a crash
    in between leaves duplicate digests, which the reader's
    ``distinct()`` already tolerates, and a re-run converges.

    Returns the number of batch directories absorbed (0 if there was
    nothing to compact).
    """
    ids = _list_batch_ids(spark, index_root)
    if len(ids) < 3:  # latest + at most one committed dir: nothing to merge
        return 0
    absorb, keep = ids[:-2], ids[-2]
    paths = [
        os.path.join(index_root, f"batch_id={b}") for b in absorb + [keep]
    ]
    merged = (
        spark.read.option("basePath", index_root)
        .parquet(*paths)
        .select(*cols)
        .distinct()
        .localCheckpoint(eager=True)  # fully read before overwriting a source dir
    )
    merged.write.mode("overwrite").format("parquet").save(
        os.path.join(index_root, f"batch_id={keep}")
    )
    fs, _ = _hadoop_fs(spark, index_root)
    jvm = spark._jvm
    for b in absorb:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(index_root, f"batch_id={b}")
            ),
            True,
        )
    return len(absorb)


def incremental_text_near_dup_writer(
    target_root: str,
    index_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 2,
    threshold_num: int = 3,
    threshold_den: int = 5,
    bucket_cap: int = 1024,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function for streaming TEXT ingest with
    cross-batch NEAR-dup dedup — the text twin of
    :func:`incremental_media_dedup_writer` (round 8, VERDICT r7 #1):
    :func:`incremental_dedup_writer` only matches exact digests, so a
    lightly-edited duplicate of an already-ingested document sailed
    through streaming ingest while the media path caught the
    perceptual equivalent.

    Per micro-batch: (1) derive per-doc signatures ONCE — the md5
    content digest, the ``num_hashes``-element MinHash signature
    (operators/dedup.with_minhash math: ``xxhash64(shingle, k)``
    min-folded per seed), and the xxhash64'd distinct-shingle set
    (what exact Jaccard needs, without ever re-reading text);
    (2) within-batch EXACT collapse: keep the min id per digest (one
    linear aggregate — the hot case of many identical docs never
    reaches pair mining); (3) read the cumulative signature index
    (Hive ``batch_id=N`` layout holding ``(__h, __sig, __grams)`` —
    signatures only, never text) EXCLUDING the current batch id, then
    drop batch docs in two stages mirroring the media writer: first a
    LINEAR exact digest equi-join (an already-indexed document can
    never be admitted, cap-independent — the adversarial hot bucket of
    one document flooding every batch resolves here), then the LSH
    band-bucket candidate join (band keys recomputed from the stored
    MinHash signatures on BOTH sides — same ``xxhash64(concat_ws)``
    key as operators/dedup._banded_candidates) with the INDEX side
    capped at ``bucket_cap`` rows per (band, bkey) bucket and capped
    buckets reported to ``_overflow_index/batch_id=N`` (a capped
    bucket's near-misses may be admitted — best-effort recall, never
    silent); candidates are verified with EXACT Jaccard over the
    stored shingle-hash sets (``minhash_verified_near_dup``'s verify,
    gram sets fetched by id AFTER the distinct candidate pairs are
    derived, so the wide arrays never ride the bucket shuffle) at
    ``threshold_num/threshold_den`` (integer ratio — deterministic,
    replayable); (4) within-batch near-dup: the same banded self-join
    (id_a < id_b), capped per bucket with overflow to
    ``_overflow/batch_id=N``, exact-Jaccard verified, keep the min id
    per verified pair; (5) overwrite the batch's own ``batch_id=N``
    dirs in BOTH the corpus target and the signature index.

    Replay-safe exactly like the digest/media writers: the index read
    excludes the current batch id, so a re-delivered batch dedups
    against the same "seen" set as its first attempt, and both writes
    overwrite the batch's own directories; a transiently unreadable
    EXISTING index fails the batch (explicit FS probe) instead of
    silently admitting duplicates.

    Scale: the index carries one row per ADMITTED doc — a 16-byte
    digest, ``num_hashes`` longs, and one long per distinct shingle
    (~the doc's token count x 8 bytes; bounded by the corpus, not by
    batch count) — and the per-batch cost is one linear scan of the
    batch + a band join bounded by ``bands x |batch|`` batch rows
    against capped index buckets; the corpus target is written once
    and never re-read.
    """
    from pyspark.sql import Window, functions as F

    from azure_etl_spark.operators.dedup import (
        _shingles,
        normalized_text,
        with_minhash,
    )

    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")

    def _band_keys(df: DataFrame, keep: list[str]) -> DataFrame:
        """Explode (band, bkey) from the ``__sig`` array — the exact
        band-key expression of operators/dedup._banded_candidates, so
        batch-side and index-side keys agree by construction."""
        return df.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.concat_ws(
                                    ",",
                                    *[
                                        F.col("__sig")[b * rows_per_band + r]
                                        for r in range(rows_per_band)
                                    ],
                                )
                            ).alias("bkey"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(*keep, "bk.band", "bk.bkey")

    def _jaccard_ok(ga, gb):  # exact Jaccard >= num/den, pure integers
        inter = F.size(F.array_intersect(ga, gb))
        union = F.size(ga) + F.size(gb) - inter
        return inter * F.lit(threshold_den) >= union * F.lit(threshold_num)

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        hashed = (
            with_minhash(df, text_col, num_hashes, shingle_n, out_col="__sig")
            .withColumn("__h", F.md5(normalized_text(text_col)))
            .withColumn(
                "__grams",
                F.transform(_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)),
            )
        )
        # within-batch EXACT collapse first: min id per digest, linear
        first = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
        hashed = hashed.join(first, [id_col, "__h"], "left_semi")

        prior = [b for b in _list_batch_ids(spark, index_root) if b != batch_id]
        if prior:  # errors reading an index that EXISTS must propagate
            seen = (
                spark.read.option("basePath", index_root)
                .parquet(
                    *[os.path.join(index_root, f"batch_id={b}") for b in prior]
                )
                .select("__h", "__sig", "__grams")
                .dropDuplicates(["__h"])
            )
            # cross-batch stage 1 (LINEAR, cap-independent): exact digest
            hashed = hashed.join(
                seen.select(F.col("__h")), "__h", "left_anti"
            )
            # cross-batch stage 2: banded candidates, index side capped
            idx_rank = Window.partitionBy("band", "bkey").orderBy("__h")
            idx_all = _band_keys(seen, ["__h"]).withColumn(
                "__rn", F.row_number().over(idx_rank)
            )
            idx = idx_all.filter(F.col("__rn") <= bucket_cap).drop("__rn")
            idx_overflow = (
                idx_all.filter(F.col("__rn") > bucket_cap)
                .groupBy("band", "bkey")
                .agg((F.count("*") + F.lit(bucket_cap)).alias("n_rows"))
            )
            idx_overflow.write.mode("overwrite").format("parquet").save(
                os.path.join(index_root, "_overflow_index", f"batch_id={batch_id}")
            )
            # DISTINCT (batch id, index digest) pairs from small columns
            # only; the wide gram arrays join in afterwards by key
            cand = (
                _band_keys(hashed, [id_col])
                .join(
                    idx.select("band", "bkey", F.col("__h").alias("__ih")),
                    ["band", "bkey"],
                )
                .select(id_col, "__ih")
                .dropDuplicates()
            )
            dup_ids = (
                cand.join(
                    hashed.select(F.col(id_col), F.col("__grams").alias("__ga")),
                    id_col,
                )
                .join(
                    seen.select(
                        F.col("__h").alias("__ih"), F.col("__grams").alias("__gb")
                    ),
                    "__ih",
                )
                .filter(_jaccard_ok(F.col("__ga"), F.col("__gb")))
                .select(id_col)
                .dropDuplicates()
            )
            hashed = hashed.join(dup_ids, id_col, "left_anti")

        # within-batch near-dup: banded self-join (id_a < id_b) where
        # id_a comes from the capped per-bucket prefix and id_b stays
        # UNCAPPED — so an over-cap doc is still checked against every
        # capped keeper; only pairs whose BOTH members sit past the cap
        # are skipped (published via _overflow). Then exact-Jaccard
        # verify over the gram sets, keep min id.
        batch_rank = Window.partitionBy("band", "bkey").orderBy(id_col)
        bk_all = _band_keys(hashed, [id_col]).withColumn(
            "__rn", F.row_number().over(batch_rank)
        )
        bk = bk_all.filter(F.col("__rn") <= bucket_cap).drop("__rn")
        bk_overflow = (
            bk_all.filter(F.col("__rn") > bucket_cap)
            .groupBy("band", "bkey")
            .agg((F.count("*") + F.lit(bucket_cap)).alias("n_rows"))
        )
        bk_overflow.write.mode("overwrite").format("parquet").save(
            os.path.join(index_root, "_overflow", f"batch_id={batch_id}")
        )
        pair_cand = (
            bk.select("band", "bkey", F.col(id_col).alias("id_a"))
            .join(
                bk_all.drop("__rn").select(
                    "band", "bkey", F.col(id_col).alias("id_b")
                ),
                ["band", "bkey"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates()
        )
        grams = hashed.select(F.col(id_col), F.col("__grams"))
        losers = (
            pair_cand.join(
                grams.select(F.col(id_col).alias("id_a"), F.col("__grams").alias("__ga")),
                "id_a",
            )
            .join(
                grams.select(F.col(id_col).alias("id_b"), F.col("__grams").alias("__gb")),
                "id_b",
            )
            .filter(_jaccard_ok(F.col("__ga"), F.col("__gb")))
            .select(F.col("id_b").alias(id_col))
            .dropDuplicates()
        )
        hashed = hashed.join(losers, id_col, "left_anti")

        fresh = hashed.localCheckpoint(eager=True)
        fresh.drop("__h", "__sig", "__grams").write.mode("overwrite").format(
            "parquet"
        ).save(os.path.join(target_root, f"batch_id={batch_id}"))
        fresh.select("__h", "__sig", "__grams").write.mode("overwrite").format(
            "parquet"
        ).save(os.path.join(index_root, f"batch_id={batch_id}"))

    return write


def incremental_media_dedup_writer(
    target_root: str,
    index_root: str,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_hamming: int = 3,
    bucket_cap: int = 1024,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function for streaming MEDIA ingest with
    cross-batch perceptual near-dup dedup — the multimodal sibling of
    :func:`incremental_dedup_writer` (round 6).

    Per micro-batch: (1) perceptual-hash the batch's payloads per
    modality (image dhash / audio fingerprint / video pooled dhash —
    one Arrow pass); (2) read the cumulative SIGNATURE index (Hive
    ``batch_id=N`` layout holding (media_type, signature) — 64-bit
    rows, never payloads) EXCLUDING the current batch id, and drop
    batch items within ``max_hamming`` of any indexed signature in two
    stages (round 7): first a LINEAR exact (modality, signature)
    equi-join — an already-indexed signature can never be admitted,
    cap-independent, and the adversarial hot bucket (one constant
    signature flooding batches) resolves here without chunk
    candidates — then the pigeonhole chunk join for residual
    near-misses (batch chunks x index chunks equi-join per modality,
    ``bit_count(xor)`` verify) with the INDEX side capped at
    ``bucket_cap`` rows per (modality, chunk) bucket and capped
    buckets reported to ``_overflow_index/batch_id=N`` (a capped
    row's near-misses may be admitted — best-effort recall, never
    silent); (3) drop within-batch
    near-dups (keep the min id per connected pair group — transitive
    closure is unnecessary at hamming <= 3 granularity because the
    keep-min rule reapplies per batch deterministically); identical
    signatures are collapsed FIRST by a linear keep-min aggregate (the
    doctrine of ``hash64_near_dup_pairs_with_overflow``: a hot bucket
    of identical sigs needs no pair mining), and the residual pair
    join is CAPPED at ``bucket_cap`` rows per (modality, chunk) bucket
    with the overflow report written to
    ``{index_root}/_overflow/batch_id=N`` (overwrite — replay-safe;
    the underscore prefix keeps it out of ``_list_batch_ids`` and
    Spark partition discovery); (4) overwrite
    the batch's own ``batch_id=N`` dirs in BOTH the media target and
    the signature index. BOTH pair joins are scoped by ``media_type``
    (the scope column rides the chunk equi-join key): signatures only
    ever compare within a modality, so a WAV whose fingerprint lands
    within hamming <= 3 of a PNM's dhash still keeps both items. Rows
    whose media_type has no hasher pass through to the target
    unharmed (and never enter the pair/index stages) — matching
    ``perceptual_hash_mixed``'s unknown-types-are-ignored contract.

    Replay-safe exactly like the text digest writer: the index read
    excludes the current batch, so a re-delivered batch dedups against
    the same "seen" set as its first attempt, and both writes overwrite
    the batch's own directories. A transiently unreadable EXISTING
    index fails the batch (explicit FS probe via ``_list_batch_ids``)
    instead of silently admitting duplicates. Steady-state cost: one
    hash pass over the batch + a join against 16-byte signature rows —
    payloads are written once and never re-read.
    """
    from pyspark.sql import functions as F

    from azure_etl_spark.plans.corpus_pipeline import perceptual_hash_mixed

    def _chunks(df: DataFrame, sig: str) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("cidx"),
                            F.shiftrightunsigned(F.col(sig), 16 * c)
                            .bitwiseAND(F.lit(0xFFFF))
                            .alias("cval"),
                        )
                        for c in range(4)
                    ]
                )
            ).alias("__ch"),
        ).select("*", "__ch.cidx", "__ch.cval").drop("__ch")

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        # LEFT join: rows whose media_type has no perceptual hasher
        # keep a null __ph and pass straight through to the target
        # (perceptual_hash_mixed's contract — unknown types are
        # ignored, not failed, and certainly not silently dropped);
        # they are excluded from the pair and index stages below.
        hashed = df.join(
            perceptual_hash_mixed(df, id_col=id_col),
            [id_col, "media_type"],
            "left",
        )
        # within-batch exact collapse runs FIRST (round 7): identical
        # signatures keep the min id via one linear aggregate —
        # exactly what the pair join's keep-min rule would decide for
        # hamming-0 groups (identical sigs are interchangeable w.r.t.
        # every other signature, so dropping non-min members early
        # changes nothing downstream) — and it shrinks BOTH the
        # cross-batch joins and the within-batch pair join before
        # they run. The classic hot bucket (10% blank images, one
        # signature) costs one aggregate here instead of a quadratic
        # self-join there.
        from pyspark.sql import Window

        sig_rank = Window.partitionBy("media_type", "__ph").orderBy(id_col)
        exact_losers = (
            hashed.filter(F.col("__ph").isNotNull())
            .select(id_col, "media_type", "__ph")
            .withColumn("__rn", F.row_number().over(sig_rank))
            .filter(F.col("__rn") > 1)
            .select(id_col)
        )
        hashed = hashed.join(exact_losers, id_col, "left_anti")
        prior = [b for b in _list_batch_ids(spark, index_root) if b != batch_id]
        if prior:  # errors reading an index that EXISTS must propagate
            seen = (
                spark.read.option("basePath", index_root)
                .parquet(
                    *[os.path.join(index_root, f"batch_id={b}") for b in prior]
                )
                .select("media_type", F.col("__sig"))
                .dropDuplicates()
            )
            # index side fully renamed so the equi-join keys are
            # unambiguous
            seen_r = seen.select(
                F.col("media_type").alias("__mt"), F.col("__sig")
            )
            # cross-batch stage 1 (LINEAR, cap-independent): an exact
            # signature match is a plain (modality, sig) equi-join —
            # an item whose signature is ALREADY indexed can never be
            # admitted, no matter how starved the capped chunk join
            # below is. This is also where the adversarial hot bucket
            # (one constant signature indexed + flooding the batch)
            # resolves: one equi-join row per batch item, no chunk
            # candidates at all.
            exact_dups = (
                hashed.filter(F.col("__ph").isNotNull())
                .select(id_col, "media_type", "__ph")
                .join(
                    seen_r,
                    (F.col("media_type") == F.col("__mt"))
                    & (F.col("__ph") == F.col("__sig")),
                    "left_semi",
                )
                .select(id_col)
            )
            hashed = hashed.join(exact_dups, id_col, "left_anti")
            # cross-batch stage 2: residual NEAR-miss chunk join
            # (hamming 1..max), index side capped per (modality,
            # chunk) bucket — one hot chunk value on both sides would
            # otherwise make candidates |batch bucket| x |index
            # bucket|. Capping the index side bounds candidates at
            # |batch chunks| x bucket_cap; a capped row's near-misses
            # may be ADMITTED (best-effort recall, exact dups never
            # are — stage 1), and the capped buckets are REPORTED to
            # _overflow_index/batch_id=N (no silent caps).
            from pyspark.sql import Window as W

            idx_rank = W.partitionBy("__mt", "__cidx", "__cval").orderBy(
                "__sig"
            )
            idx_all = _chunks(seen_r, "__sig").select(
                "__mt",
                "__sig",
                F.col("cidx").alias("__cidx"),
                F.col("cval").alias("__cval"),
            ).withColumn("__rn", F.row_number().over(idx_rank))
            idx = idx_all.filter(F.col("__rn") <= bucket_cap).drop("__rn")
            idx_overflow = (
                idx_all.filter(F.col("__rn") > bucket_cap)
                .groupBy(
                    F.col("__mt").alias("media_type"),
                    F.col("__cidx").alias("cidx"),
                    F.col("__cval").alias("cval"),
                )
                .agg((F.count("*") + F.lit(bucket_cap)).alias("n_rows"))
            )
            idx_overflow.write.mode("overwrite").format("parquet").save(
                os.path.join(index_root, "_overflow_index", f"batch_id={batch_id}")
            )
            cand = _chunks(
                hashed.filter(F.col("__ph").isNotNull()).select(
                    id_col, "media_type", "__ph"
                ),
                "__ph",
            ).join(
                idx,
                (F.col("media_type") == F.col("__mt"))
                & (F.col("cidx") == F.col("__cidx"))
                & (F.col("cval") == F.col("__cval")),
            )
            dup_ids = (
                cand.filter(
                    F.bit_count(F.col("__ph").bitwiseXOR(F.col("__sig")))
                    <= max_hamming
                )
                .select(id_col)
                .dropDuplicates()
            )
            hashed = hashed.join(dup_ids, id_col, "left_anti")
        # within-batch near-dup stage: the CAPPED pigeonhole pair join
        # over the (already exact-collapsed) per-modality signatures —
        # scoped by media_type exactly like the cross-batch join
        # above, so a WAV fingerprint colliding with a PNM dhash can
        # never pair — with the overflow report published under the
        # index's _overflow/ dir (no-silent-caps rule),
        # overwrite-per-batch like every other write here so replays
        # stay idempotent.
        from azure_etl_spark.operators.imagehash import (
            hash64_near_dup_pairs_with_overflow,
        )

        pairs, overflow = hash64_near_dup_pairs_with_overflow(
            hashed.filter(F.col("__ph").isNotNull()).select(
                F.col(id_col), F.col("media_type"), F.col("__ph")
            ),
            id_col,
            "__ph",
            max_hamming=max_hamming,
            scope_cols=("media_type",),
            bucket_cap=bucket_cap,
        )
        overflow.write.mode("overwrite").format("parquet").save(
            os.path.join(index_root, "_overflow", f"batch_id={batch_id}")
        )
        hashed = hashed.join(
            pairs.select(F.col("id_b").alias(id_col)).dropDuplicates(),
            id_col,
            "left_anti",
        )
        fresh = hashed.localCheckpoint(eager=True)
        fresh.drop("__ph").write.mode("overwrite").format("parquet").save(
            os.path.join(target_root, f"batch_id={batch_id}")
        )
        fresh.filter(F.col("__ph").isNotNull()).select(
            "media_type", F.col("__ph").alias("__sig")
        ).write.mode("overwrite").format("parquet").save(
            os.path.join(index_root, f"batch_id={batch_id}")
        )

    return write
