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

from pyspark.sql import DataFrame


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
    """
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.dedup import normalized_text

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        hashed = df.withColumn("__h", F.md5(normalized_text(text_col)))
        try:
            seen = (
                spark.read.parquet(index_root)
                .filter(F.col("batch_id") != batch_id)
                .select("__h")
                .distinct()
            )
            hashed = hashed.join(seen, "__h", "left_anti")
        except Exception:  # first batch: no index yet
            pass
        first = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
        fresh = hashed.join(first, [id_col, "__h"], "left_semi")
        fresh.drop("__h").write.mode("overwrite").format("parquet").save(
            os.path.join(target_root, f"batch_id={batch_id}")
        )
        fresh.select("__h").write.mode("overwrite").format("parquet").save(
            os.path.join(index_root, f"batch_id={batch_id}")
        )

    return write
