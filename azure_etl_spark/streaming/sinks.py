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
