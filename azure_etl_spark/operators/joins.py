"""Join operators (SURVEY.md §2.4).

The reference implements no joins (single-table pipeline end-to-end);
the engine exposes Spark's full join surface because the query capability
is the point. These wrappers encode the *strategy* decisions that matter
at 100 TB:

- ``broadcast_join``: explicit ``F.broadcast`` on the small side — dim
  tables (region/nation/customer at warehouse scale) should never shuffle
  the fact table.
- ``equi_join``: plain shuffle join; AQE converts to broadcast at runtime
  when a side turns out small, and splits skewed partitions.
- ``semi_join`` / ``anti_join``: existence joins — no payload columns
  from the right side cross the shuffle.
- ``salted_join``: explicit skew mitigation: replicate the small side
  SALT ways, scatter the hot keys, join on (key, salt). Use when one key
  dominates (power-law user_ids) and AQE skew handling isn't enough.
- ``range_join`` / ``asof_join``: interval and as-of semantics composed
  from existing ops (bucketed equi-pre-join + filter; union+window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame, right: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    return left.join(right, on, how)


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact x dim with the dim replicated to every task — the fact side
    never shuffles. The only sane plan for star-schema joins at scale."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    partition_keys: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join: left.point BETWEEN right.lo AND right.hi,
    optionally co-keyed on equality columns first (always provide them at
    scale — a pure theta join is a broadcast nested loop).
    """
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    for k in partition_keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts within the same ``on`` key.

    Implemented as union + window (last_value over time) rather than a
    theta join: one shuffle on the key, linear in |left|+|right| — the
    composition Spark lacks natively but expresses cleanly.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.withColumn("__ts", F.col(right_ts)).withColumn("__side", F.lit(0))
    rt_sel = rt.select(
        on, "__ts", "__side", *[F.col(c).alias(f"__r_{c}") for c in right_cols]
    )
    lt_sel = lt.select(
        on, "__ts", "__side",
        *[F.lit(None).cast(rt.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        *[F.col(c) for c in left.columns if c != on],
    )
    merged = rt_sel.unionByName(lt_sel, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("__match_ts").isNotNull()
            & (F.col("__ts").cast("long") - F.col("__match_ts").cast("long") <= tolerance_seconds)
        )
        out = out.select(
            "*",
            *[
                F.when(in_tol, F.col(f"__f_{c}")).alias(f"__t_{c}")
                for c in right_cols
            ],
        )
        keep = [F.col(f"__t_{c}").alias(c) for c in right_cols]
    else:
        keep = [F.col(f"__f_{c}").alias(c) for c in right_cols]
    left_cols = [c for c in left.columns]
    return out.select(*[F.col(c) for c in left_cols], *keep)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: the (large, possibly skewed) left side
    gets a deterministic per-row salt, the (smaller) right side is
    replicated ``salt`` times, and the join key becomes
    ``(on..., salt)`` — a hot key's rows now spread over ``salt``
    reducers instead of melting one.

    Result set is identical to the unsalted join (proven in tests); cost
    is ``salt``x replication of the right side, so use it when AQE's
    skew-join split (enabled by the session factory) isn't available —
    e.g. bucketed/co-partitioned pipelines where AQE won't re-plan, or
    aggregation-free pipelines feeding a sink directly.
    """
    on = [on] if isinstance(on, str) else list(on)
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l2 = left.withColumn("__salt", salt_col)
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, [*on, "__salt"], how).drop("__salt")


def chunked_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    chunk_width: int,
) -> DataFrame:
    """Interval-overlap join ([l_start,l_end] x [r_start,r_end] overlap,
    equal ``keys``) as an EQUI-join on time chunks.

    A naive overlap join is a non-equi theta join — Spark plans
    BroadcastNestedLoopJoin (fine only when one side broadcasts) or a
    cartesian per key. The chunk trick restores hash-join scalability:
    every interval explodes into the fixed-width chunks it covers, the
    join runs on (keys..., chunk) — shuffle cost O(rows x avg chunks
    per interval) — and the exact overlap predicate filters chunk-level
    false positives. A pair sharing k chunks appears k times, so the
    result is distinct()-ed; callers must include per-row id columns in
    the projection for that to be correct (it is for any two id-carrying
    tables). Pick ``chunk_width`` near the typical interval length: too
    small multiplies the explode, too large degrades to per-key
    cartesian behavior.
    """
    w = F.lit(chunk_width)
    lc = left.withColumn(
        "__chunk",
        F.explode(
            F.sequence(F.floor(F.col(l_start) / w), F.floor(F.col(l_end) / w))
        ),
    )
    rc = right.withColumn(
        "__chunk",
        F.explode(
            F.sequence(F.floor(F.col(r_start) / w), F.floor(F.col(r_end) / w))
        ),
    )
    joined = lc.join(rc, [*keys, "__chunk"]).filter(
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )
    return joined.drop("__chunk").distinct()
