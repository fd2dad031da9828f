"""Join operator unit tests: asof semantics on a handmade case, salted
join equivalence, range join, broadcast plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_etl_spark.operators.joins import (
    asof_join,
    broadcast_join,
    equi_join,
    range_join,
    salted_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_handmade(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T10:00:05")),
         (2, "A", _ts("2024-01-01T10:00:00")),
         (3, "B", _ts("2024-01-01T09:00:00"))],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 100.0),
         ("A", _ts("2024-01-01T10:00:03"), 101.0),
         ("B", _ts("2024-01-01T12:00:00"), 50.0)],
        "sym string, qts timestamp, px double",
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts", right_cols=["px"]
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    # trade 1: latest quote <= 10:00:05 is 101; trade 2: exact-ts match 100;
    # trade 3: no quote yet -> null
    assert got == {1: 101.0, 2: 100.0, 3: None}


def test_salted_join_matches_equi(spark, sf_dir):
    from azure_etl_spark.sources.files import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = equi_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"])
    salted = salted_join(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", salt=8)
    assert plain.count() == salted.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_range_join(spark):
    points = spark.createDataFrame([(1, 5), (2, 15), (3, 25)], "id long, v long")
    bands = spark.createDataFrame(
        [(0, 9, "low"), (10, 19, "mid"), (20, 29, "high")], "lo long, hi long, band string"
    )
    out = range_join(points, bands, "v", "lo", "hi")
    got = {r["id"]: r["band"] for r in out.collect()}
    assert got == {1: "low", 2: "mid", 3: "high"}


def test_broadcast_join_plan(spark, sf_dir):
    """The dim side must appear as a BroadcastExchange/BroadcastHashJoin
    — the fact scan never shuffles."""
    from azure_etl_spark.sources.files import load_table

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    j = broadcast_join(o, n, o.o_custkey % 25 == n.n_nationkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_chunked_interval_join_equals_naive(spark, sf_dir):
    """Chunk-decomposed interval join must equal the naive non-equi
    overlap join pair-for-pair, for a chunk width smaller AND larger
    than typical intervals (correctness must not depend on tuning)."""
    from pyspark.sql import functions as F

    from azure_etl_spark.operators.joins import chunked_interval_join
    from azure_etl_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("a_id"),
        F.unix_micros("ts").alias("as_"),
        (F.unix_micros("ts") + 900000000).alias("ae"),
    )
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"), F.col("event_id").alias("b_id"),
        F.unix_micros("ts").alias("bs"),
        (F.unix_micros("ts") + 300000000).alias("be"),
    )
    naive = (
        a.join(b, "user_id")
        .filter((F.col("as_") <= F.col("be")) & (F.col("bs") <= F.col("ae")))
        .select("a_id", "b_id")
    )
    want = sorted(map(tuple, naive.collect()))
    assert len(want) > 0
    for width in (60_000_000, 3_600_000_000):  # 1 min and 1 hour chunks
        got = sorted(
            map(
                tuple,
                chunked_interval_join(
                    a, b, ["user_id"], "as_", "ae", "bs", "be", width
                ).select("a_id", "b_id").collect(),
            )
        )
        assert got == want, f"width={width}"
