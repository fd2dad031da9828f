"""Named engine queries + their DuckDB oracle SQL.

This registry is the single source of truth for the driver contract
(``__spark_entry__.py``): every operator from SURVEY.md §2 that we claim
is implemented has an entry here — a PySpark builder ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, an equivalent ANSI SQL string the
DuckDB oracle runs on the same parquet fixtures.

Parity rules (the driver hash-compares values with columns sorted by
name):
- every computed column is aliased identically on both sides;
- aggregates over floating columns go through per-row DECIMAL casts so
  sums are exact and order-independent in both engines;
- date-part stamping uses a fixed ``AS_OF`` date (the reference stamps
  ``current_date()`` — silverToGold.scala:17-19 — which is not
  reproducible; as-of is an explicit parameter in this engine);
- DuckDB's bigint-returning functions (year, count, row_number) are cast
  to match Spark's types where they differ.

The crypto-shaped view (FIXTURES.md §1) derives the reference's table
``dbo.crypto(symbol, price)`` (etl-vini-azure.py:87-90) from lineitem.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_etl_spark.functions.json_fns import json_get
from azure_etl_spark.operators import text as T
from azure_etl_spark.operators.aggregate import grouped_min_max, union_all
from azure_etl_spark.operators.dedup import (
    distinct_rows,
    exact_text_dedup,
    first_per_key,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    normalized_text,
)
from azure_etl_spark.operators.derive import add_id, cast_all, stamp_date_parts, with_expr
from azure_etl_spark.operators.filters import filter_isin, top_k
from azure_etl_spark.operators.joins import anti_join, asof_join, broadcast_join, semi_join
from azure_etl_spark.operators.multimodal import attach_fake_media, media_byte_stats
from azure_etl_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
from azure_etl_spark.operators.windows import lag_lead_delta, over_partition, ranked_top_n
from azure_etl_spark.session import configure_for_oracle
from azure_etl_spark.sources.files import ensure_min_partitions, load_table

AS_OF = _dt.date(2024, 1, 15)  # fixed processing date for reproducible date stamping


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    # Either the oracle SQL string, or a zero-arg callable producing it.
    # Heavy oracles (LSH signature SQL literals: ~40 KB of hyperplane
    # doubles) pass a callable so module import stays cheap; the string
    # is built once at first `.oracle` access and memoized.
    oracle_src: str | Callable[[], str] | None
    description: str = ""
    bench: bool = False  # included in bench.py headline set
    tags: tuple = field(default=())

    @property
    def oracle(self) -> str | None:
        if callable(self.oracle_src):
            self.oracle_src = self.oracle_src()
        return self.oracle_src


QUERIES: dict[str, QuerySpec] = {}

# The driver's CORRECTNESS hash-check subset is 50 queries; the driver
# rotates a few names between rounds (r9 swapped in cdc/mor/restore, r10
# swapped those out for the DV-roundtrip and SQL-similarity flagships).
# Queries outside the current subset are verified by the local
# oracle-parity replay (tests/test_oracle_parity.py, same
# rows+schema+hash contract) but don't appear in the latest driver
# artifact. Docs must therefore say "driver query/row" ONLY for names in
# this set — tests/test_docs.py pins the set against the latest
# CORRECTNESS artifact and mechanically audits every "driver query/row"
# claim in README/SURVEY/SCALE/PLANS against it (VERDICT r8 #4).
# Pinned to CORRECTNESS_r11.json (VERDICT r11 #1).
DRIVER_SUBSET: frozenset[str] = frozenset({
    "argmax_price_order", "asof_purchase_last_error",
    "cosine_topk", "cube_lineitem", "date_parts_orders", "dedup_distinct",
    "dedup_first_per_key", "distinct_agg_parts", "doc_exact_dedup",
    "dv_export_roundtrip_gold",
    "events_hourly_rollup", "filter_isin", "flagship_gold_minmax",
    "from_json_struct", "jdbc_roundtrip_gold", "join_anti_customers",
    "join_revenue_per_nation", "join_semi_customers", "json_extract_events",
    "json_roundtrip_events", "lsh_topk", "minhash_near_dup",
    "multimodal_meta", "ngram_jaccard_pairs", "pivot_user_events",
    "rollup_orders", "serving_cast_all_id", "sessionize_events",
    "set_except_parts", "set_intersect_customers", "snapshot_convert_gold",
    "snapshot_delete_skipping", "snapshot_merge_upsert",
    "snapshot_time_travel_gold",
    "sql_cosine_topk", "sql_lsh_topk", "sql_minhash_near_dup",
    "string_funcs_docs", "text_lang_id", "text_quality_score",
    "text_token_stats", "topk_orders", "tpch_q1ish", "tpch_q3ish",
    "tpch_q5ish", "union_snapshots", "window_lag_delta",
    "window_minmax_partition", "window_top3_per_customer",
    "word_freq_top20",
})


def _finalize(df: DataFrame) -> DataFrame:
    """Hash-robust driver boundary: cast DECIMAL outputs to DOUBLE.

    Aggregations run on DECIMAL internally so sums are exact and
    order-independent, but DECIMAL *output* is hash-fragile under the
    driver's pandas-level value compare (``Decimal('104087.90')`` vs
    ``104087.9`` — trailing-zero scale is preserved by Python Decimal but
    not by float).  decimal->double is correctly rounded in both Spark
    (BigDecimal.doubleValue) and DuckDB, and the fixtures' <=15
    significant digits make it injective, so equal decimals map to
    bit-identical doubles on both sides.  Oracle SQL applies the same
    outer ``CAST(... AS DOUBLE)``.
    """
    from pyspark.sql import types as _T

    dec = [f.name for f in df.schema.fields if isinstance(f.dataType, _T.DecimalType)]
    if dec:
        df = df.withColumns({c: F.col(c).cast("double") for c in dec})
    return df


# Oracle-side mirror of _finalize: these oracle SQLs aggregate on DECIMAL
# (for exact, order-independent sums) and must re-emit the listed columns
# as DOUBLE to match what _finalize produces on the Spark side.  Applied
# once at registration via DuckDB's `SELECT * REPLACE`, which preserves
# column names and positions.  tests/test_oracle_types.py DESCRIBEs every
# registered oracle and fails if any DECIMAL output survives, so a new
# query whose oracle emits DECIMAL cannot ship without an entry here (or
# an inline CAST).
_ORACLE_DOUBLE_COLS: dict[str, tuple[str, ...]] = {
    "bucketed_join_revenue": ("revenue",),
    "conditional_agg_orders": ("urgent_total",),
    "date_spine_daily_events": ("total_value",),
    "gapfill_locf_daily": ("v_filled",),
    "grouping_sets_orders": ("total",),
    "hash_sample_orders": ("total",),
    "jdbc_roundtrip_gold": ("min_value_by_crypto", "max_value_by_crypto"),
    "join_revenue_per_nation": ("revenue",),
    "join_skewed_salted": ("revenue",),
    "loghist_bucket_orders": ("lo", "hi"),
    "kll_bucket_orders": ("lo", "hi"),
    "ntile_deciles_orders": ("lo", "hi"),
    "null_handling_customers": ("total_bal",),
    "orc_roundtrip_gold": ("min_value_by_crypto", "max_value_by_crypto"),
    "range_join_value_tiers": ("total_value",),
    "rolling_7d_revenue": ("rev_7d",),
    "rollup_orders": ("total",),
    "skew_salted_agg": ("total",),
    "cdf_export_changes": ("sum_price",),
    "snapshot_convert_gold": ("min_value_by_crypto", "max_value_by_crypto"),
    "sql_scalar_subquery_small_lot": ("small_rev",),
    "snapshot_time_travel_gold": ("min_value_by_crypto", "max_value_by_crypto"),
    "tpch_q10ish": ("revenue",),
    "tpch_q11ish": ("total",),
    "tpch_q14ish": ("promo_revenue", "total_revenue"),
    "tpch_q15ish": ("total_revenue",),
    "tpch_q17ish": ("small_lot_revenue",),
    "tpch_q19ish": ("revenue",),
    "tpch_q1ish": ("sum_qty", "sum_base_price", "sum_disc_price"),
    "tpch_q22ish": ("totacctbal",),
    "tpch_q2ish": ("supply_cost",),
    "tpch_q3ish": ("revenue",),
    "tpch_q5ish": ("revenue",),
    "tpch_q6ish": ("revenue",),
    "tpch_q7ish": ("revenue",),
    "tpch_q8ish": ("mkt_num", "mkt_den"),
    "tpch_q9ish": ("profit",),
    "unpivot_order_stats": ("val",),
    "upsert_orders_batch": ("total",),
    "window_running_revenue": ("running_total",),
}


def _oracle_double(sql: str, cols: tuple[str, ...]) -> str:
    reps = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({reps}) FROM (\n{sql}\n) _dblq"


def query(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    description: str = "",
    bench: bool = False,
):
    if oracle is not None and name in _ORACLE_DOUBLE_COLS:
        cols = _ORACLE_DOUBLE_COLS[name]
        if callable(oracle):
            _base = oracle

            def oracle():
                return _oracle_double(_base(), cols)

        else:
            oracle = _oracle_double(oracle, cols)

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _finalize(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(
            fn=wrapped, oracle_src=oracle, description=description, bench=bench
        )
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_for_oracle(spark)
    return load_table(spark, sf_dir, name)


def _td(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan fanned out for CPU-heavy text stages: the fixture
    parquet has a single row group (one scan task), so regex/shingling
    work would serialize on one core; ensure_min_partitions is a no-op
    on well-split inputs (see sources/files.py)."""
    return ensure_min_partitions(_t(spark, sf_dir, "documents"))


def crypto_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXTURES.md §1: the reference's crypto table shape from lineitem."""
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("symbol"),
        F.col("l_extendedprice").cast("decimal(10,2)").alias("price"),
    )


CRYPTO_SQL = (
    "WITH crypto AS (SELECT l_returnflag AS symbol, "
    "CAST(l_extendedprice AS DECIMAL(10,2)) AS price FROM lineitem)"
)


# ---------------------------------------------------------------- flagship

@query(
    "flagship_gold_minmax",
    oracle=f"""
    {CRYPTO_SQL}
    SELECT symbol,
           CAST(MIN(price) AS DOUBLE) AS min_value_by_crypto,
           CAST(MAX(price) AS DOUBLE) AS max_value_by_crypto,
           CAST(MAX(price) - MIN(price) AS DOUBLE) AS difference_between_min_max,
           CAST({AS_OF.year} AS INT) AS year,
           CAST({AS_OF.month} AS INT) AS month,
           CAST({AS_OF.day} AS INT) AS day
    FROM crypto GROUP BY symbol ORDER BY symbol
    """,
    description="Reference gold aggregation (silverToGold.scala:11-21): "
    "grouped min/max + decimal difference + as-of date parts + sort.",
    bench=True,
)
def flagship_gold_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = grouped_min_max(
        crypto_view(spark, sf_dir),
        keys=["symbol"],
        value="price",
        min_alias="min_value_by_crypto",
        max_alias="max_value_by_crypto",
    )
    gold = with_expr(
        gold,
        "difference_between_min_max",
        "max_value_by_crypto - min_value_by_crypto",
    )
    return stamp_date_parts(gold, as_of=AS_OF).orderBy("symbol")


# ---------------------------------------------------------------- dedup (exact)

@query(
    "dedup_distinct",
    oracle=f"{CRYPTO_SQL} SELECT symbol, CAST(price AS DOUBLE) AS price "
    "FROM (SELECT DISTINCT symbol, price FROM crypto)",
    description="A2 bronzeToSilver distinct() + sort "
    "(bronzeToSilver.scala:8-9), planned as ONE shuffle: range-"
    "partition first, dedup in place, re-sort within partitions "
    "(operators/dedup.py:distinct_sorted).",
    bench=True,
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import distinct_sorted

    return distinct_sorted(crypto_view(spark, sf_dir), ["symbol", "price"])


@query(
    "dedup_first_per_key",
    oracle=f"""
    {CRYPTO_SQL}
    SELECT symbol, CAST(price AS DOUBLE) AS price FROM (
      SELECT symbol, price,
             ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY price) AS rn
      FROM crypto) WHERE rn = 1
    """,
    description="Deterministic dropDuplicates: first row per key by order.",
)
def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return first_per_key(crypto_view(spark, sf_dir), keys=["symbol"], order_by=["price"])


# ---------------------------------------------------------------- filter / sort / limit

@query(
    "filter_isin",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem WHERE l_returnflag IN ('A', 'N')
    """,
    description="P1 IN-list filter (etl-vini-azure.py:78); pushed to parquet scan.",
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return filter_isin(li, "l_returnflag", ["A", "N"]).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    description="O2 ordered top-k (SELECT TOP (100), query_synapse.png); "
    "plans as TakeOrderedAndProject — no global sort.",
    bench=True,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return top_k(o, 100, F.col("o_totalprice").desc(), F.col("o_orderkey").asc())


@query(
    "union_snapshots",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n FROM (
      SELECT * FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL SELECT * FROM orders WHERE o_orderkey % 2 = 1
    ) GROUP BY o_orderstatus
    """,
    description="A4 micro-batch union (etl-vini-azure.py:75,77) + count per key.",
)
def q_union_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    halves = [o.filter(F.col("o_orderkey") % 2 == 0), o.filter(F.col("o_orderkey") % 2 == 1)]
    return union_all(halves).groupBy("o_orderstatus").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------- derive / serve

@query(
    "date_parts_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAYOFMONTH(o_orderdate) AS INT) AS order_day
    FROM orders
    """,
    description="P5/F1 date parts (silverToGold.scala:17-19) on fixture dates.",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
    )


@query(
    "serving_cast_all_id",
    oracle=f"""
    {CRYPTO_SQL}, gold AS (
      SELECT symbol,
             MIN(price) AS min_value_by_crypto,
             MAX(price) AS max_value_by_crypto,
             MAX(price) - MIN(price) AS difference_between_min_max,
             CAST({AS_OF.year} AS INT) AS year,
             CAST({AS_OF.month} AS INT) AS month,
             CAST({AS_OF.day} AS INT) AS day
      FROM crypto GROUP BY symbol)
    SELECT CAST(symbol AS VARCHAR) AS symbol,
           CAST(min_value_by_crypto AS VARCHAR) AS min_value_by_crypto,
           CAST(max_value_by_crypto AS VARCHAR) AS max_value_by_crypto,
           CAST(difference_between_min_max AS VARCHAR) AS difference_between_min_max,
           CAST(year AS VARCHAR) AS year,
           CAST(month AS VARCHAR) AS month,
           CAST(day AS VARCHAR) AS day,
           CAST(ROW_NUMBER() OVER (ORDER BY symbol) - 1 AS VARCHAR) AS id
    FROM gold
    """,
    description="P6+P7 serving prep (goldToCosmosdb.scala:26-33): cast-all-string "
    "+ synthetic id (deterministic row_number variant for the oracle).",
)
def q_serving_cast_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = flagship_gold_minmax(spark, sf_dir)
    return cast_all(add_id(gold, deterministic_order=["symbol"]))


# ---------------------------------------------------------------- joins

@query(
    "join_revenue_per_nation",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    description="Star-schema join (engine extension, SURVEY §2.4): fact x two "
    "broadcast dims + grouped agg; fact side never shuffles pre-agg.",
    bench=True,
)
def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = broadcast_join(o, c, o.o_custkey == c.c_custkey)
    j = broadcast_join(j, n, c.c_nationkey == n.n_nationkey)
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("revenue"),
    )


@query(
    "join_semi_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="Left-semi join: customers with >=1 order; right payload never shuffles.",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return semi_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@query(
    "join_anti_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="Left-anti join: customers with no orders.",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return anti_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


# ---------------------------------------------------------------- windows

@query(
    "window_minmax_partition",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           MIN(l_extendedprice) OVER (PARTITION BY l_returnflag) AS min_price_by_flag,
           MAX(l_extendedprice) OVER (PARTITION BY l_returnflag) AS max_price_by_flag
    FROM lineitem
    """,
    description="§2.6 window twin of the gold aggregation: per-row min/max over "
    "partition (one shuffle on the key).",
    bench=True,
)
def q_window_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return over_partition(
        li,
        partition_by=["l_returnflag"],
        aggs={
            "min_price_by_flag": F.min("l_extendedprice"),
            "max_price_by_flag": F.max("l_extendedprice"),
        },
    )


@query(
    "window_top3_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
    description="Ranked top-n per group (deterministic tiebreak).",
)
def q_window_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return ranked_top_n(
        o,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        n=3,
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
    description="Lag/lead time-series delta per user.",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return lag_lead_delta(
        e, partition_by=["user_id"], order_by=["ts", "event_id"], value="value",
        delta_col="delta",
    ).select("event_id", "user_id", "delta")


# ---------------------------------------------------------------- scalar functions

@query(
    "string_funcs_docs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           regexp_extract(trim(text), '(\\S+)$', 1) AS last_word,
           upper(source) AS source_upper,
           CAST(length(trim(text)) AS INT) AS n_chars_trim,
           substr(text, 1, 10) AS prefix10
    FROM documents
    """,
    description="F3-F5 string functions (regexp_extract/trim/upper/substr) "
    "— the log-scrape chain (etl-vini-azure.py:134,175-180) vectorized.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract(F.trim(F.col("text")), r"(\S+)$", 1).alias("last_word"),
        F.upper("source").alias("source_upper"),
        F.length(F.trim(F.col("text"))).alias("n_chars_trim"),
        F.substring("text", 1, 10).alias("prefix10"),
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
    description="S2/F7 JSON decode (pd.read_json -> get_json_object), distributed.",
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select("event_id", json_get("props", "k").cast("int").alias("k"))


# ---------------------------------------------------------------- time aggregation

@query(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    description="§2.10 batch twin of the tumbling-window stream agg "
    "(same result the streaming path produces with availableNow).",
    bench=True,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "tpch_q1ish",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-shaped pricing summary (decimal-exact sums).",
    bench=True,
)
def q_tpch_q1ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("decimal(18,4)")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------- as-of join

@query(
    "asof_purchase_last_error",
    oracle="""
    SELECT p.event_id, p.user_id, e.value AS last_error_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    description="As-of join (engine extension): latest error state per user at "
    "each purchase; union+window implementation — one shuffle, no theta join.",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value")
    )
    joined = asof_join(
        purchases,
        errors,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
    )
    return joined.select(
        "event_id", "user_id", F.col("value").alias("last_error_value")
    )


# ---------------------------------------------------------------- text analysis

_SW = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# Empty/whitespace-only guard mirrors operators/text.tokens(): Spark
# returns an empty array there, while a bare string_split_regex('') in
# DuckDB returns [''] (len 1) — without the CASE the oracles diverge on
# empty documents (ADVICE r4).
_TOKS_SQL = (
    "(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(text), '\\s+') END)"
)
_LTOKS_SQL = (
    "(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END)"
)


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS_SQL}) AS INT) AS n_tokens,
           CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> len(x) > 0)) AS INT) AS n_subtokens,
           CASE WHEN len({_LTOKS_SQL}) = 0 THEN 0.0
                ELSE CAST(len(list_filter({_LTOKS_SQL}, x -> x IN ({_SW}))) AS DOUBLE)
                     / CAST(len({_LTOKS_SQL}) AS DOUBLE) END AS stopword_ratio,
           md5({_NORM_SQL}) AS fp
    FROM documents
    """,
    description="Token counting (whitespace + BPE-ish regex), stopword ratio, "
    "md5 content fingerprint — map-only text statistics.",
    bench=True,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.size(T.bpe_ish_tokens("text")).alias("n_subtokens"),
        T.stopword_ratio("text").alias("stopword_ratio"),
        T.fingerprint("text").alias("fp"),
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {" ,".join(
                 f"len(list_filter({_LTOKS_SQL}, x -> x IN ({', '.join(chr(39) + w + chr(39) for w in ws)}))) AS s_{lang}"
                 for lang, ws in T.STOPWORDS.items()
             )}
      FROM documents)
    SELECT doc_id, lang AS lang_actual,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM scored
    """,
    description="Stopword-vote language ID heuristic (deterministic tie-break).",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        T.lang_id("text").alias("lang_pred"),
    )


@query(
    "doc_exact_dedup",
    oracle=f"""
    WITH h AS (SELECT doc_id, lang, source, md5({_NORM_SQL}) AS hh FROM documents),
         k AS (SELECT hh, MIN(doc_id) AS doc_id FROM h GROUP BY hh)
    SELECT h.doc_id, h.lang, h.source FROM h JOIN k USING (doc_id, hh)
    """,
    description="Exact content-hash dedup over documents (min doc_id survives); "
    "shuffle carries 16-byte digests, not bodies.",
)
def q_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    return exact_text_dedup(d).select("doc_id", "lang", "source")


@query(
    "ngram_jaccard_pairs",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents WHERE doc_id < 200),
    grams AS (
      -- mirrors _shingles (operators/dedup.py) exactly, including
      -- short docs: window start runs 0..max(len-2, 0) and the slice
      -- truncates at the end, so a 1-word/empty doc yields one
      -- single-word (or empty-string) shingle, never zero rows
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                    generate_series(0, greatest(len(w) - 2, 0)),
                    i -> array_to_string(w[i + 1:i + 2], ' ')))) AS g
      FROM docs),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.2
    """,
    description="Exact word-bigram Jaccard near-dup pairs via inverted-index "
    "join (bounded subset; LSH is the scale path for candidate generation).",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(d, shingle_n=2, threshold=0.2)


@query(
    "minhash_near_dup",
    # The pipeline emits EXACT Jaccard for LSH-candidate pairs; with r=1
    # banding (bands == num_hashes) candidate recall at j>=0.2 is
    # 1-(1-j)^64 > 1-1e-6, so the output equals the brute-force answer
    # and an exact SQL oracle applies. The estimated-Jaccard candidate
    # stage alone stays covered by tests/test_dedup_similarity.py.
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents WHERE doc_id < 200),
    grams AS (
      -- mirrors _shingles (operators/dedup.py) exactly, including
      -- short docs: window start runs 0..max(len-2, 0) and the slice
      -- truncates at the end, so a 1-word/empty doc yields one
      -- single-word (or empty-string) shingle, never zero rows
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                    generate_series(0, greatest(len(w) - 2, 0)),
                    i -> array_to_string(w[i + 1:i + 2], ' ')))) AS g
      FROM docs),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.2
    """,
    description="MinHash(64)+LSH near-dup pipeline: band-bucket candidate "
    "equi-join (never all-pairs) + exact-Jaccard verify stage; oracle is "
    "the exact brute-force answer (recall-1 banding at fixture scale).",
    bench=True,
)
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import minhash_verified_near_dup

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_verified_near_dup(
        d, num_hashes=64, bands=64, shingle_n=2, threshold=0.2
    )


# ---------------------------------------------------------------- similarity search

@query(
    "cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS sim
      FROM embeddings e, q)
    SELECT vec_id, ROUND(sim, 6) AS cosine_sim
    FROM s ORDER BY sim DESC, vec_id LIMIT 10
    """,
    description="Brute-force exact cosine top-k against one query vector: "
    "map-only scan + TakeOrderedAndProject, the ANN correctness baseline.",
    bench=True,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = brute_force_topk(e, [float(x) for x in qvec], k=10)
    return out.select("vec_id", F.round("cosine_sim", 6).alias("cosine_sim"))


@query(
    "sql_minhash_near_dup",
    # identical contract to minhash_near_dup (same pipeline, same
    # threshold, same slice) so the exact brute-force oracle is shared
    oracle=lambda: QUERIES["minhash_near_dup"].oracle,
    description="The flagship near-dup join from PURE SQL (round 10, "
    "VERDICT r9 #6 / SURVEY §4): eng_minhash_sig / eng_minhash_bands / "
    "eng_shingles are SQL-expression functions (codegen-inlined — a "
    "Python UDTF would drag rows through Python workers), so the whole "
    "MinHash(64) -> band-bucket self-join -> exact-Jaccard pipeline is "
    "one spark.sql string with the SAME plan shape as the DataFrame "
    "operator. Output is bit-identical to minhash_verified_near_dup "
    "(equivalence-tested in tests/test_sql_udfs.py) and hash-matches "
    "the same brute-force oracle.",
)
def q_sql_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    _t(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 200
    ).createOrReplaceTempView("v_docs_sqlsim")
    return spark.sql("""
        WITH sig AS (SELECT doc_id, eng_minhash_sig(text) AS mh,
                            eng_shingles(text, 2) AS sh
                     FROM v_docs_sqlsim),
        banded AS (SELECT doc_id, eng_minhash_bands(mh, 64) AS bands FROM sig),
        b AS (SELECT doc_id, bk.band, bk.bkey
              FROM banded LATERAL VIEW explode(bands) t AS bk),
        cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
                 FROM b l JOIN b r ON l.band = r.band AND l.bkey = r.bkey
                                  AND l.doc_id < r.doc_id)
        SELECT id_a, id_b,
               CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / CAST(size(sa.sh) + size(sb.sh)
                      - size(array_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 AS jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = cand.id_a
        JOIN sig sb ON sb.doc_id = cand.id_b
        WHERE CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(size(sa.sh) + size(sb.sh)
                     - size(array_intersect(sa.sh, sb.sh)) AS DOUBLE) >= 0.2
    """)


@query(
    "sql_cosine_topk",
    oracle=lambda: QUERIES["cosine_topk"].oracle,
    description="Cosine top-k from PURE SQL via the eng_cosine scalar "
    "(round 10, VERDICT r9 #6): one-row query-vector cross join + "
    "ORDER BY/LIMIT (TakeOrderedAndProject) — the SQL twin of "
    "brute_force_topk, sharing cosine_topk's oracle.",
)
def q_sql_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("v_emb_sqlsim")
    return spark.sql("""
        WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
                   FROM v_emb_sqlsim),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        s AS (SELECT vec_id, eng_cosine(v, qv) AS sim FROM e, q)
        SELECT vec_id, ROUND(sim, 6) AS cosine_sim
        FROM s ORDER BY sim DESC, vec_id LIMIT 10
    """)


def _lsh_sig_sql(table: int, n_planes: int, dim: int, vec: str) -> str:
    """DuckDB expression reproducing with_lsh_signature's bit string for
    one hash table: the hyperplanes are deterministic (LCG-seeded), so
    the oracle can recompute the exact same buckets in SQL."""
    from azure_etl_spark.operators.similarity import _hyperplane

    bits = []
    for i in range(n_planes):
        plane = _hyperplane(table * 1000 + i + 1, dim)
        lit = "CAST([" + ",".join(repr(x) for x in plane) + "] AS DOUBLE[])"
        bits.append(
            f"(CASE WHEN list_inner_product({vec}, {lit}) >= 0 THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


def _lsh_topk_oracle(n_planes: int = 4, n_tables: int = 8, k: int = 5) -> str:
    cand_parts = []
    q_parts = []
    for t in range(n_tables):
        sig = _lsh_sig_sql(t, n_planes, 64, "v")
        cand_parts.append(f"SELECT {t} AS t, vec_id, v, {sig} AS sig FROM c")
        qsig = _lsh_sig_sql(t, n_planes, 64, "qv")
        q_parts.append(f"SELECT {t} AS t, q_id, qv, {qsig} AS sig FROM q")
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 4),
    cs AS ({' UNION ALL '.join(cand_parts)}),
    qs AS ({' UNION ALL '.join(q_parts)}),
    probed AS (
      SELECT qs.q_id, cs.vec_id,
             any_value(qs.qv) AS qv, any_value(cs.v) AS v
      FROM cs JOIN qs ON cs.t = qs.t AND cs.sig = qs.sig
      GROUP BY qs.q_id, cs.vec_id),
    scored AS (
      SELECT q_id, vec_id, list_cosine_similarity(v, qv) AS sim FROM probed)
    SELECT q_id, vec_id, ROUND(sim, 6) AS cosine_sim, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY sim DESC, vec_id) AS rn FROM scored)
    WHERE rn <= {k}
    """


@query(
    "lsh_topk",
    # The hyperplane family is deterministic, so the oracle recomputes
    # the SAME buckets in SQL and scores them exactly — this checks the
    # op end-to-end (signatures, multi-table probe union, dedup, exact
    # re-rank), not just "some rows came back". Recall vs brute force is
    # additionally asserted in tests on planted near-neighbors.
    oracle=_lsh_topk_oracle,
    description="LSH-bucketed approximate top-k (random hyperplanes, multi-table "
    "probe): equi-join on bucket signature replaces the cross score.",
)
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = lsh_bucketed_topk(queries, e, dim=64, k=5, n_planes=4, n_tables=8)
    return out.select(
        "q_id",
        "vec_id",
        F.round("cosine_sim", 6).alias("cosine_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def _lsh_sig_spark_sql(table: int, n_planes: int, dim: int, vec: str) -> str:
    """Spark-SQL expression for one hash table's LSH bit string —
    literal hyperplanes (the same deterministic LCG family the
    DataFrame operator embeds as plan constants) tested through
    ``eng_dot``, whose fold order matches functions/vectors.dot, so the
    SQL buckets are bit-identical to with_lsh_signature's."""
    from azure_etl_spark.operators.similarity import _hyperplane

    bits = []
    for i in range(n_planes):
        plane = _hyperplane(table * 1000 + i + 1, dim)
        lit = "array(" + ",".join(f"{x!r}D" for x in plane) + ")"
        bits.append(
            f"(CASE WHEN eng_dot({vec}, {lit}) >= 0D THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


@query(
    "sql_lsh_topk",
    # identical contract to lsh_topk (same hyperplane family, tables,
    # k, tie order) so the exact SQL-recompute oracle is shared
    oracle=_lsh_topk_oracle,
    description="Hyperplane-LSH approximate top-k from PURE SQL (round "
    "11, VERDICT r10 #7 — the last flagship without a SQL twin): per-"
    "table bucket signatures are codegen-inlined eng_dot sign tests "
    "over literal hyperplanes, candidates join queries per table on "
    "the signature, pairs dedup, and eng_cosine re-ranks — the same "
    "plan shape as lsh_bucketed_topk, bit-identical output "
    "(tests/test_sql_udfs.py).",
    bench=True,  # round 12 (VERDICT r11 #5): bench-protected like its
    # DataFrame twin — a regression in the SQL path's plan shape
    # (codegen-inlined sign tests, bucket join) shows up per-round
)
def q_sql_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    n_planes, n_tables, k = 4, 8, 5
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("v_emb_sqllsh")
    table_parts = [
        f"""SELECT c.vec_id, c.v, q.q_id, q.qv
            FROM (SELECT vec_id, v,
                         {_lsh_sig_spark_sql(t, n_planes, 64, 'v')} AS sig
                  FROM e) c
            JOIN (SELECT vec_id AS q_id, v AS qv,
                         {_lsh_sig_spark_sql(t, n_planes, 64, 'v')} AS sig
                  FROM e WHERE vec_id < 4) q
              ON c.sig = q.sig"""
        for t in range(n_tables)
    ]
    return spark.sql(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
                   FROM v_emb_sqllsh),
        probed AS ({' UNION ALL '.join(table_parts)}),
        pairs AS (SELECT q_id, vec_id, any_value(qv) AS qv, any_value(v) AS v
                  FROM probed GROUP BY q_id, vec_id),
        scored AS (SELECT q_id, vec_id, eng_cosine(v, qv) AS sim FROM pairs)
        SELECT q_id, vec_id, ROUND(sim, 6) AS cosine_sim,
               CAST(rn AS BIGINT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY sim DESC, vec_id) AS rn FROM scored)
        WHERE rn <= {k}
    """)


# ---------------------------------------------------------------- multimodal

@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS media_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS magic_hex,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width
    FROM documents
    """,
    description="Multimodal plumbing: opaque binary payload + typed metadata; "
    "JVM-only byte stats (decode kernels are stubbed; see operators/multimodal.py).",
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_fake_media(_t(spark, sf_dir, "documents"))
    s = media_byte_stats(d)
    return s.select(
        "doc_id",
        F.col("media_bytes").cast("int").alias("media_bytes"),
        F.lower("magic_hex").alias("magic_hex"),
        "width",
    )


# ---------------------------------------------------------------- set ops

@query(
    "set_intersect_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    description="§2.8 INTERSECT (set semantics): customers with both "
    "finished and open orders.",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query(
    "set_except_parts",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
    description="§2.8 EXCEPT: parts never ordered.",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return p.subtract(li)  # EXCEPT (set semantics)


# ---------------------------------------------------------------- grouping sets

@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    description="§2.5 ROLLUP subtotal hierarchy (status -> priority -> grand).",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import rollup_agg

    o = _t(spark, sf_dir, "orders")
    return rollup_agg(
        o,
        ["o_orderstatus", "o_orderpriority"],
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total"),
    )


@query(
    "cube_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="§2.5 CUBE over flag x status.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import cube_agg

    li = _t(spark, sf_dir, "lineitem")
    return cube_agg(li, ["l_returnflag", "l_linestatus"], F.count("*").alias("n"))


@query(
    "distinct_agg_parts",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    description="§2.5 multi distinct-aggregate (expand + two-phase agg in Spark).",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "pivot_user_events",
    # COUNT(*) FILTER keeps the oracle BIGINT and non-null; SUM(CASE..)
    # returns HUGEINT in DuckDB (pandas float64) and NULL for absent
    # combos — both hash-fragile even when values agree.
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS "click",
           COUNT(*) FILTER (WHERE event_type = 'view') AS "view",
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           COUNT(*) FILTER (WHERE event_type = 'signup') AS "signup",
           COUNT(*) FILTER (WHERE event_type = 'error') AS "error"
    FROM events GROUP BY user_id
    """,
    description="Pivot to wide counts (explicit value list — no discovery scan).",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import pivot_counts

    e = _t(spark, sf_dir, "events")
    return pivot_counts(
        e, "user_id", "event_type", ["click", "view", "purchase", "signup", "error"],
        fill_missing=0,
    )


@query(
    "argmax_price_order",
    oracle="""
    SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber FROM (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) rn
      FROM lineitem) WHERE rn = 1
    """,
    description="arg-max per group via max(struct(...)) — single hash agg, "
    "no window sort (the scale-friendly form).",
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import arg_max

    li = _t(spark, sf_dir, "lineitem")
    return arg_max(
        li,
        keys=["l_returnflag"],
        order_cols=["l_extendedprice", "l_orderkey", "l_linenumber"],
        payload=[],
    )


# ---------------------------------------------------------------- more scalar/json

@query(
    "from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
           event_type
    FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    """,
    description="S2 schema-full JSON decode: from_json to struct, field "
    "access, predicate on the decoded value.",
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k int"))
    return (
        parsed.filter(F.col("p.k") > 50)
        .select("event_id", F.col("p.k").alias("k"), "event_type")
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKS_SQL}) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chr,
             CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE) AS punct
      FROM documents)
    SELECT doc_id,
           ROUND(
             least(n_tok / 64.0, 1.0) * 0.5
             + (CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE n_chr / n_tok END)
                     BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.3
             + (1.0 - (CASE WHEN n_chr = 0 THEN 0.0
                       ELSE least(punct / n_chr * 4.0, 1.0) END)) * 0.2,
             6) AS quality
    FROM m
    """,
    description="Deterministic heuristic quality score in [0,1] "
    "(length/token-shape/punctuation) — pure arithmetic, oracle-exact.",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    return d.select("doc_id", T.quality_score("text").alias("quality"))


@query(
    "word_freq_top20",
    oracle="""
    WITH w AS (
      SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS word
      FROM documents)
    SELECT word, COUNT(*) AS n FROM w
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
    description="F7-style explode: tokenize -> explode -> count -> "
    "ordered top-k (TakeOrderedAndProject after partial agg).",
)
def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    words = d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


# ---------------------------------------------------------------- sessionization

@query(
    "sessionize_events",
    oracle="""
    WITH flags AS (
      SELECT event_id, user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS session_id
    FROM flags
    """,
    description="Gap-based sessionization (30 min): lag -> boundary flag -> "
    "running sum; one shuffle serves both windows.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.windows import sessionize

    e = _t(spark, sf_dir, "events")
    return sessionize(
        e, ["user_id"], "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    ).select("event_id", "user_id", "session_id")


# ---------------------------------------------------------------- TPC-H shapes

@query(
    "tpch_q3ish",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    description="TPC-H Q3 shape: selective dim filter -> broadcast join -> "
    "grouped revenue -> ordered top-k.",
    bench=True,
)
def q_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    # customer (selective dim) broadcasts into orders; lineitem x (o x c)
    # is left to AQE — at 100 TB orders is fact-sized and must not be
    # broadcast, locally AQE converts it to broadcast anyway
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    j = li.join(oc, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("decimal(18,4)")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5ish",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC
    """,
    description="TPC-H Q5 shape: 6-table star join, local-supplier "
    "condition, revenue per nation (dims broadcast, fact never shuffles "
    "until the final small agg).",
)
def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # true dims broadcast; lineitem x orders and x customer stay
    # shuffle-joinable (fact-sized at scale; AQE upgrades them locally)
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("decimal(18,4)")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------- JDBC roundtrip

@query(
    "jdbc_roundtrip_gold",
    oracle=f"""
    {CRYPTO_SQL}
    SELECT symbol,
           MIN(price) AS min_value_by_crypto,
           MAX(price) AS max_value_by_crypto
    FROM crypto GROUP BY symbol
    """,
    description="S3/K1 JDBC scan+sink round trip through embedded Derby "
    "(the jars Spark ships): write gold, read it back. Replaces the "
    "reference's row-loop INSERTs (etl-vini-azure.py:94-104) with the "
    "batched writer.",
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.jdbc import read_jdbc, write_jdbc

    gold = grouped_min_max(
        crypto_view(spark, sf_dir),
        keys=["symbol"],
        value="price",
        min_alias="min_value_by_crypto",
        max_alias="max_value_by_crypto",
    )
    db = tempfile.mkdtemp(prefix="derby_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    write_jdbc(gold, url, "gold_crypto", mode="overwrite", driver=drv)
    back = read_jdbc(spark, url, "gold_crypto", driver=drv)
    # Derby surfaces DECIMAL(10,2) unchanged; select in declared order
    return back.select("symbol", "min_value_by_crypto", "max_value_by_crypto")


# ---------------------------------------------------------------- file formats

@query(
    "json_roundtrip_events",
    oracle="""
    SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
    FROM events WHERE event_type = 'purchase'
    """,
    description="K-/S2 file-format roundtrip: filtered events staged as "
    "line-delimited JSON, read back with an explicit schema (no inference "
    "scan), projected. Values survive the text encoding bit-exactly "
    "(Spark uses shortest-roundtrip double formatting).",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.files import read_json, write_json

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    stage = tempfile.mkdtemp(prefix="json_stage_")
    write_json(e.select("event_id", "event_type", "value"), stage)
    back = read_json(spark, stage, schema="event_id long, event_type string, value double")
    return back.select("event_id", "event_type", "value")


@query(
    "snapshot_time_travel_gold",
    oracle=f"""
    {CRYPTO_SQL},
    gold AS (SELECT symbol,
                    MIN(price) AS min_value_by_crypto,
                    MAX(price) AS max_value_by_crypto
             FROM crypto GROUP BY symbol)
    SELECT symbol, min_value_by_crypto, max_value_by_crypto,
           CAST(0 AS INT) AS version FROM gold
    UNION ALL
    SELECT symbol, min_value_by_crypto, max_value_by_crypto,
           CAST(1 AS INT) AS version FROM gold WHERE symbol <> 'A'
    """,
    description="S6/K3 snapshot table format (sources/snapshot.py): gold "
    "committed as version 0, overwritten (atomically, manifest-swap) as a "
    "filtered version 1; the query reads BOTH the latest version and the "
    "time-travelled version 0 through read_table_format — the two Delta "
    "semantics (silverToGold.scala:27) the parquet fallback lacks, "
    "emulated without the environment-blocked delta-spark package.",
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.files import read_table_format, write_partitioned

    gold = grouped_min_max(
        crypto_view(spark, sf_dir),
        keys=["symbol"],
        value="price",
        min_alias="min_value_by_crypto",
        max_alias="max_value_by_crypto",
    )
    path = tempfile.mkdtemp(prefix="snap_") + "/gold"
    write_partitioned(gold, path, ["symbol"], fmt="snapshot")
    write_partitioned(
        gold.filter(F.col("symbol") != "A"), path, ["symbol"], fmt="snapshot"
    )
    v0 = read_table_format(spark, path, version=0).withColumn("version", F.lit(0))
    latest = read_table_format(spark, path).withColumn("version", F.lit(1))
    return v0.unionByName(latest).select(
        "symbol", "min_value_by_crypto", "max_value_by_crypto", "version"
    )


@query(
    "snapshot_convert_gold",
    oracle=f"""
    {CRYPTO_SQL},
    gold AS (SELECT symbol,
                    MIN(price) AS min_value_by_crypto,
                    MAX(price) AS max_value_by_crypto
             FROM crypto GROUP BY symbol)
    SELECT symbol, min_value_by_crypto, max_value_by_crypto,
           CAST(0 AS INT) AS version FROM gold
    UNION ALL
    SELECT symbol, min_value_by_crypto, max_value_by_crypto,
           CAST(1 AS INT) AS version FROM gold
    UNION ALL
    SELECT symbol, min_value_by_crypto, max_value_by_crypto,
           CAST(1 AS INT) AS version FROM gold WHERE symbol = 'A'
    """,
    description="CONVERT TO DELTA analogue end-to-end: gold written as a "
    "PLAIN partitioned parquet dir, adopted in place by "
    "convert_to_snapshot (O(metadata) renames, no rewrite — the 100 TB "
    "migration path), then appended through the snapshot log. Version 0 "
    "(the converted legacy data) and the post-convert latest are both "
    "read back — proving converted tables time-travel and append like "
    "any snapshot table.",
)
def q_snapshot_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.files import read_table_format
    from azure_etl_spark.sources.snapshot import convert_to_snapshot, write_snapshot

    gold = grouped_min_max(
        crypto_view(spark, sf_dir),
        keys=["symbol"],
        value="price",
        min_alias="min_value_by_crypto",
        max_alias="max_value_by_crypto",
    )
    path = tempfile.mkdtemp(prefix="snapconv_") + "/gold"
    gold.write.partitionBy("symbol").parquet(path)  # legacy plain layout
    convert_to_snapshot(spark, path, partition_by=["symbol"])
    write_snapshot(
        gold.filter(F.col("symbol") == "A"),
        path,
        mode="append",
        partition_by=["symbol"],
    )
    v0 = read_table_format(spark, path, version=0).withColumn("version", F.lit(0))
    latest = read_table_format(spark, path).withColumn("version", F.lit(1))
    return v0.unionByName(latest).select(
        "symbol", "min_value_by_crypto", "max_value_by_crypto", "version"
    )


@query(
    "snapshot_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey <= 2000
    ),
    source AS (
      SELECT o_orderkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM source
    UNION ALL
    SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice FROM target t
    ANTI JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
    description="Snapshot MERGE upsert (sources/snapshot.py "
    "merge_snapshot): WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT "
    "ALL with source-key-range file skipping — the Delta MERGE the "
    "environment-blocked delta-spark would provide "
    "(silverToGold.scala:27 gold layer maintenance). Oracle expresses "
    "the same semantics relationally: source rows replace matched "
    "target keys, unmatched target rows pass through.",
)
def q_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.snapshot import merge_snapshot, read_snapshot, write_snapshot

    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    target = orders.filter(F.col("o_orderkey") <= 2000).select(*cols)
    source = (
        orders.filter(F.col("o_orderkey").between(1000, 3000))
        .select(
            F.col("o_orderkey"),
            F.lit("M").alias("o_orderstatus"),
            (F.col("o_totalprice").cast("decimal(14,2)") * 2).alias("o_totalprice"),
        )
    )
    path = tempfile.mkdtemp(prefix="snap_merge_") + "/tbl"
    write_snapshot(target, path)
    merge_snapshot(spark, path, source, ["o_orderkey"])
    return read_snapshot(spark, path).select(*cols)


@query(
    "snapshot_delete_skipping",
    oracle="""
    WITH remaining AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders
      WHERE o_orderkey < 2000 AND o_orderkey NOT BETWEEN 800 AND 1200
    )
    SELECT CAST(2 AS INT) AS files_kept, CAST(1 AS INT) AS files_rewritten,
           COUNT(*) AS n_remaining,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM remaining
    """,
    description="Snapshot copy-on-write DELETE with per-file min/max "
    "stats (sources/snapshot.py delete_from_snapshot): three appends "
    "with disjoint o_orderkey ranges land as three files; deleting "
    "BETWEEN 800 AND 1200 provably touches only the middle file, so the "
    "other two are carried into the new version with zero IO. The "
    "oracle pins the skipping outcome (files_kept=2, files_rewritten=1) "
    "as constants — deterministic from the stats protocol — plus the "
    "surviving rows' count and exact DECIMAL sum.",
)
def q_snapshot_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="snap_del_") + "/tbl"
    for lo, hi, mode in ((0, 700, "overwrite"), (700, 1400, "append"), (1400, 2000, "append")):
        part = orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        write_snapshot(part, path, mode=mode)
    res = delete_from_snapshot(spark, path, [("o_orderkey", "between", (800, 1200))])
    remaining = read_snapshot(spark, path)
    return remaining.agg(
        F.lit(res["files_kept"]).cast("int").alias("files_kept"),
        F.lit(res["files_rewritten"]).cast("int").alias("files_rewritten"),
        F.count(F.lit(1)).alias("n_remaining"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
    )


@query(
    "dv_export_roundtrip_gold",
    oracle="""
    WITH first_file_min AS (
      SELECT MIN(o_orderkey) AS mk FROM orders WHERE o_orderkey < 700
    ),
    remaining AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey < 2000
        AND o_orderkey NOT BETWEEN 800 AND 1200
        AND o_orderkey NOT IN (3, 7, 1399)
        AND o_orderkey <> (SELECT mk FROM first_file_min)
    )
    SELECT CAST(2 AS INT) AS n_dv_files,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM remaining
    """,
    description="Deletion-vector EXPORT interop (round 10, "
    "sources/delta_export.py + sources/roaring.py; Delta PROTOCOL.md "
    "'Deletion Vector Format'): three single-file commits, mirror "
    "armed, then THREE merge-on-read delete shapes — a predicate "
    "delete, an equality-key delete, and a positional delete of the "
    "first file's physical row 0 — each exported BY THE COMMIT HOOK "
    "as real deletion vectors (roaring bitmaps in "
    "deletion_vector_<uuid>.bin, reader-3/writer-7 protocol upgrade). "
    "The read path then reconstructs the table EXCLUSIVELY from the "
    "exported log: replay the add actions, decode each add's DV "
    "(size/CRC framing verified), and anti-join the positions against "
    "_metadata.row_index — the snapshot manifest is never consulted. "
    "n_dv_files pins that exactly 2 live files carry DVs (the stats-"
    "scoped entries provably never touch the third); count and "
    "DECIMAL sum must match the relational recompute of all three "
    "delete shapes, so a wrong bitmap bit, a mis-derived DV path, or "
    "a missing re-add is a driver hash mismatch.",
)
def q_dv_export_roundtrip_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.delta_export import (
        _decode_deletion_vector,
        export_delta_log,
        replay_delta_log,
    )
    from azure_etl_spark.sources.snapshot import (
        _load_manifest,
        _manifest_files,
        delete_from_snapshot,
        delete_keys_from_snapshot,
        delete_positions_from_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="dv_exp_") + "/tbl"
    for lo, hi, mode in (
        (0, 700, "overwrite"),
        (700, 1400, "append"),
        (1400, 2000, "append"),
    ):
        part = (
            orders.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
            )
            .coalesce(1)
            .sortWithinPartitions("o_orderkey")  # pins physical row order
        )
        write_snapshot(part, path, mode=mode)
        if lo == 0:
            export_delta_log(spark, path)  # arm: the deletes self-mirror
    delete_from_snapshot(
        spark, path, [("o_orderkey", "between", (800, 1200))],
        mode="merge_on_read",
    )
    keys = spark.createDataFrame([(3,), (7,), (1399,)], "o_orderkey long")
    delete_keys_from_snapshot(spark, path, keys, ["o_orderkey"])
    m = _load_manifest(spark, path, 4)
    files, stats = _manifest_files(spark, path, m)
    first = min(files, key=lambda f: stats[f]["min"]["o_orderkey"])
    delete_positions_from_snapshot(spark, path, {first: [0]})

    # read back EXCLUSIVELY through the exported Delta log
    state = replay_delta_log(spark, path)
    root = path.rstrip("/")
    live = None
    n_dv = 0
    for rel in sorted(state["live"]):
        add = state["live"][rel]
        df = spark.read.parquet(f"{root}/{rel}")
        dv = add.get("deletionVector")
        if dv:
            n_dv += 1
            pos = _decode_deletion_vector(spark, path, dv)
            pdf = spark.createDataFrame([(int(p),) for p in pos], "___pos long")
            df = (
                df.withColumn("___pos", F.col("_metadata.row_index"))
                .join(F.broadcast(pdf), "___pos", "left_anti")
                .drop("___pos")
            )
        live = df if live is None else live.unionByName(df)
    return live.agg(
        F.lit(n_dv).cast("int").alias("n_dv_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
    )


@query(
    "delta_log_export_gold",
    oracle="""
    WITH remaining AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey < 2000 AND o_orderkey NOT BETWEEN 800 AND 1200
    )
    SELECT CAST(5 AS INT) AS n_log_versions,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM remaining
    """,
    description="Delta-transaction-log EXPORT interop (round 9, "
    "sources/delta_export.py; reference writes its gold layer with "
    ".format('delta'), silverToGold.scala:27): build a snapshot table "
    "(overwrite + 2 appends), arm the _delta_log mirror with one "
    "export_delta_log call, then run a COW DELETE and an OPTIMIZE "
    "whose log entries are emitted BY THE COMMIT HOOK — and read the "
    "final table back EXCLUSIVELY through the exported log: replay "
    "the protocol's add/remove actions to the live file set and "
    "spark.read the parquet files it names, never consulting the "
    "snapshot manifest. n_log_versions pins the 5-commit chain; the "
    "count and DECIMAL sum must equal the relational recompute, so a "
    "wrong add/remove diff anywhere in the chain (or a hook that "
    "fails to mirror) is a driver hash mismatch, not a silent "
    "interop break.",
)
def q_delta_log_export_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.delta_export import (
        export_delta_log,
        replay_delta_log,
    )
    from azure_etl_spark.sources.snapshot import (
        compact_snapshot,
        delete_from_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="delta_exp_") + "/tbl"
    for lo, hi, mode in (
        (0, 700, "overwrite"),
        (700, 1400, "append"),
        (1400, 2000, "append"),
    ):
        part = orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        write_snapshot(part, path, mode=mode)
        if lo == 0:
            export_delta_log(spark, path)  # arm: later commits self-mirror
    delete_from_snapshot(spark, path, [("o_orderkey", "between", (800, 1200))])
    compact_snapshot(spark, path)
    state = replay_delta_log(spark, path)
    root = path.rstrip("/")
    live = spark.read.parquet(*[f"{root}/{f}" for f in sorted(state["live"])])
    return live.agg(
        F.lit(len(state["versions"])).cast("int").alias("n_log_versions"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
    )


@query(
    "cdf_export_changes",
    oracle="""
    WITH appended AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey >= 700 AND o_orderkey < 1400
    ),
    middle_file AS (  -- the COW delete rewrites only the middle file
      SELECT o_orderkey, o_totalprice FROM appended
    ),
    changes AS (
      SELECT o_orderkey, o_totalprice, 'insert' AS _change_type,
             CAST(1 AS BIGINT) AS _commit_version
      FROM appended
      UNION ALL  -- v2: whole middle file leaves ...
      SELECT o_orderkey, o_totalprice, 'delete', CAST(2 AS BIGINT)
      FROM middle_file
      UNION ALL  -- ... and its surviving rows re-enter (COW churn)
      SELECT o_orderkey, o_totalprice, 'insert', CAST(2 AS BIGINT)
      FROM middle_file WHERE o_orderkey NOT BETWEEN 800 AND 1200
    )
    SELECT _commit_version, _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM changes
    GROUP BY _commit_version, _change_type
    ORDER BY _commit_version, _change_type
    """,
    description="Delta CDF EXPORT (round 10, VERDICT r9 #5): the "
    "snapshot change feed rides the exported _delta_log as cdc "
    "actions + _change_data parquet (written by the COMMIT HOOK for "
    "the COW delete), and the query reads the increments back "
    "EXCLUSIVELY through the log with the protocol's table_changes "
    "semantics — appends derive inserts from their dataChange adds, "
    "the delete commit reads its materialized change files. The "
    "oracle recomputes the file-level feed relationally (the COW "
    "churn — whole middle file out, survivors back in — is pinned, "
    "same contract as snapshot_changes).",
)
def q_cdf_export_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.delta_export import (
        export_delta_log,
        table_changes,
    )
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="cdf_exp_") + "/tbl"
    for lo, hi, mode in ((0, 700, "overwrite"), (700, 1400, "append")):
        part = orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        write_snapshot(part, path, mode=mode)
        if lo == 0:
            export_delta_log(spark, path)  # arm: the delete self-mirrors
    delete_from_snapshot(spark, path, [("o_orderkey", "between", (800, 1200))])
    return (
        table_changes(spark, path, 0)
        .groupBy("_commit_version", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
        )
        .orderBy("_commit_version", "_change_type")
    )


@query(
    "cm_convert_gold",
    oracle="""
    SELECT o_orderkey AS k, o_orderpriority AS prio,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderkey < 1500 AND NOT (o_orderkey BETWEEN 200 AND 399)
    """,
    description="Round 11 (VERDICT r10 #3): column-mapping convert, "
    "oracle-backed end-to-end. A hand-built name-mode Delta table "
    "(physical col-<tag> parquet names + schemaString physicalName/id "
    "metadata, reader 2 / writer 5) converts in place "
    "(convert_from_delta_log: O(metadata) renames, translation "
    "sidecar), a merge-on-read DELETE then runs against the LOGICAL "
    "schema, and the read returns logical columns — the oracle "
    "recomputes the surviving rows relationally, so a wrong physical-"
    "to-logical translation anywhere (data, partition values, delete "
    "predicate) is a hash mismatch.",
)
def q_cm_convert_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import os
    import shutil
    import tempfile

    from azure_etl_spark.sources.delta_export import convert_from_delta_log
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        read_snapshot,
    )

    tmp = tempfile.mkdtemp(prefix="cm_gold_")
    path = os.path.join(tmp, "tbl")
    os.makedirs(os.path.join(path, "_delta_log"))
    # data file under PHYSICAL column names (what a name-mapped Delta
    # writer stores on disk)
    stage = os.path.join(tmp, "stage")
    (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1500)
        .select(
            F.col("o_orderkey").alias("col-k1"),
            F.col("o_orderpriority").alias("col-p2"),
            F.col("o_totalprice").cast("double").alias("col-t3"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(stage)
    )
    fname = "part-00000-cmgold.snappy.parquet"
    shutil.move(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                os.path.join(path, fname))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-k1"}},
            {"name": "prio", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-p2"}},
            {"name": "price", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-t3"}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmgold00-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
            "createdTime": 1700000000000,
        }},
        {"add": {
            "path": fname,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(path, fname)),
            "modificationTime": 1700000000000,
            "dataChange": True,
        }},
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(_json.dumps(a, sort_keys=True) for a in actions))
    convert_from_delta_log(spark, path)
    # DML against the LOGICAL schema on the adopted physical files
    delete_from_snapshot(
        spark, path, [("k", "between", (200, 399))], mode="merge_on_read"
    )
    return read_snapshot(spark, path).select("k", "prio", "price")


@query(
    "snapshot_mor_delete",
    oracle="""
    WITH remaining AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders
      WHERE o_orderkey < 2000 AND o_orderkey NOT BETWEEN 800 AND 1200
        AND o_orderkey NOT IN (3, 7, 1399)
    )
    SELECT CAST(0 AS INT) AS files_rewritten, CAST(2 AS INT) AS files_covered,
           COUNT(*) AS n_remaining,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM remaining
    """,
    description="Merge-on-read DELETE on the snapshot log "
    "(sources/snapshot.py delete_from_snapshot(mode='merge_on_read') + "
    "delete_keys_from_snapshot): a predicate delete commits as a "
    "stats-scoped manifest entry (files_rewritten pinned 0 — no data "
    "IO) and an Iceberg-style equality-delete key file removes three "
    "keys via broadcast anti-join at read; the key range [3,1399] "
    "provably covers only the first two of the three files "
    "(files_covered pinned 2). The oracle recomputes the surviving "
    "rows relationally — the read path's on-the-fly entry application "
    "must land on the exact same count and DECIMAL sum.",
)
def q_snapshot_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        delete_keys_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="snap_mor_") + "/tbl"
    for lo, hi, mode in ((0, 700, "overwrite"), (700, 1400, "append"), (1400, 2000, "append")):
        part = orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).coalesce(1)
        write_snapshot(part, path, mode=mode)
    res = delete_from_snapshot(
        spark, path, [("o_orderkey", "between", (800, 1200))], mode="merge_on_read"
    )
    keys = spark.createDataFrame([(3,), (7,), (1399,)], "o_orderkey long")
    kres = delete_keys_from_snapshot(spark, path, keys, ["o_orderkey"])
    remaining = read_snapshot(spark, path)
    return remaining.agg(
        F.lit(res["files_rewritten"]).cast("int").alias("files_rewritten"),
        F.lit(kres["files_covered"]).cast("int").alias("files_covered"),
        F.count(F.lit(1)).alias("n_remaining"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
    )


@query(
    "snapshot_restore_gold",
    oracle="""
    WITH tbl AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT CAST(1 AS INT) AS restored_to, CAST(3 AS INT) AS version,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM tbl
    """,
    description="RESTORE on the snapshot log (sources/snapshot.py "
    "restore_snapshot): after an overwrite (v0), an append (v1) and a "
    "copy-on-write DELETE (v2), restoring to v1 commits a NEW version "
    "(pinned 3) that reproduces v1's data references with no data "
    "copied — the rollback is O(manifest). The oracle recomputes the "
    "pre-delete state directly; the restored read must match it "
    "exactly, proving the deleted rows came back.",
)
def q_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        read_snapshot,
        restore_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="snap_restore_") + "/tbl"
    write_snapshot(
        orders.filter(F.col("o_orderkey") < 1000).coalesce(1), path
    )
    write_snapshot(
        orders.filter(
            (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
        ).coalesce(1),
        path,
        mode="append",
    )
    delete_from_snapshot(spark, path, [("o_orderkey", ">=", 500)])
    res = restore_snapshot(spark, path, to_version=1)
    restored = read_snapshot(spark, path)
    return restored.agg(
        F.lit(res["restored_to"]).cast("int").alias("restored_to"),
        F.lit(res["version"]).cast("int").alias("version"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
    )


@query(
    "cdc_incremental_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderkey < 3000 AND o_orderkey NOT BETWEEN 500 AND 1000
    GROUP BY o_orderpriority
    """,
    description="Change-feed-driven incremental aggregate maintenance "
    "(operators/aggregate.maintain_agg_from_changes over "
    "sources/snapshot.snapshot_changes): gold per-priority SUM/COUNT is "
    "bootstrapped from version 0, then maintained through an append "
    "commit and a copy-on-write delete by folding each commit's "
    "insert/delete rows into a signed partial aggregate — refresh cost "
    "O(changed rows), never a table rescan. The oracle recomputes the "
    "final state directly, so the incremental path must land on the "
    "exact same values (sums maintained on DECIMAL, cast once at the "
    "boundary).",
)
def q_cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.operators.aggregate import maintain_agg_from_changes
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        snapshot_changes,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    path = tempfile.mkdtemp(prefix="snap_cdc_") + "/tbl"
    v0 = orders.filter(F.col("o_orderkey") < 1500)
    write_snapshot(v0.coalesce(1), path)
    # bootstrap state = v0 fed through the same fold as inserts
    state = maintain_agg_from_changes(
        None,
        v0.withColumn("_change_type", F.lit("insert")),
        keys=["o_orderpriority"],
        sum_cols=["o_totalprice"],
    )
    write_snapshot(
        orders.filter(F.col("o_orderkey").between(1500, 2999)).coalesce(1),
        path,
        mode="append",
    )
    delete_from_snapshot(spark, path, [("o_orderkey", "between", (500, 1000))])
    changes = snapshot_changes(spark, path, from_version=0).select(
        "o_orderpriority", "o_totalprice", "_change_type"
    )
    state = maintain_agg_from_changes(
        state, changes, keys=["o_orderpriority"], sum_cols=["o_totalprice"]
    )
    return state.select(
        "o_orderpriority", F.col("o_totalprice").alias("sum_price"), "n"
    )


# ---------------------------------------------------------------- streaming

@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    description="§2.10 Structured Streaming tumbling window (availableNow "
    "drain through the real streaming engine + memory sink); result equals "
    "the batch twin, so it carries a full value-hash oracle.",
)
def q_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from azure_etl_spark.streaming.windows import run_available_now, tumbling_window_agg

    batch = _t(spark, sf_dir, "events")
    stage = tempfile.mkdtemp(prefix="stream_src_")
    batch.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(spark.read.parquet(stage).schema).parquet(stage)
    windowed = tumbling_window_agg(
        stream,
        "ts",
        "1 hour",
        ["event_type"],
        {
            "n": F.count("*"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        watermark_delay="1 minute",
    )
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    run_available_now(windowed, name, tempfile.mkdtemp(prefix="ckpt_"))
    return spark.table(name)


@query(
    "delta_stream_foreign_gold",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderkey < 3000
      AND NOT (o_orderkey BETWEEN 500 AND 999)
    """,
    description="Round 11 (VERDICT r10 #5): tail a FOREIGN Delta table "
    "with spark.readStream and no delta jars. Builds a snapshot table "
    "(2 appends + a merge-on-read delete), exports a real _delta_log "
    "(the MOR delete becomes a deletion vector), adopts data+log as a "
    "foreign tree (no _manifest), and streams it through the "
    "delta_log_table Python Data Source — the initial load replays the "
    "protocol's live set and masks each file's DV executor-side. The "
    "oracle recomputes the surviving rows relationally, so a wrong "
    "bitmap bit or a missed add action is a hash mismatch.",
)
def q_delta_stream_foreign(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from azure_etl_spark.sources.delta_export import export_delta_log
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )
    from azure_etl_spark.streaming import delta_source

    delta_source.register(spark)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tmp = tempfile.mkdtemp(prefix="delta_stream_")
    src = os.path.join(tmp, "src")
    write_snapshot(orders.filter(F.col("o_orderkey") < 2000).coalesce(1), src)
    write_snapshot(
        orders.filter(F.col("o_orderkey").between(2000, 2999)).coalesce(1),
        src,
        mode="append",
    )
    delete_from_snapshot(
        spark, src, [("o_orderkey", "between", (500, 999))],
        mode="merge_on_read",
    )
    export_delta_log(spark, src)
    foreign = os.path.join(tmp, "foreign")
    os.makedirs(foreign)
    for entry in os.listdir(src):
        if entry == "_manifest":
            continue
        s = os.path.join(src, entry)
        d = os.path.join(foreign, entry)
        shutil.copytree(s, d) if os.path.isdir(s) else shutil.copy2(s, d)
    name = f"dtail_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("delta_log_table")
        .option("path", foreign)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # block until the drain COMPLETES — a timeout here would return
    # False silently and hash a partially-filled memory sink on a slow
    # box (same contract as streaming/windows.run_available_now)
    q.awaitTermination()
    return spark.table(name)


@query(
    "delta_stream_cdf_gold",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price,
           'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'insert', CAST(1 AS BIGINT)
    FROM orders WHERE o_orderkey BETWEEN 2000 AND 2999
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'delete', CAST(2 AS BIGINT)
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'insert', CAST(2 AS BIGINT)
    FROM orders WHERE o_orderkey < 2000
      AND NOT (o_orderkey BETWEEN 500 AND 999)
    """,
    description="Round 12 (VERDICT r11 #4): STREAM a foreign Delta "
    "table's change feed — readchangefeed=true on the delta_log_table "
    "source tails _change_type/_commit_version rows from the exported "
    "cdc actions (_change_data parquet for the COW DELETE, derived "
    "inserts for the appends), exactly Delta's table_changes feed. The "
    "v0 append is a single file, so the v2 COW delete rewrites exactly "
    "that file: the oracle recomputes the full change feed "
    "relationally — inserts at v0/v1, the rewritten file's full churn "
    "at v2 (all old rows delete + survivors re-insert, the protocol's "
    "COW semantics). A missed cdc action, a wrong change type, or a "
    "double-delivered commit is a hash mismatch.",
)
def q_delta_stream_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from azure_etl_spark.sources.delta_export import export_delta_log
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )
    from azure_etl_spark.streaming import delta_source

    delta_source.register(spark)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tmp = tempfile.mkdtemp(prefix="delta_cdf_stream_")
    src = os.path.join(tmp, "src")
    write_snapshot(orders.filter(F.col("o_orderkey") < 2000).coalesce(1), src)
    write_snapshot(
        orders.filter(F.col("o_orderkey").between(2000, 2999)).coalesce(1),
        src,
        mode="append",
    )
    # COW delete: the exporter materializes the change rows as cdc
    delete_from_snapshot(spark, src, [("o_orderkey", "between", (500, 999))])
    export_delta_log(spark, src)
    foreign = os.path.join(tmp, "foreign")
    os.makedirs(foreign)
    for entry in os.listdir(src):
        if entry == "_manifest":
            continue
        s = os.path.join(src, entry)
        d = os.path.join(foreign, entry)
        shutil.copytree(s, d) if os.path.isdir(s) else shutil.copy2(s, d)
    name = f"dcdf_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("delta_log_table")
        .option("path", foreign)
        .option("readchangefeed", "true")
        .option("startingversion", "0")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # _commit_timestamp is wall-clock (commitInfo stamps) — excluded
    # from the deterministic parity surface
    return spark.table(name).select(
        "o_orderkey", "o_orderpriority", "price",
        "_change_type", "_commit_version",
    )


@query(
    "delta_log_read_gold",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
           'v1' AS snap
    FROM orders WHERE o_orderkey < 3000
    UNION ALL
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), 'tip'
    FROM orders WHERE o_orderkey < 3000
      AND NOT (o_orderkey BETWEEN 500 AND 999)
    """,
    description="Round 12: READ-ONLY batch reader over a foreign Delta "
    "log (read_delta_log_table) — versionAsOf time travel and "
    "deletion-vector masking without delta jars and WITHOUT adopting "
    "the tree (convert renames files; a user who only queries someone "
    "else's table should not mutate it). The table is built, exported, "
    "and adopted as a foreign tree; the query unions the version=1 "
    "read (pre-delete) with the tip read (DV-masked) under a snap tag. "
    "A wrong replay bound, a mis-decoded bitmap bit, or a mutated tree "
    "is a hash mismatch; the oracle recomputes both snapshots "
    "relationally.",
)
def q_delta_log_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from azure_etl_spark.sources.delta_export import (
        export_delta_log,
        read_delta_log_table,
    )
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    tmp = tempfile.mkdtemp(prefix="delta_ro_read_")
    src = os.path.join(tmp, "src")
    write_snapshot(orders.filter(F.col("o_orderkey") < 2000).coalesce(1), src)
    write_snapshot(
        orders.filter(F.col("o_orderkey").between(2000, 2999)).coalesce(1),
        src,
        mode="append",
    )
    delete_from_snapshot(
        spark, src, [("o_orderkey", "between", (500, 999))],
        mode="merge_on_read",
    )
    export_delta_log(spark, src)
    foreign = os.path.join(tmp, "foreign")
    os.makedirs(foreign)
    for entry in os.listdir(src):
        if entry == "_manifest":
            continue
        s = os.path.join(src, entry)
        d = os.path.join(foreign, entry)
        shutil.copytree(s, d) if os.path.isdir(s) else shutil.copy2(s, d)
    v1 = read_delta_log_table(spark, foreign, version=1).withColumn(
        "snap", F.lit("v1")
    )
    tip = read_delta_log_table(spark, foreign).withColumn("snap", F.lit("tip"))
    return v1.unionByName(tip)


@query(
    "delta_log_read_dv_exec_gold",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price, mask_path
    FROM orders
    CROSS JOIN (VALUES ('executor'), ('broadcast')) AS m(mask_path)
    WHERE o_orderkey < 3000 AND NOT (o_orderkey BETWEEN 500 AND 999)
    """,
    description="Round 13 (VERDICT r12 #2): the batch Delta reader's "
    "TWO deletion-vector mask shapes are bit-equal — the same "
    "DV-carrying foreign table reads once with "
    "dv_broadcast_max_positions=0 (forcing the EXECUTOR-SIDE "
    "mapInPandas per-file decode, the heavy-delete scale path) and "
    "once under the default budget (driver decode + broadcast LEFT "
    "ANTI), tagged by mask_path. A single row mis-masked by either "
    "shape is a hash mismatch; the oracle recomputes the surviving "
    "set relationally, twice.",
)
def q_delta_log_read_dv_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from azure_etl_spark.sources.delta_export import (
        export_delta_log,
        read_delta_log_table,
    )
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    tmp = tempfile.mkdtemp(prefix="delta_dv_exec_")
    src = os.path.join(tmp, "src")
    write_snapshot(orders.filter(F.col("o_orderkey") < 2000).coalesce(1), src)
    write_snapshot(
        orders.filter(F.col("o_orderkey").between(2000, 2999)).coalesce(1),
        src,
        mode="append",
    )
    delete_from_snapshot(
        spark, src, [("o_orderkey", "between", (500, 999))],
        mode="merge_on_read",
    )
    export_delta_log(spark, src)
    foreign = os.path.join(tmp, "foreign")
    os.makedirs(foreign)
    for entry in os.listdir(src):
        if entry == "_manifest":
            continue
        s = os.path.join(src, entry)
        d = os.path.join(foreign, entry)
        shutil.copytree(s, d) if os.path.isdir(s) else shutil.copy2(s, d)
    ex = read_delta_log_table(
        spark, foreign, dv_broadcast_max_positions=0
    ).withColumn("mask_path", F.lit("executor"))
    bc = read_delta_log_table(spark, foreign).withColumn(
        "mask_path", F.lit("broadcast")
    )
    return ex.unionByName(bc)


@query(
    "delta_log_read_pruned_gold",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderkey BETWEEN 2100 AND 2899
      AND NOT (o_orderkey BETWEEN 2300 AND 2399)
    """,
    description="Round 13: predicate file-skipping on the READ-ONLY "
    "foreign-Delta reader (read_delta_log_table(where=...)). The "
    "table exports as three disjoint key-range files plus a "
    "merge-on-read delete (deletion vectors); the where= range "
    "provably excludes the first and last file from the adds' stats "
    "min/max before the scan, and the same predicate re-applies as "
    "an exact row filter after the DV mask. A file wrongly skipped "
    "(missing rows) or wrongly kept without the residual filter "
    "(extra rows) is a hash mismatch; the oracle recomputes the "
    "window relationally. The inputFiles()-level skipping assert "
    "lives in tests/test_delta_export.py.",
)
def q_delta_log_read_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from azure_etl_spark.sources.delta_export import (
        export_delta_log,
        read_delta_log_table,
    )
    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    tmp = tempfile.mkdtemp(prefix="delta_ro_pruned_")
    src = os.path.join(tmp, "src")
    for lo in (0, 2000, 4000):
        write_snapshot(
            orders.filter(F.col("o_orderkey").between(lo, lo + 1999)).coalesce(1),
            src,
            mode="append" if lo else "overwrite",
        )
    delete_from_snapshot(
        spark, src, [("o_orderkey", "between", (2300, 2399))],
        mode="merge_on_read",
    )
    export_delta_log(spark, src)
    return read_delta_log_table(
        spark, src, where=[("o_orderkey", "between", (2100, 2899))]
    )


@query(
    "delta_cdf_cm_gold",
    oracle="""
    SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
           'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), 'delete',
           CAST(1 AS BIGINT)
    FROM orders WHERE o_orderkey BETWEEN 100 AND 199
    """,
    description="Round 13 (VERDICT r12 #3): batch CDF over a "
    "COLUMN-MAPPED foreign Delta log (table_changes under name mode). "
    "The hand-built log stores data columns under physical names "
    "(col-ok / col-pr) with a cdc commit whose _change_data parquet "
    "carries _change_type in-data next to the physical columns — the "
    "mapping walk must translate the data columns and leave "
    "_change_type alone. The oracle recomputes the feed relationally "
    "from orders; a physical name leaking into the output, a dropped "
    "delete, or a mis-translated value is a hash mismatch. The "
    "streaming readchangefeed leg is pinned bit-identical to this "
    "reader in tests/test_delta_stream_source.py.",
)
def q_delta_cdf_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json
    import os
    import shutil
    import tempfile

    from azure_etl_spark.sources.delta_export import table_changes

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("col-ok"),
        F.col("o_totalprice").cast("double").alias("col-pr"),
    )
    tmp = tempfile.mkdtemp(prefix="delta_cdf_cm_")
    path = os.path.join(tmp, "tbl")
    os.makedirs(os.path.join(path, "_delta_log"))

    def _one_parquet(df, rel):
        stage = os.path.join(tmp, "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        return os.path.getsize(dst)

    f0 = "part-00000-cmcdf.snappy.parquet"
    sz0 = _one_parquet(orders.filter(F.col("`col-ok`") < 1000), f0)
    cdc_rel = "_change_data/cdc-00000-cmcdf.snappy.parquet"
    szc = _one_parquet(
        orders.filter(F.col("`col-ok`").between(100, 199)).withColumn(
            "_change_type", F.lit("delete")
        ),
        cdc_rel,
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-ok"}},
            {"name": "price", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-pr"}},
        ],
    }
    v0 = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "11111111-2222-3333-4444-cdfcdfcdfcdf",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": f0, "partitionValues": {}, "size": sz0,
                 "modificationTime": 1700000000000, "dataChange": True}},
        {"commitInfo": {"timestamp": 1700000000000}},
    ]
    v1 = [
        {"cdc": {"path": cdc_rel, "partitionValues": {}, "size": szc,
                 "dataChange": False}},
        {"commitInfo": {"timestamp": 1700000001000}},
    ]
    for v, acts in ((0, v0), (1, v1)):
        with open(os.path.join(path, "_delta_log", f"{v:020d}.json"), "w") as f:
            f.write("\n".join(json.dumps(a, sort_keys=True) for a in acts) + "\n")
    return table_changes(spark, path, -1).select(
        "k", "price", "_change_type", "_commit_version"
    )


@query(
    "snapshot_stream_cdf_gold",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price,
           'insert' AS _change_type, CAST(0 AS INT) AS _commit_version
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'insert', CAST(1 AS INT)
    FROM orders WHERE o_orderkey BETWEEN 2000 AND 2999
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'delete', CAST(2 AS INT)
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'insert', CAST(2 AS INT)
    FROM orders WHERE o_orderkey < 2000
      AND NOT (o_orderkey BETWEEN 500 AND 999)
    UNION ALL
    SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE),
           'delete', CAST(3 AS INT)
    FROM orders WHERE o_orderkey BETWEEN 2100 AND 2199
    """,
    description="Round 12: STREAM the snapshot table's change feed — "
    "readchangefeed=true on the snapshot_table source is the streaming "
    "twin of snapshot_changes: startingversion=0 walks every commit "
    "emitting file-granularity inserts/deletes, INCLUDING the "
    "merge-on-read predicate delete at v3, whose rows come from the "
    "ENTRY DIFF (no file changed — the pyarrow match path). The v0 "
    "append is a single file, so the v2 COW delete's churn is exactly "
    "that file's rows; the oracle recomputes the full feed "
    "relationally. A wrong entry diff, a missed churn row, or a "
    "double-delivered commit is a hash mismatch.",
)
def q_snapshot_stream_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from azure_etl_spark.sources.snapshot import (
        delete_from_snapshot,
        write_snapshot,
    )
    from azure_etl_spark.streaming import snapshot_source

    snapshot_source.register(spark)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    tmp = tempfile.mkdtemp(prefix="snap_cdf_stream_")
    src = os.path.join(tmp, "src")
    write_snapshot(orders.filter(F.col("o_orderkey") < 2000).coalesce(1), src)
    write_snapshot(
        orders.filter(F.col("o_orderkey").between(2000, 2999)).coalesce(1),
        src,
        mode="append",
    )
    delete_from_snapshot(spark, src, [("o_orderkey", "between", (500, 999))])
    delete_from_snapshot(
        spark, src, [("o_orderkey", "between", (2100, 2199))],
        mode="merge_on_read",
    )
    name = f"scdf_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", src)
        .option("readchangefeed", "true")
        .option("startingversion", "0")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "o_orderkey", "o_orderpriority", "price",
        "_change_type", "_commit_version",
    )


# ---------------------------------------------------------------- window frames

@query(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) AS running_total,
           FIRST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    """,
    description="§2.6 explicit frame: running decimal sum + first_value "
    "per customer (one shuffle+sort serves both windows).",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(18,2)")
        .alias("running_total"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


# ---------------------------------------------------------------- SQL surface

@query(
    "sql_correlated_above_nation_avg",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
    description="spark.sql entry point + correlated scalar subquery "
    "(Catalyst decorrelates to an aggregate+join).",
)
def q_sql_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer_v c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "sql_exists_heavy_lineitem",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-06-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="Correlated EXISTS through the SQL entry point (TPC-H Q4 "
    "shape, round 10 — tpch_q4ish builds the semi-join by hand; this one "
    "hands Catalyst the raw subquery and the plan assert proves it "
    "decorrelates to a LeftSemi join, never a per-row re-execution).",
)
def q_sql_exists_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_sq")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_sq")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM v_orders_sq
        WHERE o_orderdate >= TIMESTAMP '1996-06-01'
          AND EXISTS (SELECT 1 FROM v_lineitem_sq
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)


@query(
    "sql_multi_exists_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="EXISTS + NOT EXISTS on the same fact through the SQL "
    "entry point (TPC-H Q21 shape, round 10): Catalyst must decorrelate "
    "the pair into one LeftSemi and one LeftAnti join (plan-asserted) — "
    "customers with a finished order and no open one.",
)
def q_sql_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_sq")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_sq")
    return spark.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM v_customer_sq
        WHERE EXISTS (SELECT 1 FROM v_orders_sq
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM v_orders_sq
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "sql_scalar_subquery_small_lot",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_lots,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4))
             AS small_rev
    FROM lineitem l JOIN part ON p_partkey = l.l_partkey
    WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p_brand ORDER BY p_brand
    """,
    description="Correlated scalar subquery PER GROUP through the SQL "
    "entry point (TPC-H Q17 shape, round 10): the per-part average must "
    "decorrelate into ONE grouped aggregate joined back on l_partkey "
    "(plan-asserted) — the naive reading re-scans lineitem per row. "
    "Quantities are integer-valued, so the 0.5*avg threshold is exact "
    "in both engines.",
    bench=True,
)
def q_sql_scalar_small_lot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_sq")
    _t(spark, sf_dir, "part").createOrReplaceTempView("v_part_sq")
    return spark.sql("""
        SELECT p_brand,
               COUNT(*) AS n_lots,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4))
                 AS small_rev
        FROM v_lineitem_sq l JOIN v_part_sq ON p_partkey = l.l_partkey
        WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM v_lineitem_sq l2
                              WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand ORDER BY p_brand
    """)


# ---------------------------------------------------------------- scalar misc

@query(
    "scalar_misc_docs",
    oracle="""
    SELECT doc_id,
           concat_ws('-', source, lang) AS src_lang,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           reverse(source) AS rev_source,
           coalesce(nullif(lang, 'en'), 'EN') AS lang_or_EN,
           CASE WHEN n_chars > 250 THEN 'long' ELSE 'short' END AS len_class
    FROM documents
    """,
    description="F4/F5-family scalar functions: concat_ws/lpad/reverse/"
    "nullif/coalesce/case — all codegen built-ins.",
)
def q_scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat_ws("-", "source", "lang").alias("src_lang"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse("source").alias("rev_source"),
        F.coalesce(F.nullif("lang", F.lit("en")), F.lit("EN")).alias("lang_or_EN"),
        F.when(F.col("n_chars") > 250, "long").otherwise("short").alias("len_class"),
    )


@query(
    "interval_week_events",
    oracle="""
    SELECT event_id, CAST(hour(ts) AS INT) AS hr, CAST(minute(ts) AS INT) AS mi
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-08' + INTERVAL 7 DAY
    """,
    description="F6 datetime arithmetic: interval window filter + time parts.",
)
def q_interval_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    start = F.lit("2024-01-08").cast("timestamp")
    return (
        e.filter((F.col("ts") >= start) & (F.col("ts") < start + F.expr("INTERVAL 7 DAYS")))
        .select(
            "event_id",
            F.hour("ts").alias("hr"),
            F.minute("ts").alias("mi"),
        )
    )


@query(
    "conditional_agg_orders",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1%'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DECIMAL(18,2)) AS urgent_total,
           COUNT(CASE WHEN o_orderpriority LIKE '1%' THEN 1 END) AS n_urgent,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    description="Conditional aggregation (filtered sums/counts in one pass).",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").like("1%")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(urgent, F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("decimal(18,2)")
        .alias("urgent_total"),
        F.count(F.when(urgent, F.lit(1))).alias("n_urgent"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------- kNN join

@query(
    "knn_join_top3",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
    s AS (
      SELECT q.q_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS sim
      FROM embeddings e, q),
    r AS (
      SELECT q_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      FROM s)
    SELECT q_id, vec_id, ROUND(sim, 6) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """,
    description="Exact kNN join: top-3 candidates per query row; query set "
    "broadcast, candidates scanned once, ranked per query id.",
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import knn_join_topk

    e = _t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = knn_join_topk(qs, e, k=3)
    return out.select(
        "q_id", "vec_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


def _embedding_near_dup_oracle(n_planes: int = 8, n_tables: int = 4) -> str:
    """Oracle = the SAME approximate pipeline in SQL (the lsh_topk
    technique): the hyperplane family is deterministic, so DuckDB
    recomputes the identical per-table bucket signatures over the
    identical planted corpus, joins same-bucket pairs, dedups across
    tables, and applies the exact cosine filter. This checks signatures,
    the multi-table candidate union, dedup, and the verify stage
    end-to-end — an exact contract for an approximate op. Recall vs
    exact brute force is separately asserted in
    tests/test_dedup_similarity.py on the planted twins."""
    # pair IDS are derived first (vector lists pruned from the bucket
    # self-join entirely) and the 64-double vectors are fetched by two
    # id joins against the MATERIALIZED corpus afterwards: dragging the
    # lists through the bucket join made DuckDB's runtime super-linear
    # in candidate count (the sf0.1 parity run went from >400 s to 2 s)
    sig_parts = []
    for t in range(n_tables):
        sig = _lsh_sig_sql(t, n_planes, 64, "v")
        sig_parts.append(f"SELECT {t} AS t, vec_id, {sig} AS sig FROM corpus")
    return f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pert AS (SELECT vec_id + 1000000 AS vec_id,
                    list_concat([v[1] + 0.25], v[2:]) AS v
             FROM base),
    corpus AS MATERIALIZED (SELECT * FROM base UNION ALL SELECT * FROM pert),
    sigs AS MATERIALIZED ({' UNION ALL '.join(sig_parts)}),
    pair_ids AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig
                             AND a.vec_id < b.vec_id),
    scored AS (
      SELECT id_a, id_b, list_cosine_similarity(ca.v, cb.v) AS cs
      FROM pair_ids JOIN corpus ca ON ca.vec_id = id_a
                    JOIN corpus cb ON cb.vec_id = id_b)
    SELECT id_a, id_b, ROUND(cs, 6) AS cosine_sim
    FROM scored WHERE cs >= 0.9
    """


def _contrastive_triplets_oracle(
    n_planes: int = 8, n_tables: int = 4, pos_thr: float = 0.9, neg_thr: float = 0.5
) -> str:
    """Replays contrastive_triplets end-to-end: the near-dup positive
    mining (same CTEs as _embedding_near_dup_oracle), the table-0
    bucket-scoped negative candidates, and the deterministic
    md5(anchor:candidate) draw."""
    # ids-first restructure (see _embedding_near_dup_oracle): vector
    # lists never ride the bucket joins; cosines are computed after
    # two id joins against the materialized corpus
    sig_parts = []
    for t in range(n_tables):
        sig = _lsh_sig_sql(t, n_planes, 64, "v")
        sig_parts.append(f"SELECT {t} AS t, vec_id, {sig} AS sig FROM corpus")
    sig0 = _lsh_sig_sql(0, n_planes, 64, "v")
    return f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pert AS (SELECT vec_id + 1000000 AS vec_id,
                    list_concat([v[1] + 0.25], v[2:]) AS v
             FROM base),
    corpus AS MATERIALIZED (SELECT * FROM base UNION ALL SELECT * FROM pert),
    sigs AS MATERIALIZED ({' UNION ALL '.join(sig_parts)}),
    pair_ids AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig
                             AND a.vec_id < b.vec_id),
    pos AS (
      SELECT id_a, id_b, list_cosine_similarity(ca.v, cb.v) AS cs
      FROM pair_ids JOIN corpus ca ON ca.vec_id = id_a
                    JOIN corpus cb ON cb.vec_id = id_b),
    s0 AS MATERIALIZED (SELECT vec_id, {sig0} AS sig FROM corpus),
    cand_ids AS (
      SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id
      FROM s0 a JOIN s0 c ON a.sig = c.sig AND a.vec_id <> c.vec_id),
    cand AS (
      SELECT anchor_id, negative_id,
             list_cosine_similarity(ca.v, cc.v) AS nsim,
             md5(CAST(anchor_id AS VARCHAR) || ':' ||
                 CAST(negative_id AS VARCHAR)) AS draw
      FROM cand_ids JOIN corpus ca ON ca.vec_id = anchor_id
                    JOIN corpus cc ON cc.vec_id = negative_id
      WHERE list_cosine_similarity(ca.v, cc.v) < {neg_thr}),
    neg AS (
      SELECT anchor_id, negative_id, nsim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                    ORDER BY draw, negative_id) AS rn
        FROM cand) x WHERE rn = 1)
    SELECT p.id_a AS anchor_id, p.id_b AS positive_id, n.negative_id,
           ROUND(p.cs, 6) AS pos_sim, ROUND(n.nsim, 6) AS neg_sim
    FROM pos p JOIN neg n ON p.id_a = n.anchor_id
    WHERE p.cs >= {pos_thr}
    ORDER BY anchor_id, positive_id
    """


@query(
    "contrastive_triplets_emb",
    oracle=_contrastive_triplets_oracle,
    description="Contrastive training triplets: positives = LSH-mined "
    "near-dup pairs over the planted-twin corpus; the negative per "
    "anchor comes from the anchor's OWN table-0 bucket (shares coarse "
    "hyperplane structure but cosine < 0.5 — harder than uniform "
    "random), drawn deterministically by min md5(anchor:candidate) so "
    "the sample is reproducible across runs, partitionings, and "
    "engines. Bucket-scoped work only — never corpus all-pairs.",
)
def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import contrastive_triplets

    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.25)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    out = contrastive_triplets(
        corpus, dim=64, pos_threshold=0.9, neg_threshold=0.5,
        n_planes=8, n_tables=4,
    )
    return out.select(
        "anchor_id",
        "positive_id",
        "negative_id",
        F.round("pos_sim", 6).alias("pos_sim"),
        F.round("neg_sim", 6).alias("neg_sim"),
    ).orderBy("anchor_id", "positive_id")


@query(
    "embedding_near_dup",
    # The fixture's embeddings are near-orthogonal (max pairwise cosine
    # ~0.51 — brute-forced), so mining the raw table at any near-dup
    # threshold is vacuously empty. Both engines therefore build the
    # same corpus-with-duplicates deterministically: every vector gets a
    # slightly perturbed twin (id + 1000000, first component +0.25 in
    # double precision). The oracle recomputes the SAME deterministic
    # LSH buckets in SQL (see _embedding_near_dup_oracle), so the whole
    # approximate pipeline is value-checked; planted-pair recall vs
    # exact brute force is asserted in tests/test_dedup_similarity.py.
    oracle=_embedding_near_dup_oracle,
    description="Embedding near-duplicate pairs (cosine >= 0.9) via "
    "random-hyperplane LSH self-join — the embedding twin of MinHash "
    "dedup; oracle replays the identical deterministic bucket pipeline "
    "in SQL, with planted-pair recall asserted separately in tests.",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.25)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    out = embedding_near_dup_pairs(
        corpus, dim=64, threshold=0.9, n_planes=8, n_tables=4
    )
    return out.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    )


def _embedding_near_dup_multiprobe_oracle(n_planes: int = 8, n_tables: int = 4) -> str:
    """Multi-probe variant of _embedding_near_dup_oracle: one side of
    the SQL self-join expands each signature to itself plus its
    ``n_planes`` Hamming-1 neighbors (the same deterministic probe set
    operators/similarity._probe_signatures builds), so the oracle
    value-checks the probe expansion end-to-end too."""
    # same ids-first restructure as _embedding_near_dup_oracle: lists
    # never ride the probe expansion or the bucket join (sf0.1 parity:
    # >400 s / OOM under the old shape, 2 s now)
    sig_parts = []
    for t in range(n_tables):
        sig = _lsh_sig_sql(t, n_planes, 64, "v")
        sig_parts.append(f"SELECT {t} AS t, vec_id, {sig} AS sig FROM corpus")
    return f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pert AS (SELECT vec_id + 1000000 AS vec_id,
                    list_concat([v[1] + 0.25], v[2:]) AS v
             FROM base),
    corpus AS MATERIALIZED (SELECT * FROM base UNION ALL SELECT * FROM pert),
    sigs AS MATERIALIZED ({' UNION ALL '.join(sig_parts)}),
    probes AS (
      SELECT t, vec_id,
             unnest(list_prepend(sig, list_transform(
               generate_series(1, {n_planes}),
               i -> substr(sig, 1, CAST(i - 1 AS INT)) ||
                    (CASE WHEN substr(sig, CAST(i AS INT), 1) = '1'
                          THEN '0' ELSE '1' END) ||
                    substr(sig, CAST(i + 1 AS INT))))) AS sig
      FROM sigs),
    pair_ids AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM probes a JOIN sigs b ON a.t = b.t AND a.sig = b.sig
                               AND a.vec_id < b.vec_id),
    scored AS (
      SELECT id_a, id_b, list_cosine_similarity(ca.v, cb.v) AS cs
      FROM pair_ids JOIN corpus ca ON ca.vec_id = id_a
                    JOIN corpus cb ON cb.vec_id = id_b)
    SELECT id_a, id_b, ROUND(cs, 6) AS cosine_sim
    FROM scored WHERE cs >= 0.9
    """


@query(
    "embedding_near_dup_multiprobe",
    # Same planted corpus + deterministic-bucket oracle technique as
    # embedding_near_dup, with Hamming-1 multi-probe on: the oracle
    # replays the probe expansion in SQL, so the lifted-recall pipeline
    # is value-checked exactly. Planted recall at these params is 100%
    # (vs 94.4% single-probe) — asserted in tests/test_dedup_similarity.
    oracle=_embedding_near_dup_multiprobe_oracle,
    description="Embedding near-dup pairs with multi-probe LSH "
    "(Hamming-1 neighbor buckets probed from one self-join side): recall "
    "of ~2x the plane agreement at a fixed table count — the query side "
    "fans out n_planes+1 signature rows, the candidate index is "
    "untouched (operators/similarity.py:_probe_signatures).",
)
def q_embedding_near_dup_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.25)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    out = embedding_near_dup_pairs(
        corpus, dim=64, threshold=0.9, n_planes=8, n_tables=4, multiprobe=True
    )
    return out.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    )


# ------------------------------------------------------- fingerprint / simhash

@query(
    "doc_fingerprint_winnow",
    oracle="""
    WITH d AS (SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
           FROM documents),
    s AS (SELECT doc_id,
            list_transform(generate_series(0, greatest(len(w)-3, 0)),
                           i -> md5(array_to_string(w[i+1:i+3], ' '))) AS hs
          FROM d),
    fp AS (SELECT doc_id,
            list_distinct(list_transform(generate_series(0, greatest(len(hs)-4, 0)),
                          j -> list_min(hs[j+1:j+4]))) AS fps
           FROM s)
    SELECT doc_id, CAST(len(fps) AS INT) AS n_fingerprints, list_min(fps) AS min_fp
    FROM fp ORDER BY doc_id
    """,
    description="Document fingerprinting by winnowing: md5 over 3-word "
    "shingles, min-hash per sliding window of 4, distinct. Shared "
    "passages guarantee shared fingerprints; the inverted-index join on "
    "fingerprints finds partial-overlap near-dups whole-doc hashing "
    "misses. All higher-order array funcs under codegen, zero shuffle.",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import winnow_fingerprints

    d = _td(spark, sf_dir)
    fp = winnow_fingerprints(d, shingle_n=3, window=4)
    return fp.select(
        "doc_id",
        F.size("fps").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
    ).orderBy("doc_id")


def _simhash_md5_oracle(max_hamming: int = 3) -> str:
    """Exact brute-force oracle for the md5-derived SimHash: DuckDB
    recomputes the identical 64 signature bits (first 16 hex digits of
    md5(word), 4 bits each, sign-of-sum per bit) as 4 16-bit chunks,
    then compares ALL pairs. The Spark op's chunk bucketing is
    pigeonhole-complete for hamming <= 3, so bucketed == brute force
    exactly — this is a full-strength oracle for the approximate op."""
    s_sums = ", ".join(
        f"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, {i // 4 + 1}, 1)) - 1)"
        f" >> {3 - i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(64)
    )
    chunk_exprs = ", ".join(
        "("
        + " + ".join(
            f"CASE WHEN s{16 * c + b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16)
        )
        + f") AS ch{c}"
        for c in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.ch{c}, b.ch{c}))" for c in range(4))
    return f"""
    WITH w AS (
      SELECT doc_id,
             unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS wd
      FROM documents),
    h AS (SELECT doc_id, md5(wd) AS m FROM w),
    bits AS (SELECT doc_id, {s_sums} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, {chunk_exprs} FROM bits),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST({ham} AS INTEGER) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}
    """


@query(
    "simhash_near_dup",
    # md5-derived signature so DuckDB recomputes the exact bits; the
    # oracle is brute force over all pairs, which the chunk-bucketed op
    # must equal exactly (pigeonhole recall guarantee at hamming<=3).
    oracle=_simhash_md5_oracle,
    description="SimHash near-dup pairs: 64-bit md5-derived signature, "
    "4x16-bit chunk-bucketed candidate equi-join (pigeonhole-complete "
    "for hamming<=3), bit_count(xor) verify. Shuffle is 4 rows/doc; "
    "oracle is exact brute force over the same deterministic signature.",
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import simhash_md5_near_dup_pairs

    d = _td(spark, sf_dir)
    return simhash_md5_near_dup_pairs(d, max_hamming=3)


# ---------------------------------------------------------- more TPC-H shapes

@query(
    "tpch_q6ish",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: pure filter+aggregate — every predicate "
    "must reach the parquet scan (PushedFilters) and the agg is a single "
    "partial->final with no grouping key.",
    bench=True,
)
def q_tpch_q6ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("revenue")
        )
    )


@query(
    "tpch_q4ish",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 shape: EXISTS decorrelates to a left-semi join "
    "(orders never duplicated by matching lineitems), then a tiny "
    "grouped count.",
)
def q_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    sat = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return (
        sat.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q10ish",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue per customer; "
    "nation broadcast, grouped revenue, ordered top-20 "
    "(TakeOrderedAndProject — no global sort).",
)
def q_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("decimal(18,4)")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q18ish",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS qty FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    description="TPC-H Q18 shape: HAVING-filtered aggregate subquery "
    "drives the join — aggregate first (shrinks the fact), join the "
    "survivors, ordered top-k.",
)
def q_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# ------------------------------------------------- grouping sets / percentiles

@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="Explicit GROUPING SETS (finer than rollup/cube): status x "
    "priority, status subtotal, grand total in ONE pass (Expand + single "
    "aggregate, not three scans).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """)


@query(
    "percentile_prices",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="Exact interpolated percentiles per group (Spark "
    "percentile == DuckDB quantile_cont, linear interpolation). The "
    "scale path swaps in percentile_approx (t-digest-style mergeable "
    "sketch) — asserted near-exact in tests.",
)
def q_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


# ------------------------------------------------------------------ range join

@query(
    "range_join_value_tiers",
    oracle="""
    WITH tiers(tier, lo, hi) AS (VALUES
        ('low', 0.0, 10.0), ('mid', 10.0, 100.0), ('high', 100.0, 1e9))
    SELECT tier, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total_value
    FROM events JOIN tiers ON value >= lo AND value < hi
    WHERE event_type = 'purchase'
    GROUP BY tier ORDER BY tier
    """,
    description="Range (theta) join: events banded into value tiers via "
    "lo<=v<hi conditions. Tiny range table broadcasts "
    "(BroadcastNestedLoop over 3 rows — constant per-row work); at scale "
    "the alternative is a binning expression, same result, zero join.",
)
def q_range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    tiers = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1e9)],
        "tier string, lo double, hi double",
    )
    j = e.join(
        F.broadcast(tiers), (e.value >= tiers.lo) & (e.value < tiers.hi)
    )
    return (
        j.groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("total_value"),
        )
        .orderBy("tier")
    )


# -------------------------------------------------- array / higher-order funcs

@query(
    "array_hof_embeddings",
    oracle="""
    SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) / len(embedding), 4) AS mean_val
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    description="Higher-order array functions over array<float>: size, "
    "L2 norm (transform+aggregate fold), mean — the JVM-side vector "
    "kernels similarity search builds on; no UDF, no explode, no shuffle.",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.sqrt(sq), 4).alias("l2_norm"),
            F.round(sm / F.size("embedding"), 4).alias("mean_val"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


# --------------------------------------------------- deterministic sampling

@query(
    "hash_sample_orders",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="Deterministic ~10% sample by md5(key) bucket — "
    "reproducible across runs/partitionings/engines, unlike df.sample "
    "(per-partition seeded). Map-only, codegen, oracle-exact.",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sampling import hash_sample

    o = hash_sample(_t(spark, sf_dir, "orders"), "o_orderkey", 0.1)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "train_test_split_events",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '33'
                THEN 'test' ELSE 'train' END AS split,
           event_type, COUNT(*) AS n
    FROM events GROUP BY split, event_type ORDER BY split, event_type
    """,
    description="Leakage-safe train/test split: fate decided by "
    "md5(user_id), so ALL of a user's events land on one side — the "
    "guarantee row-level random splits cannot give.",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sampling import train_test_tag

    e = train_test_tag(_t(spark, sf_dir, "events"), "user_id", test_fraction=0.2)
    return (
        e.groupBy("split", "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("split", "event_type")
    )


@query(
    "stratified_sample_docs",
    oracle="""
    SELECT lang, COUNT(*) AS n FROM documents
    WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40')
       OR (lang = 'zh' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '100')
    GROUP BY lang ORDER BY lang
    """,
    description="Stratified deterministic sampling: downsample dominant "
    "'en' to 25%, keep all 'zh', drop the rest — the corpus-rebalancing "
    "primitive for training-data curation.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sampling import stratified_hash_sample

    d = stratified_hash_sample(
        _t(spark, sf_dir, "documents"), "doc_id", "lang", {"en": 0.25, "zh": 1.0}
    )
    return d.groupBy("lang").agg(F.count("*").alias("n")).orderBy("lang")


# ------------------------------------------------- grouped-map normalization

@query(
    "zscore_purchase_values",
    oracle="""
    WITH p AS (SELECT event_id, event_type, value FROM events
               WHERE event_type IN ('purchase', 'click')),
    s AS (SELECT event_id, event_type,
                 (value - AVG(value) OVER (PARTITION BY event_type))
                 / stddev_pop(value) OVER (PARTITION BY event_type) AS z
          FROM p)
    SELECT event_id, event_type, ROUND(z, 3) + 0.0 AS z
    FROM s ORDER BY event_id
    """,
    description="Per-group z-score through applyInPandas (Arrow grouped "
    "map) — the per-group-model extension point; oracle is the window-"
    "function twin, proving the pandas path computes exactly the "
    "shuffle-once built-in result.",
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.normalize import zscore_apply_in_pandas

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_id", "event_type", "value")
    )
    z = zscore_apply_in_pandas(e, ["event_type"], "value")
    return z.select(
        "event_id", "event_type", (F.round("z", 3) + F.lit(0.0)).alias("z")
    ).orderBy("event_id")


# ------------------------------------------------------------- ntile binning

@query(
    "ntile_deciles_orders",
    oracle="""
    WITH b AS (SELECT o_totalprice,
                      ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
               FROM orders)
    SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS lo,
           CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS hi
    FROM b GROUP BY decile ORDER BY decile
    """,
    description="Decile binning via ntile — quantile feature bucketing. "
    "The global order means ONE partition holds the sort at scale; for "
    "100 TB use percentile_approx cutpoints + a binning join instead "
    "(same output, no global sort) — this query is the exact-semantics "
    "variant.",
)
def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    b = o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
    return (
        b.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("decimal(18,2)").alias("lo"),
            F.max("o_totalprice").cast("decimal(18,2)").alias("hi"),
        )
        .orderBy("decile")
    )


# ------------------------------------------------------------------ UDTF

@query(
    "udtf_bigrams_docs",
    oracle="""
    WITH d AS (SELECT doc_id,
            list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                        w -> len(w) > 0) AS w
           FROM documents WHERE doc_id < 5)
    SELECT doc_id,
           CAST(u.b.pos AS INT) AS pos, u.b.ngram AS ngram
    FROM d, LATERAL unnest(list_transform(generate_series(1, len(w) - 1),
              i -> {'pos': i - 1, 'ngram': w[i] || ' ' || w[i+1]})) u(b)
    ORDER BY doc_id, pos
    """,
    description="Python UDTF (Spark 4 table function): row -> bigram "
    "rows via LATERAL join. The slow-path extension point — the engine's "
    "hot paths use explode over array expressions instead (JVM-side); "
    "this proves the UDTF plumbing with an exact oracle.",
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 5).createOrReplaceTempView(
        "v_docs_udtf"
    )
    return spark.sql("""
        SELECT doc_id, b.pos AS pos, b.ngram AS ngram
        FROM v_docs_udtf, LATERAL word_bigrams(text) b
        ORDER BY doc_id, pos
    """)


# ------------------------------------------------- near-dup cluster resolution

@query(
    "near_dup_components",
    oracle="""
    WITH RECURSIVE docs AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents WHERE doc_id < 200),
    grams AS (
      -- mirrors _shingles (operators/dedup.py) exactly, including
      -- short docs: window start runs 0..max(len-2, 0) and the slice
      -- truncates at the end, so a 1-word/empty doc yields one
      -- single-word (or empty-string) shingle, never zero rows
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                    generate_series(0, greatest(len(w) - 2, 0)),
                    i -> array_to_string(w[i + 1:i + 2], ' ')))) AS g
      FROM docs),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.2),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
    SELECT id AS doc_id, MIN(r) AS component
    FROM reach GROUP BY id ORDER BY doc_id
    """,
    description="Near-dup CLUSTER resolution: exact-Jaccard pairs -> "
    "connected components (A~B, B~C collapse to one cluster) via "
    "Pregel-style min-label propagation — one shuffle per round, "
    "converges in O(cluster diameter), lineage checkpointed per round. "
    "Oracle: recursive-CTE reachability in DuckDB.",
)
def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component")
    ).orderBy("doc_id")


_QUALITY_SQL = f"""
             ROUND(
               least(CAST(len({_TOKS_SQL}) AS DOUBLE) / 64.0, 1.0) * 0.5
               + (CASE WHEN (CASE WHEN len({_TOKS_SQL}) = 0 THEN 0.0
                             ELSE CAST(length(text) AS DOUBLE) / len({_TOKS_SQL}) END)
                       BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.3
               + (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
                         ELSE least(CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
                                    / CAST(length(text) AS DOUBLE) * 4.0, 1.0) END)) * 0.2,
               6)"""


@query(
    "dedup_keep_best_quality",
    # same exact-Jaccard pair mining + recursive-CTE components as
    # near_dup_components; the representative is the argmax of
    # (quality, lowest id) instead of the min id
    oracle=f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, text,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents WHERE doc_id < 200),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                    generate_series(0, greatest(len(w) - 2, 0)),
                    i -> array_to_string(w[i + 1:i + 2], ' ')))) AS g
      FROM docs),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.2),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    quality AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM docs),
    members AS (SELECT q.doc_id, q.quality, c.component
                FROM quality q JOIN comp c ON q.doc_id = c.id),
    winners AS (
      SELECT component, doc_id AS winner FROM (
        SELECT component, doc_id,
               ROW_NUMBER() OVER (PARTITION BY component
                   ORDER BY quality DESC, doc_id ASC) AS rn
        FROM members) x WHERE rn = 1),
    losers AS (SELECT m.doc_id FROM members m JOIN winners w
               ON m.component = w.component AND m.doc_id <> w.winner)
    SELECT q.doc_id, q.quality FROM quality q
    WHERE q.doc_id NOT IN (SELECT doc_id FROM losers)
    ORDER BY q.doc_id
    """,
    description="Near-dup cluster resolution keeping the BEST-quality "
    "member per cluster (argmax quality, ties to lowest id) instead of "
    "the first id — the curation-grade representative choice "
    "(operators/dedup.py:resolve_duplicate_clusters keep_by=). Cluster "
    "membership via exact-Jaccard pairs + Pregel min-label components; "
    "oracle replays it with recursive-CTE reachability + a window argmax.",
)
def q_dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import resolve_duplicate_clusters

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    kept = resolve_duplicate_clusters(docs, pairs, keep_by=T.quality_score("text"))
    return kept.select(
        "doc_id", T.quality_score("text").alias("quality")
    ).orderBy("doc_id")


# ----------------------------------------------------- time-series gap fill

@query(
    "gapfill_locf_daily",
    oracle="""
    WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day, value
               FROM events WHERE event_type = 'purchase' AND user_id < 20),
    daily AS (SELECT user_id, day,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
              FROM p GROUP BY user_id, day),
    b AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY user_id),
    spine AS (SELECT user_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
              FROM b),
    f AS (SELECT s.user_id, s.day, d.v
          FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day) AS v_filled,
           v IS NULL AS was_gap
    FROM f ORDER BY user_id, day
    """,
    description="Time-series gap fill: per-user day spine (sequence + "
    "explode), left join onto observed daily sums, last-observation-"
    "carried-forward via last(ignorenulls) — the resample/ffill "
    "primitive. Spine generation is per-key (no global calendar "
    "broadcast); the fill window shuffles once on user_id.",
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 20)
    )
    daily = (
        e.select("user_id", F.to_date("ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(18,4)").alias("v"))
    )
    bounds = daily.groupBy("user_id").agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    f = spine.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    return f.select(
        "user_id",
        # DATE columns reach pandas as datetime.date objects on the Spark
        # side but datetime64 on the DuckDB side — emit TIMESTAMP (the
        # hash-proven representation) from both engines.
        F.col("day").cast("timestamp").alias("day"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    ).orderBy("user_id", "day")


# ------------------------------------------------------- window rank breadth

@query(
    "window_rank_stats",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ROUND(cume_dist() OVER w, 6) AS cdist
    FROM orders WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, rnk
    """,
    description="Ranking-family breadth: rank / dense_rank / "
    "percent_rank / cume_dist over one (partition, order) — all four "
    "share a single sort+shuffle (one Window node).",
)
def q_window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_orderpriority", "rnk")
    )


# ---------------------------------------------------------------- unpivot

@query(
    "unpivot_order_stats",
    oracle="""
    WITH s AS (SELECT o_orderpriority,
                      CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS min_price,
                      CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS max_price
               FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, 'min_price' AS metric, min_price AS val FROM s
    UNION ALL
    SELECT o_orderpriority, 'max_price' AS metric, max_price AS val FROM s
    ORDER BY o_orderpriority, metric
    """,
    description="unpivot/melt (wide -> long): per-priority min/max "
    "columns melted to (metric, val) rows — the inverse of pivot, "
    "planned as Expand (no self-union, one scan).",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").cast("decimal(18,2)").alias("min_price"),
        F.max("o_totalprice").cast("decimal(18,2)").alias("max_price"),
    )
    return s.unpivot(
        ["o_orderpriority"], ["min_price", "max_price"], "metric", "val"
    ).orderBy("o_orderpriority", "metric")


# ---------------------------------------------------------------- IVF ANN

def _sq_dist_sql(va: str, vb: str, dim: int) -> str:
    """DuckDB squared-euclidean between two DOUBLE[] expressions."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> ({va}[i] - {vb}[i]) ** 2))"
    )


def _kmeans_ctes(
    k_clusters: int, max_iter: int, dim: int, where: str = ""
) -> list[str]:
    """CTE chain replaying the deterministic kmeans_fit in SQL.
    ``where`` optionally restricts the training vectors (the
    incremental-index oracle trains on a subset and assigns the rest).

    kmeans_fit is fully deterministic (k-lowest-id init, fixed iteration
    count, lexicographic (distance, cid) argmin tie-break), so the fixed
    ``max_iter`` Lloyd rounds unroll into chained CTEs: a{n} = assignment
    under c{n-1}, c{n} = per-(cluster, dim) means of a{n}. Shared by the
    IVF, IVFPQ and semantic-dedup oracles."""
    ctes = [
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
        + (f" WHERE {where}" if where else "")
        + ")",
        f"""c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
             v AS centroid
      FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {k_clusters}))""",
    ]
    for n in range(1, max_iter + 1):
        ctes.append(f"""a{n} AS (
      SELECT id, cid, v FROM (
        SELECT e.vec_id AS id, c.cid, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_sq_dist_sql('e.v', 'c.centroid', dim)} ASC, c.cid ASC) AS rn
        FROM vecs e CROSS JOIN c{n - 1} c) x WHERE rn = 1)""")
        ctes.append(f"""c{n} AS (
      SELECT cid, list(m ORDER BY pos) AS centroid
      FROM (SELECT cid, pos, AVG(val) AS m
            FROM (SELECT cid, generate_subscripts(v, 1) AS pos,
                         unnest(v) AS val FROM a{n}) u
            GROUP BY cid, pos) g
      GROUP BY cid)""")
    return ctes


def _ivf_topk_oracle(
    k_clusters: int = 8, max_iter: int = 3, k: int = 5, nprobe: int = 3, dim: int = 64
) -> str:
    """Oracle = the SAME IVF pipeline in SQL (see _kmeans_ctes). The
    final SELECT replays ivf_topk's probe (rank centroids per query,
    keep nprobe, exact cosine inside probed clusters, top-k window).
    Checks the quantizer, the assignment argmin, the probe, and the
    re-rank end-to-end."""

    def dist(va: str, vb: str) -> str:
        return _sq_dist_sql(va, vb, dim)

    ctes = _kmeans_ctes(k_clusters, max_iter, dim)
    ctes.append("q AS (SELECT vec_id AS q_id, v AS qv FROM vecs WHERE vec_id < 3)")
    ctes.append(f"""probed AS (
      SELECT q_id, cid, qv FROM (
        SELECT q.q_id, c.cid, q.qv,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                   ORDER BY {dist('q.qv', 'c.centroid')} ASC, c.cid ASC) AS pr
        FROM q CROSS JOIN c{max_iter} c) x WHERE pr <= {nprobe})""")
    ctes.append(f"""scored AS (
      SELECT probed.q_id, e.vec_id, list_cosine_similarity(e.v, probed.qv) AS sim
      FROM vecs e JOIN a{max_iter} a ON e.vec_id = a.id
      JOIN probed ON a.cid = probed.cid)""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT q_id, vec_id, ROUND(sim, 6) AS cosine_sim, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY sim DESC, vec_id) AS rn FROM scored) r
    WHERE rn <= {k}
    """


@query(
    "ivf_topk",
    # kmeans_fit is deterministic end-to-end, so the oracle unrolls the
    # same 3 Lloyd rounds in SQL and replays the probe — an exact value
    # check of the full approximate pipeline (see _ivf_topk_oracle).
    oracle=_ivf_topk_oracle,
    description="IVF approximate nearest neighbors: DataFrame-native "
    "Lloyd's k-means coarse quantizer (broadcast-join assignment + "
    "min_by argmin, per-dim mean update), then probe only the nprobe "
    "nearest clusters per query — scored rows scale by nprobe/k instead "
    "of |C|. Self-retrieval exact at nprobe=1; oracle unrolls the same "
    "deterministic k-means + probe in SQL.",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import ivf_topk, kmeans_fit

    e = _t(spark, sf_dir, "embeddings")
    assign, cents = kmeans_fit(e, k=8, max_iter=3)
    qs = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = ivf_topk(qs, e, assign, cents, k=5, nprobe=3)
    return out.select(
        "q_id",
        "vec_id",
        F.round("cosine_sim", 6).alias("cosine_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


# ----------------------------------------------------------- semantic dedup

def _semantic_dedup_oracle(
    k_clusters: int = 8, max_iter: int = 3, threshold: float = 0.95, dim: int = 64
) -> str:
    """Replays semantic_dedup end-to-end: the deterministic k-means CTE
    chain (_kmeans_ctes), the intra-cluster cosine>=threshold self-join,
    and the greedy keep-lowest-id policy as a LEFT JOIN null test."""
    a = f"a{max_iter}"
    ctes = _kmeans_ctes(k_clusters, max_iter, dim)
    # the cosine is spelled out as dot/(sqrt(dot(x,x))*sqrt(dot(y,y))) —
    # the SAME expression (same ops, same order) the engine evaluates —
    # rather than DuckDB's builtin list_cosine_similarity, so a pair
    # landing exactly on the threshold boundary cannot flip `kept`
    # between engines (ADVICE r5)
    ctes.append(f"""dropped AS (
      SELECT DISTINCT y.id AS id_b
      FROM {a} x JOIN {a} y ON x.cid = y.cid AND x.id < y.id
      WHERE list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v))
               * sqrt(list_dot_product(y.v, y.v))) >= {threshold})""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT a.id AS vec_id, a.cid AS cid, d.id_b IS NULL AS kept
    FROM {a} a LEFT JOIN dropped d ON a.id = d.id_b
    ORDER BY vec_id
    """


@query(
    "semantic_dedup",
    oracle=_semantic_dedup_oracle,
    description="SemDeDup (Abbas et al. 2023): k-means clusters the "
    "embedding corpus, cosine>=0.95 pairs are found ONLY within each "
    "cluster (pair work is sum of squared cluster sizes, never corpus "
    "N^2 — raise k with N so clusters stay bounded), and the greedy "
    "keep-lowest-id policy drops the semantic duplicates. Oracle "
    "replays the deterministic k-means + intra-cluster join + keep "
    "policy in SQL (same CTE chain as ivf_topk).",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(e, k=8, max_iter=3, threshold=0.95).orderBy("vec_id")


def _cluster_profile_oracle(
    k_clusters: int = 8, max_iter: int = 3, dim: int = 64
) -> str:
    a, c = f"a{max_iter}", f"c{max_iter}"
    ctes = _kmeans_ctes(k_clusters, max_iter, dim)
    return f"""
    WITH {', '.join(ctes)}
    SELECT a.cid AS cid, COUNT(*) AS n,
           ROUND(AVG(sqrt({_sq_dist_sql('a.v', 'c.centroid', dim)})), 6)
             AS avg_dist
    FROM {a} a JOIN {c} c ON a.cid = c.cid
    GROUP BY a.cid ORDER BY a.cid
    """


@query(
    "embedding_cluster_profile",
    oracle=_cluster_profile_oracle,
    description="Corpus composition profile: k-means partition sizes + "
    "mean distance-to-centroid per cluster (the cohesion diagnostic "
    "data-mixture tuning reads before re-weighting domains). Centroids "
    "broadcast; one aggregate over the assignment — and the same "
    "deterministic k-means CTE chain oracles it.",
)
def q_embedding_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import _sq_dist, kmeans_fit

    e = _t(spark, sf_dir, "embeddings")
    assign, cents = kmeans_fit(e, k=8, max_iter=3)
    vecs = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    return (
        assign.withColumnRenamed("vec_id", "id")
        .join(vecs, "id")
        .join(F.broadcast(cents), "cid")
        .groupBy("cid")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.avg(F.sqrt(_sq_dist(F.col("v"), F.col("centroid")))), 6
            ).alias("avg_dist"),
        )
        .orderBy("cid")
    )


# ------------------------------------------------------- BPE tokenizer training

_BPE_N_MERGES = 8


def _bpe_word_cte() -> str:
    """(word, cnt) over lowercased whitespace tokens matching ^[a-z]+$ —
    mirrors tokenize.word_frequencies (same guard as word_freq_top20)."""
    return r"""wf AS (
      SELECT w AS word, COUNT(*) AS cnt FROM (
        SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(lower(text)), '\s+') END) AS w
        FROM documents) t
      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w)"""


def _bpe_round_ctes(n_merges: int) -> list[str]:
    """CTE chain replaying bpe_train: w0 = sentinel-wrapped char symbol
    strings, then per round r: pair counts p{r}/c{r}, the deterministic
    argmax b{r} (count desc, RS-joined pair key asc — RS sorts below
    [a-z], matching Spark's struct tie-break), and w{r} = leftmost-non-
    overlapping replace of the winning pair inside every word. The
    doubled inner sentinels make both engines' replace exactly BPE's
    greedy left-to-right merge (see operators/tokenize.py)."""
    from azure_etl_spark.operators.tokenize import DSEP, PSEP, SEP

    ctes = [
        _bpe_word_cte(),
        f"""w0 AS (
      SELECT '{SEP}' || array_to_string(string_split(word, ''), '{DSEP}') || '{SEP}' AS s,
             cnt
      FROM wf)""",
    ]
    for r in range(1, n_merges + 1):
        ctes.append(f"""p{r} AS (
      SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
                    i -> struct_pack(lhs := arr[i], rhs := arr[i + 1]))) AS pr, cnt
      FROM (SELECT string_split(substring(s, 2, length(s) - 2), '{DSEP}') AS arr, cnt
            FROM w{r - 1}) t)""")
        ctes.append(f"""c{r} AS (
      SELECT pr.lhs AS lhs, pr.rhs AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM p{r} GROUP BY 1, 2)""")
        ctes.append(f"""b{r} AS (
      SELECT lhs, rhs, lhs || rhs AS merged, pair_count,
             '{SEP}' || lhs || '{DSEP}' || rhs || '{SEP}' AS pat,
             '{SEP}' || lhs || rhs || '{SEP}' AS rep
      FROM c{r} ORDER BY pair_count DESC, lhs || '{PSEP}' || rhs ASC LIMIT 1)""")
        # LEFT JOIN ON TRUE + COALESCE guards the exhausted-vocabulary
        # case (ADVICE r5): when no pair remains before round n, b{r}
        # is EMPTY — a plain cross join would empty every later CTE,
        # while the engine's bpe_train early-stops and keeps encoding.
        # With the guard, b.pat is NULL, replace() yields NULL, and
        # COALESCE carries the word through unchanged — mirroring the
        # engine's early-stop exactly.
        ctes.append(f"""w{r} AS MATERIALIZED (
      SELECT COALESCE(replace(s, b.pat, b.rep), s) AS s, cnt
      FROM w{r - 1} LEFT JOIN b{r} b ON TRUE)""")
    return ctes


def _bpe_train_oracle() -> str:
    n = _BPE_N_MERGES
    union = "\n      UNION ALL ".join(
        f"SELECT {r} AS rank, lhs, rhs, merged, pair_count FROM b{r}"
        for r in range(1, n + 1)
    )
    return f"""
    WITH {', '.join(_bpe_round_ctes(n))}
    SELECT rank, lhs, rhs, merged, pair_count FROM ({union}) u ORDER BY rank
    """


@query(
    "bpe_train_merges",
    oracle=_bpe_train_oracle,
    description="In-engine BPE tokenizer training (Sennrich et al. "
    "2016): one corpus-wide word-count shuffle, then each merge round "
    "is a linear pass over the (small, Heaps-law) vocabulary table — "
    "explode adjacent symbol pairs, 1-row deterministic argmax "
    "(count desc, pair asc), broadcast the winner back and merge via "
    "one JVM replace on sentinel-wrapped symbol strings. Oracle "
    "unrolls all 8 rounds as chained CTEs and replays the identical "
    "greedy leftmost merges.",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.tokenize import bpe_train, word_frequencies

    merges, _ = bpe_train(word_frequencies(_td(spark, sf_dir)), _BPE_N_MERGES)
    return merges.orderBy("rank")


def _bpe_encode_oracle() -> str:
    from azure_etl_spark.operators.tokenize import DSEP, SEP

    n = _BPE_N_MERGES
    ctes = _bpe_round_ctes(n)
    ctes.append(rf"""d0 AS (
      SELECT doc_id,
             list_transform(words,
                 w -> '{SEP}' || array_to_string(string_split(w, ''), '{DSEP}') || '{SEP}')
                 AS syms
      FROM (SELECT doc_id,
                   list_filter(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(lower(text)), '\s+') END,
                               w -> regexp_matches(w, '^[a-z]+$')) AS words
            FROM documents) t)""")
    for r in range(1, n + 1):
        # same exhausted-vocabulary guard as w{r} (ADVICE r5)
        ctes.append(f"""d{r} AS (
      SELECT doc_id, list_transform(syms, s -> COALESCE(replace(s, b.pat, b.rep), s)) AS syms
      FROM d{r - 1} LEFT JOIN b{r} b ON TRUE)""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT doc_id, CAST(len(toks) AS INT) AS n_bpe_tokens,
           array_to_string(toks, ' ') AS tok_str
    FROM (SELECT doc_id,
                 flatten(list_transform(syms,
                     s -> string_split(substring(s, 2, length(s) - 2), '{DSEP}'))) AS toks
          FROM d{n}) f
    ORDER BY doc_id
    """


def _bpe_token_freq_oracle() -> str:
    from azure_etl_spark.operators.tokenize import DSEP, SEP

    n = _BPE_N_MERGES
    ctes = _bpe_round_ctes(n)
    ctes.append(rf"""d0 AS (
      SELECT doc_id,
             list_transform(words,
                 w -> '{SEP}' || array_to_string(string_split(w, ''), '{DSEP}') || '{SEP}')
                 AS syms
      FROM (SELECT doc_id,
                   list_filter(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(lower(text)), '\s+') END,
                               w -> regexp_matches(w, '^[a-z]+$')) AS words
            FROM documents) t)""")
    for r in range(1, n + 1):
        # same exhausted-vocabulary guard as w{r} (ADVICE r5)
        ctes.append(f"""d{r} AS (
      SELECT doc_id, list_transform(syms, s -> COALESCE(replace(s, b.pat, b.rep), s)) AS syms
      FROM d{r - 1} LEFT JOIN b{r} b ON TRUE)""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(flatten(list_transform(syms,
              s -> string_split(substring(s, 2, length(s) - 2), '{DSEP}')))) AS tok
          FROM d{n}) u
    GROUP BY tok ORDER BY n DESC, tok LIMIT 40
    """


@query(
    "bpe_token_freq",
    oracle=_bpe_token_freq_oracle,
    description="Corpus token distribution under the trained BPE "
    "tokenizer (top-40): the sanity table every tokenizer training run "
    "ends with — merged subwords surface with their true corpus "
    "frequencies. Same single encode pass as bpe_encode_docs plus one "
    "explode + count.",
)
def q_bpe_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.tokenize import bpe_encode, bpe_train, word_frequencies

    d = _td(spark, sf_dir)
    _, rounds = bpe_train(word_frequencies(d), _BPE_N_MERGES)
    enc = bpe_encode(d, rounds)
    return (
        enc.select(F.explode("bpe_tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(40)
    )


@query(
    "bpe_encode_docs",
    oracle=_bpe_encode_oracle,
    description="Apply the learned BPE merges to the corpus: each "
    "round's winning pair is a 1-row broadcast and one JVM replace "
    "inside a per-word transform — the corpus never shuffles. Oracle "
    "chains the same 8 replaces over the same training CTEs, so "
    "training AND encoding are value-checked end-to-end.",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.tokenize import bpe_encode, bpe_train, word_frequencies

    d = _td(spark, sf_dir)
    _, rounds = bpe_train(word_frequencies(d), _BPE_N_MERGES)
    return (
        bpe_encode(d, rounds)
        .select(
            "doc_id",
            "n_bpe_tokens",
            F.array_join("bpe_tokens", " ").alias("tok_str"),
        )
        .orderBy("doc_id")
    )


def _pq_topk_oracle(
    m: int = 4, k_codes: int = 16, max_iter: int = 3, k: int = 5, dim: int = 64
) -> str:
    """Oracle = the full product-quantization pipeline in SQL. Every
    stage is deterministic (pq_train = kmeans_fit per subspace with
    k-lowest-id init and (distance, cid) argmin; encode uses the same
    argmin; ADC is a sum of exact lookups), so the oracle unrolls m
    independent k-means runs as chained CTEs, re-encodes every vector,
    rebuilds the per-query lookup tables, and replays the ADC top-k —
    an exact value check of train+encode+search end-to-end."""
    sub_len = dim // m

    def dist(va: str, vb: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {sub_len}),"
            f" i -> ({va}[i] - {vb}[i]) ** 2))"
        )

    ctes = ["vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"]
    part_selects = []
    for s in range(m):
        lo, hi = s * sub_len + 1, (s + 1) * sub_len
        ctes.append(f"sv{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM vecs)")
        ctes.append(f"""c0_{s} AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
             v AS centroid
      FROM (SELECT vec_id, v FROM sv{s} ORDER BY vec_id LIMIT {k_codes}))""")
        for n in range(1, max_iter + 1):
            ctes.append(f"""a{n}_{s} AS (
      SELECT id, cid, v FROM (
        SELECT e.vec_id AS id, c.cid, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid')} ASC, c.cid ASC) AS rn
        FROM sv{s} e CROSS JOIN c{n - 1}_{s} c) x WHERE rn = 1)""")
            ctes.append(f"""c{n}_{s} AS (
      SELECT cid, list(mv ORDER BY pos) AS centroid
      FROM (SELECT cid, pos, AVG(val) AS mv
            FROM (SELECT cid, generate_subscripts(v, 1) AS pos,
                         unnest(v) AS val FROM a{n}_{s}) u
            GROUP BY cid, pos) g
      GROUP BY cid)""")
        ctes.append(f"""enc{s} AS (
      SELECT vec_id, cid AS code FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid')} ASC, c.cid ASC) AS rn
        FROM sv{s} e CROSS JOIN c{max_iter}_{s} c) x WHERE rn = 1)""")
        ctes.append(f"""lut{s} AS (
      SELECT q.vec_id AS q_id, c.cid AS code,
             {dist('q.v', 'c.centroid')} AS part
      FROM sv{s} q CROSS JOIN c{max_iter}_{s} c WHERE q.vec_id < 3)""")
        part_selects.append(
            f"SELECT l.q_id, e.vec_id, l.part FROM enc{s} e "
            f"JOIN lut{s} l ON e.code = l.code"
        )
    ctes.append(
        "scored AS (SELECT q_id, vec_id, SUM(part) AS adc FROM ("
        + " UNION ALL ".join(part_selects)
        + ") parts GROUP BY q_id, vec_id)"
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT q_id, vec_id, ROUND(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY adc ASC, vec_id ASC) AS rn FROM scored) r
    WHERE rn <= {k}
    """


@query(
    "pq_topk",
    oracle=_pq_topk_oracle,
    description="Product-quantization ANN (Jégou et al. 2011): "
    "per-subspace deterministic k-means codebooks (pq_train), "
    "argmin encoding to m small codes per vector — a 64x memory "
    "compression of the candidate scan — and asymmetric-distance "
    "(ADC) top-k where each candidate costs m table lookups instead "
    "of a dim-wide arithmetic pass (operators/similarity.py). "
    "Complements IVF: IVF cuts how many candidates are scored, PQ "
    "cuts the cost of each. Oracle unrolls all m k-means runs, the "
    "encoding, the lookup tables, and the ADC ranking in SQL.",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import pq_encode, pq_topk, pq_train

    e = _t(spark, sf_dir, "embeddings")
    books = pq_train(e, m=4, k_codes=16, max_iter=3)
    enc = pq_encode(e, books, m=4)
    qs = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = pq_topk(qs, enc, books, k=5, m=4)
    return out.select(
        "q_id",
        "vec_id",
        F.round("adc_dist", 4).alias("adc_dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _ivf_pq_topk_oracle(
    k_clusters: int = 8, coarse_iter: int = 3, m: int = 4, k_codes: int = 16,
    pq_iter: int = 3, k: int = 5, nprobe: int = 3, dim: int = 64,
) -> str:
    """Oracle for the IVF+PQ composition: the coarse k-means + probe
    CTEs from _ivf_topk_oracle chained with the per-subspace codebook +
    encode + LUT CTEs from _pq_topk_oracle, with ADC scoring restricted
    to (query, vector) pairs whose cluster the query probes."""
    sub_len = dim // m

    def dist(va: str, vb: str, n: int) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {n}),"
            f" i -> ({va}[i] - {vb}[i]) ** 2))"
        )

    ctes = ["vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"]
    # coarse quantizer (full-dim k-means) + probe
    ctes.append(f"""g0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
             v AS centroid
      FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {k_clusters}))""")
    for n in range(1, coarse_iter + 1):
        ctes.append(f"""ga{n} AS (
      SELECT id, cid, v FROM (
        SELECT e.vec_id AS id, c.cid, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid', dim)} ASC, c.cid ASC) AS rn
        FROM vecs e CROSS JOIN g{n - 1} c) x WHERE rn = 1)""")
        ctes.append(f"""g{n} AS (
      SELECT cid, list(mv ORDER BY pos) AS centroid
      FROM (SELECT cid, pos, AVG(val) AS mv
            FROM (SELECT cid, generate_subscripts(v, 1) AS pos,
                         unnest(v) AS val FROM ga{n}) u
            GROUP BY cid, pos) g
      GROUP BY cid)""")
    ctes.append("qv AS (SELECT vec_id AS q_id, v FROM vecs WHERE vec_id < 3)")
    ctes.append(f"""probed AS (
      SELECT q_id, cid FROM (
        SELECT q.q_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                   ORDER BY {dist('q.v', 'c.centroid', dim)} ASC, c.cid ASC) AS pr
        FROM qv q CROSS JOIN g{coarse_iter} c) x WHERE pr <= {nprobe})""")
    ctes.append(f"""pairs AS (
      SELECT p.q_id, a.id AS vec_id FROM ga{coarse_iter} a
      JOIN probed p ON a.cid = p.cid)""")
    # PQ codebooks per subspace + encode + LUT
    part_selects = []
    for s in range(m):
        lo, hi = s * sub_len + 1, (s + 1) * sub_len
        ctes.append(f"sv{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM vecs)")
        ctes.append(f"""c0_{s} AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
             v AS centroid
      FROM (SELECT vec_id, v FROM sv{s} ORDER BY vec_id LIMIT {k_codes}))""")
        for n in range(1, pq_iter + 1):
            ctes.append(f"""a{n}_{s} AS (
      SELECT id, cid, v FROM (
        SELECT e.vec_id AS id, c.cid, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid', sub_len)} ASC, c.cid ASC) AS rn
        FROM sv{s} e CROSS JOIN c{n - 1}_{s} c) x WHERE rn = 1)""")
            ctes.append(f"""c{n}_{s} AS (
      SELECT cid, list(mv ORDER BY pos) AS centroid
      FROM (SELECT cid, pos, AVG(val) AS mv
            FROM (SELECT cid, generate_subscripts(v, 1) AS pos,
                         unnest(v) AS val FROM a{n}_{s}) u
            GROUP BY cid, pos) g
      GROUP BY cid)""")
        ctes.append(f"""enc{s} AS (
      SELECT vec_id, cid AS code FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid', sub_len)} ASC, c.cid ASC) AS rn
        FROM sv{s} e CROSS JOIN c{pq_iter}_{s} c) x WHERE rn = 1)""")
        ctes.append(f"""lut{s} AS (
      SELECT q.vec_id AS q_id, c.cid AS code,
             {dist('q.v', 'c.centroid', sub_len)} AS part
      FROM sv{s} q CROSS JOIN c{pq_iter}_{s} c WHERE q.vec_id < 3)""")
        part_selects.append(
            f"SELECT p.q_id, p.vec_id, l.part FROM pairs p "
            f"JOIN enc{s} e ON p.vec_id = e.vec_id "
            f"JOIN lut{s} l ON l.q_id = p.q_id AND l.code = e.code"
        )
    ctes.append(
        "scored AS (SELECT q_id, vec_id, SUM(part) AS adc FROM ("
        + " UNION ALL ".join(part_selects)
        + ") parts GROUP BY q_id, vec_id)"
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT q_id, vec_id, ROUND(adc, 4) AS adc_dist, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY adc ASC, vec_id ASC) AS rn FROM scored) r
    WHERE rn <= {k}
    """


@query(
    "ivf_pq_topk",
    oracle=_ivf_pq_topk_oracle,
    description="IVF + product quantization composed (the FAISS IVFPQ "
    "recipe, operators/similarity.py:ivf_pq_topk): the coarse "
    "quantizer's probe cuts HOW MANY candidates are scored "
    "(nprobe/k_clusters of the corpus), PQ's ADC lookup cuts WHAT each "
    "one costs (m lookups vs a dim-wide pass) — the savings multiply. "
    "Both quantizers are the same deterministic k-means, so the oracle "
    "unrolls the coarse k-means + probe AND all m per-subspace "
    "codebooks + encode + lookup tables, then replays the restricted "
    "ADC ranking — end-to-end exact.",
)
def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import (
        ivf_pq_topk,
        kmeans_fit,
        pq_encode,
        pq_train,
    )

    e = _t(spark, sf_dir, "embeddings")
    assign, cents = kmeans_fit(e, k=8, max_iter=3)
    books = pq_train(e, m=4, k_codes=16, max_iter=3)
    enc = pq_encode(e, books, m=4)
    qs = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = ivf_pq_topk(qs, enc, assign, cents, books, k=5, nprobe=3, m=4)
    return out.select(
        "q_id",
        "vec_id",
        F.round("adc_dist", 4).alias("adc_dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _logreg_oracle(iters: int = 3, lr: float = 0.5) -> str:
    """Oracle for in-engine logistic regression: zero-init full-batch
    gradient descent with a FIXED iteration count is deterministic
    modulo float-sum order (the same property the k-means oracles use),
    so the loop unrolls into chained single-row weight CTEs — g{n} is
    one aggregate over the feature CTE under weights w{n-1}, w{n} is a
    scalar update. The final SELECT replays the sigmoid scoring."""
    feats = ["x0", "x1", "x2", "x3"]
    wcols = ["a", "b", "c", "d"]

    def zexpr(alias: str) -> str:
        return " + ".join(f"{alias}.{w} * {x}" for w, x in zip(wcols, feats))

    ctes = [f"""feats AS (
      SELECT doc_id,
             1.0 AS x0,
             ln(1.0 + CAST(len({_TOKS_SQL}) AS DOUBLE)) AS x1,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) END AS x2,
             CASE WHEN len({_TOKS_SQL}) = 0 THEN 0.0
                  ELSE CAST(length(text) AS DOUBLE) / len({_TOKS_SQL}) END AS x3,
             CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
      FROM documents)""",
            "w0 AS (SELECT " + ", ".join(f"0.0 AS {w}" for w in wcols) + ")"]
    for n in range(1, iters + 1):
        g = ", ".join(
            f"AVG((1.0 / (1.0 + exp(-({zexpr('w')}))) - y) * {x}) AS g{j}"
            for j, x in enumerate(feats)
        )
        ctes.append(f"g{n} AS (SELECT {g} FROM feats CROSS JOIN w{n - 1} w)")
        upd = ", ".join(
            f"w.{wc} - {lr} * g.g{j} AS {wc}" for j, wc in enumerate(wcols)
        )
        ctes.append(f"w{n} AS (SELECT {upd} FROM w{n - 1} w CROSS JOIN g{n} g)")
    return f"""
    WITH {', '.join(ctes)}
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-({zexpr('w')}))), 5) AS prob,
           CAST(y AS INT) AS label
    FROM feats CROSS JOIN w{iters} w
    WHERE doc_id < 300 ORDER BY doc_id
    """


@query(
    "logreg_quality_filter",
    oracle=_logreg_oracle,
    description="In-engine quality-classifier training (operators/"
    "quality.py:logreg_fit): full-batch gradient-descent logistic "
    "regression where each of the 3 fixed iterations is ONE distributed "
    "aggregation (avg gradient per feature, map-side combined) and the "
    "only driver state is the 4-float weight vector; scoring folds the "
    "weights into a codegen sigmoid expression (logreg_score) — the "
    "fasttext-style quality-filter step of an LLM curation pipeline "
    "with no ML library. Features: bias, ln(1+tokens), punctuation "
    "ratio, mean token length; label = benchmark shard membership. "
    "Oracle unrolls the same 3 GD steps as chained single-row weight "
    "CTEs and replays the scoring.",
)
def q_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.quality import logreg_fit, logreg_score

    docs = _td(spark, sf_dir)
    t = F.col("text")
    n_tok = F.when(F.trim(t) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    ).cast("double")
    chars = F.length(t).cast("double")
    punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?]", "")).cast("double")
    feats = docs.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        F.log(F.lit(1.0) + n_tok).alias("x1"),
        F.when(chars == 0, F.lit(0.0)).otherwise(punct / chars).alias("x2"),
        F.when(n_tok == 0, F.lit(0.0)).otherwise(chars / n_tok).alias("x3"),
        F.when(F.col("source") == "src0", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )
    cols = ["x0", "x1", "x2", "x3"]
    w = logreg_fit(feats, cols, "y", iters=3, lr=0.5)
    scored = logreg_score(feats, cols, w)
    return (
        scored.filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.round("prob", 5).alias("prob"),
            F.col("y").cast("int").alias("label"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------- nulls / string distance

@query(
    "null_handling_customers",
    oracle="""
    WITH c AS (SELECT c_custkey, c_mktsegment,
                      NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
                      CAST(NULLIF(ROUND(c_acctbal, 2), 0.00) AS DECIMAL(12,2)) AS bal_or_null
               FROM customer)
    SELECT COALESCE(seg_or_null, 'SUPPRESSED') AS segment,
           COUNT(*) AS n,
           COUNT(seg_or_null) AS n_not_null,
           CAST(SUM(CASE WHEN bal_or_null IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_bal,
           CAST(COALESCE(SUM(bal_or_null), 0) AS DECIMAL(18,2)) AS total_bal
    FROM c GROUP BY segment ORDER BY segment
    """,
    description="Null semantics breadth: NULLIF / COALESCE / CASE, "
    "null-skipping COUNT(col) vs COUNT(*), null-safe SUM with a COALESCE "
    "floor — ANSI three-valued logic matching the oracle exactly.",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.nullif(F.round("c_acctbal", 2), F.lit(0.00))
        .cast("decimal(12,2)")
        .alias("bal_or_null"),
    )
    return (
        c.groupBy(F.coalesce("seg_or_null", F.lit("SUPPRESSED")).alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.count("seg_or_null").alias("n_not_null"),
            F.sum(F.when(F.col("bal_or_null").isNull(), 1).otherwise(0)).alias(
                "n_zero_bal"
            ),
            F.coalesce(F.sum("bal_or_null"), F.lit(0))
            .cast("decimal(18,2)")
            .alias("total_bal"),
        )
        .orderBy("segment")
    )


@query(
    "string_distance_suppliers",
    oracle="""
    SELECT s_suppkey,
           CAST(levenshtein(s_name, 'Supplier#000000001') AS BIGINT) AS lev,
           lpad(CAST(s_suppkey AS VARCHAR), 10, '0') AS padded,
           translate(s_name, '#0', '_x') AS translated,
           reverse(s_name) AS rev
    FROM supplier ORDER BY lev, s_suppkey LIMIT 25
    """,
    description="String-function breadth: levenshtein edit distance "
    "(fuzzy-match primitive), lpad zero-padding, translate, reverse — "
    "all JVM built-ins under codegen; ordered top-k by distance.",
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    return (
        s.select(
            "s_suppkey",
            F.levenshtein(F.col("s_name"), F.lit("Supplier#000000001"))
            .cast("long")
            .alias("lev"),
            F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("padded"),
            F.translate(F.col("s_name"), "#0", "_x").alias("translated"),
            F.reverse(F.col("s_name")).alias("rev"),
        )
        .orderBy(F.col("lev").asc(), F.col("s_suppkey").asc())
        .limit(25)
    )


# ------------------------------------------------------------------ TF-IDF

@query(
    "tfidf_top_terms",
    oracle="""
    WITH docs AS (SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
           FROM documents WHERE doc_id < 40),
    toks AS (SELECT doc_id, unnest(w) AS term FROM docs),
    toks2 AS (SELECT doc_id, term FROM toks WHERE len(term) > 0),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2 GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS nd FROM docs),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             ROUND(tf.tf * (ln(CAST(n.nd + 1 AS DOUBLE) / (dfreq.df + 1)) + 1.0), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    SELECT doc_id, term, tf, CAST(rank AS INT) AS rank, tfidf
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
    description="Top-3 characteristic terms per doc by smoothed TF-IDF: "
    "explode -> (doc,term) counts -> vocabulary-sized document-frequency "
    "join (broadcast) -> per-doc window top-N. Corpus size joins in as a "
    "broadcast scalar, so the plan has no driver-side count.",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    out = T.tf_idf_top_terms(d, top_n=3)
    return out.select("doc_id", "term", "tf", "rank", "tfidf").orderBy("doc_id", "rank")


# --------------------------------------------- skew / rolling / PII / outer

@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Explicit two-phase salted aggregation for skewed keys: "
    "phase 1 groups by (key, salt) so a dominant key spreads over N "
    "reducers, phase 2 merges partials. Result is exactly the plain "
    "groupBy (the oracle) — the salt only reshapes the shuffle.",
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import two_phase_salted_agg

    e = _t(spark, sf_dir, "events").withColumn(
        "v", F.col("value").cast("decimal(18,4)")
    )
    out = two_phase_salted_agg(e, ["event_type"], salt_buckets=16).count_sum(
        "v", sum_alias="total", n_alias="n"
    )
    return out.select(
        "event_type", "n", F.col("total").cast("decimal(18,4)").alias("total")
    ).orderBy("event_type")


@query(
    "join_skewed_salted",
    oracle="""
    WITH skew AS (
      SELECT CASE WHEN l_orderkey % 10 < 6 THEN CAST(1 AS BIGINT)
                  ELSE CAST(l_orderkey % 1000 AS BIGINT) END AS k,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
      FROM lineitem),
    dim AS (SELECT DISTINCT CAST(o_orderkey % 1000 AS BIGINT) AS k
            FROM orders),
    d2 AS (SELECT k, CAST(k % 7 AS INT) AS grp FROM dim)
    SELECT grp, COUNT(*) AS n, SUM(rev) AS revenue
    FROM skew JOIN d2 USING (k)
    GROUP BY grp ORDER BY grp
    """,
    description="Deliberately skewed equi-join through the SALTED path "
    "(operators/joins.salted_join; round-9 bench entry, VERDICT r8 "
    "#7): ~60% of the fact rows collapse onto ONE hot key, the kind "
    "of key that melts a single reducer in a plain shuffle join — the "
    "salted join scatters it over 16 (key, salt) reducers by "
    "replicating the 1000-row dim side 16x, and the result set is "
    "EXACTLY the unsalted join (the oracle joins plain SQL; salt "
    "never leaks into results). Wall-time-protects the skew "
    "mitigation the engine reaches for when AQE's runtime skew split "
    "isn't available (bucketed/co-partitioned pipelines, sinks "
    "without an agg).",
    bench=True,
)
def q_join_skewed_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.joins import salted_join

    li = ensure_min_partitions(_t(spark, sf_dir, "lineitem"))
    left = li.select(
        F.when(F.col("l_orderkey") % 10 < 6, F.lit(1).cast("bigint"))
        .otherwise((F.col("l_orderkey") % 1000).cast("bigint"))
        .alias("k"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("rev"),
    )
    dim = (
        _t(spark, sf_dir, "orders")
        .select((F.col("o_orderkey") % 1000).cast("bigint").alias("k"))
        .distinct()
        .withColumn("grp", (F.col("k") % 7).cast("int"))
    )
    j = salted_join(left, dim, "k", salt=16)
    return (
        j.groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("rev").alias("revenue"))
        .orderBy("grp")
    )


@query(
    "rolling_7d_revenue",
    oracle="""
    SELECT user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                PARTITION BY user_id ORDER BY epoch(ts)
                RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                AS DECIMAL(18,4)) AS rev_7d
    FROM events
    WHERE event_type = 'purchase' AND user_id < 10
    ORDER BY user_id, ts
    """,
    description="Rolling 7-day revenue per user: RANGE window frame over "
    "epoch seconds (time-based, not row-based — peers at the same "
    "timestamp aggregate together). One shuffle on user_id; the frame "
    "scan is linear per partition.",
)
def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 10)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-604800, 0)
    )
    return (
        e.select(
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(w)
            .cast("decimal(18,4)")
            .alias("rev_7d"),
        )
        .orderBy("user_id", "ts")
    )


@query(
    "pii_scrub_docs",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\d{6,}')) AS INT) AS n_nums,
           md5(regexp_replace(regexp_replace(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                '\\d{6,}', '<NUM>', 'g')) AS scrub_md5
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
    description="PII scrubbing for training corpora: redact email-shaped "
    "and long-digit substrings (map-only regexp pass under codegen) with "
    "audit counts; md5 of the scrubbed text proves byte-identical "
    "redaction against the oracle.",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.text import pii_counts, scrub_pii

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    n_em, n_num = pii_counts("text")
    return d.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_num.alias("n_nums"),
        F.md5(scrub_pii("text")).alias("scrub_md5"),
    ).orderBy("doc_id")


@query(
    "full_outer_reconciliation",
    oracle="""
    WITH oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT CAST(SUM(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cust_only,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_only
    FROM customer FULL OUTER JOIN oc ON c_custkey = o_custkey
    """,
    description="Full-outer reconciliation: customers vs order-holders, "
    "counting matched / left-only / right-only in one pass — the "
    "data-audit join shape (aggregate the fact side FIRST so the outer "
    "join is key-to-key, never key-to-many).",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    oc = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = c.join(oc, c.c_custkey == oc.o_custkey, "full_outer")
    return j.agg(
        F.sum(
            (F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull()).cast("long")
        ).alias("n_both"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_cust_only"),
        F.sum(F.col("c_custkey").isNull().cast("long")).alias("n_orders_only"),
    )


# ----------------------------------------------- TPC-H decorrelation shapes

@query(
    "tpch_q13ish",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13 shape: order-count distribution including "
    "zero-order customers — left outer join then a double aggregation "
    "(per-customer count, then histogram). COUNT(col) null-skipping "
    "makes the unmatched side count as 0.",
)
def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q17ish",
    oracle="""
    WITH pa AS (SELECT l_partkey, 0.2 * AVG(l_quantity) AS thr
                FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS small_lot_revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#11' AND l_quantity < thr
    """,
    description="TPC-H Q17 shape: correlated per-part average decorrelated "
    "into an aggregate-then-join — the per-part threshold table is "
    "vocabulary-sized and joins back into the fact scan.",
)
def q_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    thr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("thr")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == thr.pk)
        .filter(F.col("l_quantity") < F.col("thr"))
    )
    return j.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("small_lot_revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "tpch_q22ish",
    oracle="""
    WITH avg_bal AS (SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
    SELECT substr(c_name, 10, 2) AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode ORDER BY cntrycode
    """,
    description="TPC-H Q22 shape: scalar-subquery threshold (global avg "
    "balance joins in as a broadcast scalar) + NOT EXISTS decorrelated "
    "to a left-anti join, grouped by a substring-derived code.",
)
def q_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "tpch_q11ish",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
      FROM lineitem GROUP BY l_partkey),
    thr AS (SELECT SUM(total) * 0.0005 AS cut FROM per_part)
    SELECT l_partkey, total FROM per_part, thr
    WHERE total > cut ORDER BY total DESC, l_partkey LIMIT 50
    """,
    description="TPC-H Q11 shape: HAVING against a global-scalar fraction "
    "— per-key totals computed once, the grand-total threshold joins "
    "back as a broadcast scalar (the aggregate is NOT recomputed).",
)
def q_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("total")
    )
    thr = per_part.agg((F.sum("total") * F.lit(0.0005)).alias("cut"))
    return (
        per_part.crossJoin(F.broadcast(thr))
        .filter(F.col("total") > F.col("cut"))
        .select("l_partkey", "total")
        .orderBy(F.col("total").desc(), F.col("l_partkey").asc())
        .limit(50)
    )


# ---------------------------------------------------------------- variant

@query(
    "variant_props_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Semi-structured VARIANT type (Spark 4): props parsed "
    "once to the binary variant encoding, fields extracted with typed "
    "variant_get — the schema-on-read path that replaces per-query JSON "
    "string re-parsing (parse once, extract many).",
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    return (
        v.select("event_type", F.variant_get("v", "$.k", "bigint").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ collect_set / histogram

@query(
    "collect_set_statuses",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="Set-valued aggregation: collect_set gathers distinct "
    "statuses per group (bounded-cardinality state per key); emitted "
    "sorted+joined so the result is deterministic and oracle-comparable.",
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "histogram_order_totals",
    oracle="""
    WITH b AS (SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                           WHEN o_totalprice >= 600000.0 THEN 13
                           ELSE CAST(floor(o_totalprice / 50000.0) AS INT) + 1
                      END AS bucket
               FROM orders)
    SELECT bucket, COUNT(*) AS n
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    description="Equal-width histogram via width_bucket: fixed bucket "
    "edges make this a map-only binning expression + tiny grouped count "
    "— the scale-safe histogram (contrast ntile, which needs a global "
    "sort).",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12))
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# ----------------------------------------------- TPC-H suite completion
# The fixture schema has no partsupp table and no ship-mode/commit/receipt
# dates, so each remaining TPC-H query is adapted to the available columns
# while preserving its canonical PLAN SHAPE (the thing that matters for the
# engine): role-playing dims, argmin-per-group, disjunctive pushdown,
# exists/not-exists decorrelation, scalar-subquery thresholds.


@query(
    "tpch_q2ish",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    mn AS (SELECT l_partkey AS pk, MIN(supply_cost) AS min_cost
           FROM ps GROUP BY l_partkey)
    SELECT p_partkey, s_name, n_name, supply_cost
    FROM ps
    JOIN mn ON ps.l_partkey = mn.pk AND ps.supply_cost = mn.min_cost
    JOIN part ON p_partkey = ps.l_partkey
    JOIN supplier ON s_suppkey = ps.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size = 15 AND p_type = 'LARGE'
    ORDER BY supply_cost DESC, p_partkey, s_name LIMIT 100
    """,
    description="TPC-H Q2 shape (partsupp-free): cheapest supplier per "
    "part — the correlated MIN subquery decorrelated into an "
    "aggregate-then-self-join on (key, min_value). Both aggregates hash "
    "on l_partkey so the second reuses the first's shuffle partitioning; "
    "the selective part filter broadcasts.",
)
def q_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("supply_cost")
    )
    mn = ps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        ps.join(mn, (ps.l_partkey == mn.pk) & (ps.supply_cost == mn.min_cost))
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)  # supplier scales with SF: shuffle/AQE
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.select("p_partkey", "s_name", "n_name", "supply_cost")
        .orderBy(F.col("supply_cost").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "tpch_q7ish",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DECIMAL(18,4)) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 shape: the nation dim plays two roles (supplier "
    "nation and customer nation) via two aliased broadcast joins; the "
    "cross-pair predicate keeps both directions. The only shuffles are "
    "the fact-fact joins (lineitem-orders on orderkey) and the final "
    "3-key aggregation.",
)
def q_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("decimal(18,4)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8ish",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS mkt_num,
           CAST(SUM(volume) AS DECIMAL(18,4)) AS mkt_den
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) allnations
    GROUP BY o_year ORDER BY o_year
    """,
    description="TPC-H Q8 shape: market share per year as conditional-sum "
    "numerator over total denominator in ONE aggregation pass (no second "
    "scan for the denominator). Emits num/den separately — the ratio of "
    "two decimals is engine-specific rounding, the components are exact. "
    "7-way join: all dims broadcast, facts shuffle on their keys.",
)
def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("n1_key")
    )
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        j.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero))
            .cast("decimal(18,4)")
            .alias("mkt_num"),
            F.sum("volume").cast("decimal(18,4)").alias("mkt_den"),
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9ish",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.1 * l_quantity * p_retailprice AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS profit
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    bench=True,
    description="TPC-H Q9 shape (partsupp-free): profit = revenue minus a "
    "retail-price-proportional cost, by supplier nation x ship year, with "
    "a LIKE filter on part name. The LIKE prunes part BEFORE the join "
    "(broadcast); profit arithmetic stays in doubles per-row (identical "
    "IEEE order both engines), cast to decimal only for the exact sum.",
)
def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("l_quantity") * F.col("p_retailprice")
    ).cast("decimal(18,4)")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("decimal(18,4)").alias("profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@query(
    "tpch_q12ish",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    description="TPC-H Q12 shape (shipmode-free): late lines (shipped >60 "
    "days after order) classified into high/low priority counts by "
    "conditional aggregation — one join, one pass, two CASE sums instead "
    "of two filtered scans. The interval predicate is a non-equi "
    "post-join filter evaluated inside codegen.",
)
def q_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = o.join(li, o.o_orderkey == li.l_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q14ish",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    description="TPC-H Q14 shape: promo revenue share for one month — "
    "date-range filter pushed to the lineitem scan, part broadcast, "
    "numerator/denominator in one conditional-aggregation pass (ratio "
    "left to the caller; components are exact decimals).",
)
def q_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
        .cast("decimal(18,4)")
        .alias("promo_revenue"),
        F.sum(rev).cast("decimal(18,4)").alias("total_revenue"),
    )


@query(
    "tpch_q15ish",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DECIMAL(18,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey),
    mx AS (SELECT MAX(total_revenue) AS m FROM rev)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no CROSS JOIN mx
    WHERE total_revenue = m ORDER BY s_suppkey
    """,
    description="TPC-H Q15 shape: top revenue supplier for a quarter — "
    "the view + scalar-MAX subquery decorrelated to an aggregate whose "
    "single-row result broadcasts back as a cross join (no global sort, "
    "no second aggregation of lineitem). Ties all surface, matching the "
    "spec's = MAX semantics.",
)
def q_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16ish",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100
    """,
    description="TPC-H Q16 shape (partsupp-free): distinct-supplier count "
    "per part attribute triple, excluding flagged suppliers — the NOT IN "
    "becomes a left-anti join (keys are non-null so the semantics are "
    "identical), the IN-list and <> prune part before its broadcast, and "
    "COUNT(DISTINCT) runs as a two-phase expand aggregate.",
)
def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        bad, li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@query(
    "tpch_q19ish",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    description="TPC-H Q19 shape: three disjunctive brand/size/quantity "
    "branches over an equi-join. The part-only sub-predicates (brand OR "
    "brand OR brand, size <= 15) are inferable and prune the broadcast "
    "side; the mixed residual evaluates post-join in codegen — the "
    "classic test that OR branches don't force a cartesian fallback.",
)
def q_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    # pre-prune the broadcast side with the part-only envelope of the OR
    p = p.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & (F.col("p_size") <= 15)
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(cond)
    return j.agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "tpch_q20ish",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey)
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 50.0)
    ORDER BY s_name
    """,
    description="TPC-H Q20 shape (partsupp-free): suppliers that shipped "
    ">50 units of small-named parts in 1996 — the nested IN chain "
    "becomes filter -> aggregate -> HAVING -> left-semi join into the "
    "supplier dim. The semi join ships only the distinct qualifying "
    "keys, never the fact rows.",
)
def q_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "tpch_q21ish",
    oracle="""
    WITH om AS (
      SELECT l_orderkey AS ok, MAX(l_shipdate) AS max_ship,
             COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem
    JOIN om ON l_orderkey = om.ok
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE o_orderstatus = 'F' AND n_supp > 1 AND l_shipdate = max_ship
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    description="TPC-H Q21 shape (receiptdate-free): the last-to-ship "
    "supplier on finished multi-supplier orders. EXISTS (another "
    "supplier) and NOT EXISTS (anyone later) decorrelate into ONE "
    "per-order aggregate (max shipdate + distinct-supplier count) that "
    "joins back to lineitem on the same key its shuffle already hashed "
    "on — two correlated subqueries for the price of one shuffle.",
)
def q_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    om = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    j = (
        li.join(om, li.l_orderkey == om.ok)
        .filter((F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
    )
    return (
        j.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ------------------------------------------------- sketch / approx aggregates
# Approximate aggregates are engine-specific (Spark HLL++/KLL vs DuckDB
# HLL/t-digest), so raw estimates can never hash-match an oracle. Each
# query therefore emits the EXACT value plus a boolean asserting its own
# engine's estimate lands within the documented error bound — both sides
# compute their approximation independently and both must certify it.


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           CAST(abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
                <= 0.05 * COUNT(DISTINCT user_id) AS BOOLEAN) AS approx_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="approx_count_distinct (HLL++, rsd=2%) beside the exact "
    "distinct count, certified within 5%. At scale the approx variant "
    "needs no expand/two-phase distinct shuffle — fixed 1.5 KB of state "
    "per group vs a hash set of every user_id.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", 0.02).alias("est"),
        )
        .select(
            "event_type",
            "n_exact",
            (F.abs(F.col("est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
                "approx_ok"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "approx_quantiles_orders",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(abs(approx_quantile(o_totalprice, 0.5)
                    - quantile_cont(o_totalprice, 0.5))
                <= 0.03 * quantile_cont(o_totalprice, 0.5) AS BOOLEAN) AS p50_ok,
           CAST(abs(approx_quantile(o_totalprice, 0.99)
                    - quantile_cont(o_totalprice, 0.99))
                <= 0.03 * quantile_cont(o_totalprice, 0.99) AS BOOLEAN) AS p99_ok
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="percentile_approx (KLL-style quantile summary, accuracy "
    "10000) certified within 3% of the exact interpolated quantile per "
    "group. The approx sketch is mergeable across partitions — the only "
    "quantile that works in one pass over unsorted 100 TB data.",
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.expr("percentile(o_totalprice, 0.5)").alias("x50"),
        F.expr("percentile(o_totalprice, 0.99)").alias("x99"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("a50"),
        F.expr("percentile_approx(o_totalprice, 0.99, 10000)").alias("a99"),
    )
    return g.select(
        "o_orderpriority",
        "n",
        (F.abs(F.col("a50") - F.col("x50")) <= 0.03 * F.col("x50")).alias("p50_ok"),
        (F.abs(F.col("a99") - F.col("x99")) <= 0.03 * F.col("x99")).alias("p99_ok"),
    ).orderBy("o_orderpriority")


@query(
    "hll_sketch_rollup_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS sketch_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    bench=True,
    description="Mergeable-sketch rollup (the 100 TB distinct-count "
    "pattern): per-(type, day) partial HLL sketches via hll_sketch_agg, "
    "merged up with hll_union_agg, estimate certified within 5% of "
    "exact. Partials can be persisted per partition/day and re-merged "
    "for any rollup grain without rescanning raw data — DuckDB's HLL is "
    "not binary-compatible, so the oracle certifies its own exact side.",
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "n_exact",
            (F.abs(F.col("est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
                "sketch_ok"
            ),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- repetition / corpus filtering

_PTOKS_SQL = (
    "list_slice(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END, 1, 512)"
)
_BIGRAMS_SQL = (
    "CASE WHEN len(pt) < 2 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(generate_series(1, len(pt)-1), "
    "i -> pt[i] || ' ' || pt[i+1]) END"
)
_DUP_RATIO_SQL = (
    "CASE WHEN len(bg) = 0 THEN 0.0 ELSE 1.0 - "
    "CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE) END"
)
# sort + longest-equal-run, mirroring operators/text.top_word_ratio:
# `sl`/`starts` are threaded through the CTE chain (run starts = indices
# where the sorted list changes value; run lengths = start deltas)
_SORTED_SQL = "list_sort(pt)"
_STARTS_SQL = (
    "list_filter(generate_series(1, len(sl)), "
    "i -> i = 1 OR sl[greatest(i-1, 1)] != sl[i])"
)
_TOP_RATIO_SQL = (
    "CASE WHEN len(pt) = 0 THEN 0.0 ELSE "
    "CAST(list_max(list_transform(generate_series(1, len(starts)), "
    "j -> (CASE WHEN j < len(starts) THEN starts[j+1] "
    "ELSE len(sl)+1 END) - starts[j])) AS DOUBLE) "
    "/ CAST(len(pt) AS DOUBLE) END"
)


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_PTOKS_SQL} AS pt FROM documents),
    b AS (SELECT doc_id, pt, {_BIGRAMS_SQL} AS bg, {_SORTED_SQL} AS sl FROM t),
    r AS (SELECT *, {_STARTS_SQL} AS starts FROM b)
    SELECT doc_id,
           CAST(len(bg) AS INT) AS n_bigrams,
           {_DUP_RATIO_SQL} AS dup_bigram_ratio,
           {_TOP_RATIO_SQL} AS top_word_ratio
    FROM r ORDER BY doc_id
    """,
    description="Gopher-style repetition signals: duplicate-bigram "
    "fraction and most-frequent-word dominance, computed on a bounded "
    "512-token prefix so one pathological document cannot stall its "
    "scan task. Map-only higher-order functions, zero shuffle.",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T.repetition_signals(_td(spark, sf_dir), n_bigrams_col="n_bigrams")
    return d.select(
        "doc_id", "n_bigrams", "dup_bigram_ratio", "top_word_ratio"
    ).orderBy("doc_id")


@query(
    "training_corpus_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, {_PTOKS_SQL} AS pt,
             CAST(len({_TOKS_SQL}) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chr,
             CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE) AS punct
      FROM documents),
    b AS (SELECT *, {_BIGRAMS_SQL} AS bg, {_SORTED_SQL} AS sl FROM t),
    r AS (SELECT *, {_STARTS_SQL} AS starts FROM b),
    m AS (
      SELECT lang, source, n_tok,
             ROUND(least(n_tok / 64.0, 1.0) * 0.5
               + (CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE n_chr / n_tok END)
                       BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.3
               + (1.0 - (CASE WHEN n_chr = 0 THEN 0.0
                         ELSE least(punct / n_chr * 4.0, 1.0) END)) * 0.2,
               6) AS quality,
             {_DUP_RATIO_SQL} AS dup_ratio,
             {_TOP_RATIO_SQL} AS top_ratio
      FROM r)
    SELECT lang, source, COUNT(*) AS n_kept
    FROM m
    WHERE quality >= 0.5 AND dup_ratio <= 0.06 AND top_ratio <= 0.13
      AND n_tok >= 5
    GROUP BY lang, source ORDER BY lang, source
    """,
    bench=True,
    description="Combined corpus curation gate (the C4/Gopher filter "
    "chain): length + quality score + repetition thresholds in ONE "
    "map-only pass over the corpus, then a tiny grouped count of "
    "survivors per (lang, source). At 100 TB this is the shape that "
    "matters: every signal rides the same scan, nothing is "
    "re-tokenized, and the only shuffle carries (lang, source) pairs.",
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T.repetition_signals(_td(spark, sf_dir))
    keep = (
        (T.quality_score("text") >= 0.5)
        & (F.col("dup_bigram_ratio") <= 0.06)
        & (F.col("top_word_ratio") <= 0.13)
        & (T.token_count("text") >= 5)
    )
    # The gate rides as a COLUMN into a conditional aggregate instead of
    # a .filter(): predicate pushdown would substitute the staged signal
    # columns back into one scan-level predicate, undoing
    # repetition_signals' once-per-row materialization (measured 80x
    # slower). HAVING n_kept > 0 restores exact filter-then-count
    # semantics.
    return (
        d.withColumn("_keep", keep)
        .groupBy("lang", "source")
        .agg(F.sum(F.col("_keep").cast("long")).alias("n_kept"))
        .filter(F.col("n_kept") > 0)
        .orderBy("lang", "source")
    )


# ------------------------------------------------- embedding quantization

@query(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               / 127.0 AS q_scale
      FROM embeddings),
    q AS (
      SELECT vec_id, embedding, q_scale,
             CASE WHEN q_scale = 0.0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) / q_scale + 0.5) AS INT))
             END AS codes
      FROM s),
    e AS (
      SELECT vec_id, q_scale,
             md5(array_to_string(codes, ',')) AS codes_md5,
             list_max(list_transform(generate_series(1, len(codes)),
               i -> abs(CAST(codes[i] AS DOUBLE) * q_scale
                        - CAST(embedding[i] AS DOUBLE)))) AS max_err
      FROM q)
    SELECT vec_id, codes_md5,
           CAST(max_err <= q_scale / 2.0 + 1e-12 AS BOOLEAN) AS err_ok
    FROM e ORDER BY vec_id
    """,
    description="Symmetric int8 embedding quantization (4x memory for "
    "ANN candidate scans): scale = max|v|/127, floor-based rounder "
    "(bit-reproducible across engines, unlike round()'s tie handling). "
    "The md5 over the code array proves byte-identical quantization vs "
    "the oracle; err_ok certifies the scale/2 reconstruction bound. "
    "Map-only, zero shuffle.",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.functions.vectors import with_quantized_embedding

    e = _t(spark, sf_dir, "embeddings")
    q = with_quantized_embedding(e)
    err = F.array_max(
        F.zip_with(
            F.col("q_codes"),
            F.col("embedding"),
            lambda c, v: F.abs(c.cast("double") * F.col("q_scale") - v.cast("double")),
        )
    )
    return q.select(
        "vec_id",
        F.md5(F.concat_ws(",", F.transform(F.col("q_codes"), lambda c: c.cast("string")))).alias(
            "codes_md5"
        ),
        (err <= F.col("q_scale") / 2.0 + 1e-12).alias("err_ok"),
    ).orderBy("vec_id")


@query(
    "cogroup_order_reconcile",
    oracle="""
    WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 2000),
    l AS (SELECT l_orderkey,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem WHERE l_orderkey < 2000),
    la AS (SELECT l_orderkey, COUNT(*) AS n_lines,
                  CAST(SUM(cents) AS BIGINT) AS line_cents
           FROM l GROUP BY l_orderkey)
    SELECT COALESCE(o.o_orderkey, la.l_orderkey) AS o_orderkey,
           COALESCE(n_lines, 0) AS n_lines,
           COALESCE(line_cents, 0) AS line_cents,
           o.o_orderkey IS NOT NULL AS has_order_row
    FROM o FULL OUTER JOIN la ON o.o_orderkey = la.l_orderkey
    ORDER BY o_orderkey
    """,
    description="cogroup().applyInPandas: both sides of each order key "
    "arrive as pandas frames in one call (per-entity reconciliation "
    "without join-then-regroup). Sums are integer cents so the pandas "
    "path is exact and row-order-independent; the oracle is the "
    "equivalent aggregate + full-outer join.",
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.normalize import cogrouped_order_reconcile

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return cogrouped_order_reconcile(o, li).orderBy("o_orderkey")


# ------------------------------------------------- corpus curation (extensions)

_WORDS_SQL = f"string_split({_NORM_SQL}, ' ')"


@query(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH docs AS (SELECT doc_id, source, {_WORDS_SQL} AS w FROM documents),
    grams AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               generate_series(0, greatest(len(w) - 8, 0)),
               i -> array_to_string(w[i + 1 : i + 8], ' ')))) AS ngram
      FROM docs),
    ev AS (SELECT DISTINCT ngram FROM grams WHERE source = 'src0'),
    hits AS (
      SELECT g.doc_id, COUNT(*) AS overlap_ngrams
      FROM grams g JOIN ev USING (ngram)
      WHERE g.source <> 'src0'
      GROUP BY g.doc_id)
    SELECT d.doc_id,
           COALESCE(h.overlap_ngrams, 0) AS overlap_ngrams,
           COALESCE(h.overlap_ngrams, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
    LEFT JOIN hits h USING (doc_id)
    """,
    description="Benchmark decontamination: per-train-doc count of distinct "
    "word 8-grams shared with the eval shard (source=src0); eval n-gram "
    "set broadcast, corpus never shuffled.",
    bench=True,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import contamination_overlap

    docs = _td(spark, sf_dir)
    return contamination_overlap(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )


@query(
    "decontaminate_spans_docs",
    oracle=f"""
    WITH docs AS (SELECT doc_id, source, {_WORDS_SQL} AS w FROM documents),
    ev AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               generate_series(0, greatest(len(w) - 8, 0)),
               i -> array_to_string(w[i + 1 : i + 8], ' ')))) AS ngram
      FROM docs WHERE source = 'src0'),
    train AS (SELECT doc_id, w FROM docs WHERE source <> 'src0'),
    tg AS (
      SELECT doc_id, CAST(t.i AS INT) AS pos,
             array_to_string(w[t.i + 1 : t.i + 8], ' ') AS ngram
      FROM train, unnest(generate_series(0, greatest(len(w) - 8, 0))) AS t(i)),
    hits AS (SELECT DISTINCT tg.doc_id, tg.pos FROM tg JOIN ev USING (ngram)),
    cov AS (
      SELECT doc_id,
             list_distinct(flatten(list(generate_series(pos, pos + 7)))) AS covered
      FROM hits GROUP BY doc_id),
    cleaned AS (
      SELECT t.doc_id,
             list_transform(
               list_filter(generate_series(1, len(t.w)),
                           i -> NOT list_contains(coalesce(c.covered,
                                CAST([] AS BIGINT[])), i - 1)),
               i -> t.w[i]) AS kept,
             len(t.w) AS n_words
      FROM train t LEFT JOIN cov c USING (doc_id))
    SELECT doc_id,
           coalesce(array_to_string(kept, ' '), '') AS cleaned_text,
           CAST(len(kept) AS INT) AS n_words_kept,
           CAST(n_words - len(kept) AS INT) AS n_words_removed
    FROM cleaned ORDER BY doc_id
    """,
    description="Sequence-level decontamination: words covered by any "
    "8-gram shared with the eval shard (source=src0) are REMOVED and the "
    "remainder reassembled — contaminated-span removal rather than "
    "whole-document flagging, the production decontamination behavior. "
    "Eval n-gram set broadcast, hit positions (tiny) joined back, span "
    "coverage + reassembly in-row HOFs; the corpus never shuffles "
    "(operators/curation.py:decontaminate_spans).",
)
def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import decontaminate_spans

    docs = _td(spark, sf_dir)
    out = decontaminate_spans(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )
    return out.orderBy("doc_id")


@query(
    "dedup_duplicate_spans_docs",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
    tg AS (
      SELECT doc_id, CAST(t.i AS INT) AS pos,
             array_to_string(w[t.i + 1 : t.i + 8], ' ') AS ngram
      FROM docs, unnest(generate_series(0, greatest(len(w) - 8, 0))) AS t(i)),
    dup AS (
      SELECT ngram FROM tg GROUP BY ngram
      HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT tg.doc_id, tg.pos FROM tg JOIN dup USING (ngram)),
    cov AS (
      SELECT doc_id,
             list_distinct(flatten(list(generate_series(pos, pos + 7)))) AS covered
      FROM hits GROUP BY doc_id),
    cleaned AS (
      SELECT d.doc_id,
             list_transform(
               list_filter(generate_series(1, len(d.w)),
                           i -> NOT list_contains(coalesce(c.covered,
                                CAST([] AS BIGINT[])), i - 1)),
               i -> d.w[i]) AS kept,
             len(d.w) AS n_words
      FROM docs d LEFT JOIN cov c USING (doc_id))
    SELECT doc_id,
           coalesce(array_to_string(kept, ' '), '') AS cleaned_text,
           CAST(len(kept) AS INT) AS n_words_kept,
           CAST(n_words - len(kept) AS INT) AS n_words_removed
    FROM cleaned ORDER BY doc_id
    """,
    description="Corpus-wide exact-substring dedup (Lee et al. 2022 "
    "ExactSubstr at 8-gram resolution, "
    "operators/curation.py:remove_duplicate_spans): every word covered "
    "by an 8-gram occurring in >=2 distinct documents is removed and "
    "the remainder reassembled — the sliding-window generalization of "
    "segment-level boilerplate removal (a duplicated span straddling a "
    "segment boundary cannot escape). One gram-keyed frequency "
    "aggregation, duplicated subset joined back, coverage + reassembly "
    "in-row HOFs; corpus rows never shuffle. Oracle replays the "
    "identical pipeline in SQL.",
    bench=True,
)
def q_dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import remove_duplicate_spans

    return remove_duplicate_spans(_td(spark, sf_dir), k=8).orderBy("doc_id")


@query(
    "pack_sequences_budget",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({_WORDS_SQL}) AS n_tokens FROM documents),
    packed AS (
      SELECT source,
             CAST(floor(
               COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 512.0) AS INT) AS seq_id,
             n_tokens
      FROM t)
    SELECT source, seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM packed GROUP BY source, seq_id ORDER BY source, seq_id
    """,
    description="Token-budget sequence packing by contiguous fill, per "
    "source shard (seq_id = floor(exclusive prefix tokens / 512)); window "
    "shuffles by shard key, never one partition.",
    bench=True,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import pack_token_budget

    docs = _td(spark, sf_dir)
    packed = pack_token_budget(docs, budget=512, shard_col="source", order_cols=("doc_id",))
    return (
        packed.groupBy("source", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("seq_tokens"))
        .orderBy("source", "seq_id")
    )


@query(
    "pack_curriculum_quality",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({_WORDS_SQL}) AS n_tokens,
             {_QUALITY_SQL} AS q
      FROM documents),
    packed AS (
      SELECT source, q,
             CAST(floor(
               COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY q DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 512.0) AS INT) AS seq_id,
             n_tokens
      FROM t)
    SELECT source, seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           ROUND(MIN(q), 6) AS q_min, ROUND(MAX(q), 6) AS q_max
    FROM packed GROUP BY source, seq_id ORDER BY source, seq_id
    """,
    description="Curriculum-ordered packing: within each shard the "
    "contiguous token-budget fill runs highest-quality-first (order by "
    "quality desc via a negated sort column), so early training "
    "sequences hold the best documents — the curriculum-learning "
    "ordering knob on the same one-shuffle-per-shard packer. MIN/MAX "
    "quality per sequence (order-independent aggregates) prove the "
    "ordering end-to-end.",
)
def q_pack_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import pack_token_budget

    docs = _td(spark, sf_dir).withColumn("q", T.quality_score("text"))
    d2 = docs.withColumn("negq", -F.col("q"))
    packed = pack_token_budget(
        d2, budget=512, shard_col="source", order_cols=("negq", "doc_id")
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.round(F.min("q"), 6).alias("q_min"),
            F.round(F.max("q"), 6).alias("q_max"),
        )
        .orderBy("source", "seq_id")
    )


@query(
    "mad_outliers_events",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - med), 0.5) AS mad,
             ANY_VALUE(med) AS med,
             COUNT(*) AS n
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type)
    SELECT e.event_type,
           ANY_VALUE(n) AS n,
           COUNT(*) FILTER (WHERE abs(e.value - med) > 3.0 * mad) AS n_outliers,
           ROUND(ANY_VALUE(med), 4) AS med,
           ROUND(ANY_VALUE(mad), 4) AS mad
    FROM events e JOIN mad USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    description="Robust per-group outlier stats via median absolute "
    "deviation (|x - med| > 3*MAD); stats broadcast back, input only "
    "scanned. Scale path swaps exact percentile for percentile_approx.",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.normalize import mad_outlier_stats

    ev = _t(spark, sf_dir, "events")
    return mad_outlier_stats(ev, keys=["event_type"], value_col="value", k=3.0).orderBy(
        "event_type"
    )


@query(
    "scd2_order_status",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus AS status, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    ch AS (SELECT o_custkey, status, o_orderdate, o_orderkey
           FROM h WHERE prev IS NULL OR prev <> status)
    SELECT o_custkey, status,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM ch
    """,
    description="SCD type-2 history build from an event log: change-point "
    "filter between lag and lead windows sharing one shuffle; intervals "
    "stamped valid_from/valid_to/is_current.",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.windows import scd2_intervals

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderstatus").alias("status"), "o_orderdate", "o_orderkey"
    )
    return scd2_intervals(
        o,
        key_cols=["o_custkey"],
        attr_col="status",
        order_cols=["o_orderdate", "o_orderkey"],
    ).select("o_custkey", "status", "valid_from", "valid_to", "is_current")


@query(
    "dup_cluster_size_hist",
    oracle=f"""
    WITH g AS (SELECT md5({_NORM_SQL}) AS h, COUNT(*) AS c
               FROM documents GROUP BY 1)
    SELECT c AS cluster_size, COUNT(*) AS n_clusters
    FROM g GROUP BY c ORDER BY c
    """,
    description="Duplicate-cluster size histogram over exact content "
    "hashes — the dedup-audit summary (how much of the corpus is "
    "duplicated, at what multiplicity); shuffles 16-byte digests only.",
)
def q_dup_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    clusters = docs.groupBy(F.md5(normalized_text("text")).alias("h")).agg(
        F.count("*").alias("cluster_size")
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )


_PROFILE_COL_SQL = """
    SELECT '{name}' AS "column",
           COUNT(*) FILTER (WHERE {c} IS NULL) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {mn} AS min_value,
           {mx} AS max_value
    FROM customer
"""


def _profile_sql(cols: dict[str, bool]) -> str:
    parts = []
    for c, numeric in cols.items():
        if numeric:
            mn = f"CAST(CAST(MIN({c}) AS DECIMAL(18,2)) AS VARCHAR)"
            mx = f"CAST(CAST(MAX({c}) AS DECIMAL(18,2)) AS VARCHAR)"
        else:
            mn, mx = f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"
        parts.append(_PROFILE_COL_SQL.format(name=c, c=c, mn=mn, mx=mx))
    return " UNION ALL ".join(parts)


@query(
    "profile_customer",
    oracle=_profile_sql(
        {
            "c_custkey": True,
            "c_name": False,
            "c_nationkey": True,
            "c_acctbal": True,
            "c_mktsegment": False,
        }
    ),
    description="One-pass per-column profiling (null count, cardinality, "
    "min/max as uniform decimal-formatted strings): all metrics for all "
    "columns in ONE agg + stack unpivot — one scan regardless of column "
    "count; the oracle is the per-column UNION ALL equivalent.",
)
def q_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.profile import profile_columns

    return profile_columns(_t(spark, sf_dir, "customer"))


@query(
    "domain_rebalance_weights",
    oracle=f"""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_WORDS_SQL})) AS BIGINT) AS tokens
      FROM documents GROUP BY source)
    SELECT source, n_docs, tokens,
           ROUND(CAST(tokens AS DOUBLE) / CAST(SUM(tokens) OVER () AS DOUBLE), 6)
             AS token_share,
           ROUND(LEAST(
             (1.0 / CAST(COUNT(*) OVER () AS DOUBLE))
               / (CAST(tokens AS DOUBLE) / CAST(SUM(tokens) OVER () AS DOUBLE)),
             5.0), 4) AS weight
    FROM per
    """,
    description="Per-domain sampling weights toward a uniform token mix "
    "(clamped upsample factor); corpus scanned once, window totals only "
    "over the #domains-row aggregate.",
)
def q_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import domain_rebalance_weights

    return domain_rebalance_weights(_td(spark, sf_dir))


@query(
    "weighted_sample_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_WORDS_SQL}) AS DOUBLE) AS w,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
      FROM documents)
    SELECT doc_id, ROUND(pow(u, 1.0 / w), 10) AS priority
    FROM t ORDER BY priority DESC, doc_id LIMIT 25
    """,
    description="Deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis A-ES, md5-derived uniforms): token-weighted "
    "top-k via TakeOrderedAndProject — per-partition top-k + driver "
    "merge, no global sort.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import weighted_sample_topk

    return weighted_sample_topk(_t(spark, sf_dir, "documents"), k=25)


@query(
    "incremental_dedup_batch",
    oracle=f"""
    WITH seen AS (SELECT DISTINCT md5({_NORM_SQL}) AS h
                  FROM documents WHERE doc_id < 250),
    b AS (SELECT doc_id, source, md5({_NORM_SQL}) AS h
          FROM documents WHERE doc_id >= 250),
    fresh AS (SELECT b.* FROM b ANTI JOIN seen USING (h)),
    k AS (SELECT h, MIN(doc_id) AS doc_id FROM fresh GROUP BY h)
    SELECT f.doc_id, f.source FROM fresh f JOIN k USING (doc_id, h)
    """,
    description="Incremental ingest dedup: new batch anti-joined against "
    "the already-ingested digest index (16-byte hashes), then first-within-batch; "
    "steady-state cost = scan batch + hash-index join, corpus never re-read.",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    return incremental_dedup(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    ).select("doc_id", "source")


@query(
    "orc_roundtrip_gold",
    oracle=f"""
    {CRYPTO_SQL}
    SELECT symbol,
           MIN(price) AS min_value_by_crypto,
           MAX(price) AS max_value_by_crypto
    FROM crypto GROUP BY symbol
    """,
    description="Gold aggregate written to ORC and read back (columnar "
    "alternative to parquet, built into Spark; decimal schema survives "
    "the roundtrip).",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    gold = grouped_min_max(
        crypto_view(spark, sf_dir),
        keys=["symbol"],
        value="price",
        min_alias="min_value_by_crypto",
        max_alias="max_value_by_crypto",
    )
    path = tempfile.mkdtemp(prefix="orc_gold_") + "/gold"
    gold.write.mode("overwrite").orc(path)
    return spark.read.orc(path).select(
        "symbol", "min_value_by_crypto", "max_value_by_crypto"
    )


@query(
    "partitioned_events_pruned_day",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    GROUP BY event_type ORDER BY event_type
    """,
    description="K3/S6 medallion partitioned-layout roundtrip: events "
    "written Hive-partitioned by year/month/day (one file per partition "
    "via write-side repartition on the keys), read back with a "
    "single-day filter that prunes to one directory — the layout the "
    "reference's gold layer uses (silverToGold.scala:27); pruning is "
    "asserted in tests/test_plans_scale.py.",
)
def q_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.files import write_partitioned

    ev = _t(spark, sf_dir, "events").withColumns(
        {
            "year": F.year("ts"),
            "month": F.month("ts"),
            "day": F.dayofmonth("ts"),
        }
    )
    path = tempfile.mkdtemp(prefix="part_events_") + "/events"
    write_partitioned(
        ev.repartition("year", "month", "day"),
        path,
        partition_by=["year", "month", "day"],
        fmt="parquet",
    )
    back = spark.read.parquet(path).filter(
        (F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 15)
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


def _ewma_sql(alpha: float = 0.5, depth: int = 8) -> tuple[str, str]:
    """DuckDB numerator/denominator with the same term order as
    operators/windows.ewma_bounded (identical IEEE evaluation order)."""
    num, den = "0.0", "0.0"
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    for k in range(depth):
        wk = alpha * (1.0 - alpha) ** k
        lagged = f"lag(value, {k}) {over}"
        num = f"({num} + COALESCE({lagged} * {wk!r}, 0.0))"
        den = f"({den} + CASE WHEN {lagged} IS NOT NULL THEN {wk!r} ELSE 0.0 END)"
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_sql()


@query(
    "ewma_user_values",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(CASE WHEN {_EWMA_DEN} = 0.0 THEN NULL
                      ELSE {_EWMA_NUM} / {_EWMA_DEN} END, 6) AS ewma
    FROM events
    """,
    description="Bounded-depth exponentially-weighted moving average per "
    "user (alpha=0.5, 8 lags): pure lag arithmetic sharing one window "
    "shuffle — the numerically-safe form of EWMA (the recursive scaling "
    "variant overflows doubles on long partitions).",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.windows import ewma_bounded

    ev = _t(spark, sf_dir, "events")
    out = ewma_bounded(
        ev, partition_by=["user_id"], order_by=["ts", "event_id"], value="value"
    )
    return out.select("event_id", "user_id", F.round("ewma", 6).alias("ewma"))


@query(
    "mode_priority_by_status",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY 1, 2),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus
        ORDER BY n DESC, o_orderpriority DESC) AS rn
      FROM c)
    SELECT o_orderstatus, o_orderpriority AS mode, n
    FROM r WHERE rn = 1 ORDER BY o_orderstatus
    """,
    description="Deterministic mode (most frequent priority per status, "
    "ties broken by highest value): two hash aggregations + max-of-"
    "struct, no window over the fact table — unlike built-in mode(), "
    "reproducible and oracle-checkable.",
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import deterministic_mode

    o = _t(spark, sf_dir, "orders")
    return deterministic_mode(
        o, keys=["o_orderstatus"], value="o_orderpriority"
    ).orderBy("o_orderstatus")


@query(
    "word_entropy_docs",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
    c AS (SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
    t AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS INT) AS n_distinct
          FROM c GROUP BY 1)
    SELECT c.doc_id, ANY_VALUE(t.total) AS n_tokens,
           ANY_VALUE(t.n_distinct) AS n_distinct_words,
           ROUND(-SUM((CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total)), 6)
             AS entropy
    FROM c JOIN t USING (doc_id)
    GROUP BY c.doc_id
    """,
    description="Per-document word Shannon entropy (plus token/vocab "
    "counts) — the information-theoretic quality signal (low entropy = "
    "repetitive/template text). The math is doc-local, so the plan is "
    "MAP-ONLY: sorted-array run-length HOFs per row "
    "(operators/text.py:sorted_run_entropy), zero shuffles — vs the "
    "naive explode -> two shuffles -> join formulation, ~5x slower at "
    "sf0.1 and shuffle-bound at corpus scale.",
    bench=True,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.text import sorted_run_entropy

    docs = _td(spark, sf_dir)
    stats = sorted_run_entropy(F.split(normalized_text("text"), " "))
    # inline(array(struct)) evaluates the fold ONCE per row; plain
    # struct-field extraction lets projection collapse inline the whole
    # fold per extracted field (3x the work, measured).
    return docs.select("doc_id", F.inline(F.array(stats)))


@query(
    "regr_value_trend_by_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS BIGINT) AS n,
           ROUND(regr_slope(value,
             (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 6)
             AS slope_per_hour,
           ROUND(regr_intercept(value,
             (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0), 4)
             AS intercept
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Per-group least-squares trend (regr_slope/intercept of "
    "value vs hours since 2024-01-01): single-pass covariance "
    "aggregates, partial+final like any hash agg — no per-group "
    "collection. The regressor is centered near the data's origin on "
    "purpose: against raw epoch values the intercept extrapolates "
    "~473 k hours out and catastrophic cancellation amplifies "
    "engine-internal rounding differences past any tolerance.",
)
def q_regr_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    origin = F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
    x = (F.unix_timestamp("ts") - origin).cast("double") / F.lit(3600.0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope_per_hour"),
            F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------ statistical aggregate surface

@query(
    "corr_stats_events",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS BIGINT) AS n,
           ROUND(corr(value, CAST(date_part('hour', ts) AS DOUBLE)), 6) + 0.0
             AS corr_value_hour,
           ROUND(covar_samp(value, CAST(date_part('hour', ts) AS DOUBLE)), 4) + 0.0
             AS covar_value_hour,
           ROUND(stddev_samp(value), 4) AS stddev_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Pearson correlation / sample covariance / stddev of "
    "value vs hour-of-day per event type: all single-pass co-moment "
    "aggregates (partial+final), so the shuffle carries one small "
    "moment tuple per (partition, group) — no per-group collection at "
    "any scale.",
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour = F.hour("ts").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            (F.round(F.corr(F.col("value"), hour), 6) + F.lit(0.0)).alias(
                "corr_value_hour"
            ),
            (F.round(F.covar_samp(F.col("value"), hour), 4) + F.lit(0.0)).alias(
                "covar_value_hour"
            ),
            F.round(F.stddev_samp("value"), 4).alias("stddev_value"),
        )
        .orderBy("event_type")
    )


@query(
    "median_iqr_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(median(o_totalprice), 2) AS median_total,
           ROUND(quantile_cont(o_totalprice, 0.25), 2) AS q1_total,
           ROUND(quantile_cont(o_totalprice, 0.75), 2) AS q3_total
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="EXACT median + interquartile bounds per priority "
    "(linear-interpolated percentile, same semantics as DuckDB "
    "quantile_cont). Exact percentile buffers each group's values — "
    "fine for bounded group counts; the sketch-based "
    "percentile_approx query (approx_quantiles_orders) is the "
    "mergeable 100 TB path.",
)
def q_median_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.median("o_totalprice"), 2).alias("median_total"),
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("q1_total"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("q3_total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "parse_url_docs",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param
    FROM documents ORDER BY doc_id
    """,
    description="URL structural parsing (host/path/query-param) via "
    "parse_url — the JVM-side building block for crawl-corpus curation "
    "(domain rollups, per-site quotas, URL dedup) without a Python UDF. "
    "The oracle reconstructs each component independently from the "
    "fields the URL was built from, so it verifies parse_url's "
    "extraction rather than mirroring it.",
)
def q_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@query(
    "shard_docs_deterministic",
    oracle="""
    SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 8 AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY shard ORDER BY shard
    """,
    description="Deterministic training-shard assignment: shard = "
    "md5(doc_id) mod N, so the same corpus always lands in the same "
    "shards regardless of partitioning, cluster size, or engine — the "
    "reproducible 'global shuffle' a training exporter needs (vs "
    "df.repartition's run-dependent round-robin). Balance check "
    "aggregates per-shard doc and char counts.",
)
def q_shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sampling import deterministic_shard

    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(deterministic_shard("doc_id", 8).alias("shard"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("shard")
    )


@query(
    "bucketed_join_revenue",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    description="Shuffle-free fact/dim join from bucketed layout: both "
    "tables persisted with bucketBy(8, custkey) + sortBy, so the join "
    "plan has NO Exchange on either side — each task merges bucket i "
    "of both tables. The one-time layout cost amortizes across every "
    "recurring join at 100 TB (see operators/layout.py:write_bucketed; "
    "plan asserted Exchange-free in tests/test_layout.py).",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.layout import write_bucketed

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    try:
        write_bucketed(
            orders, "bkt_orders", ["o_custkey"], n_buckets=8, sort_cols=["o_custkey"]
        )
        write_bucketed(
            cust, "bkt_customer", ["c_custkey"], n_buckets=8, sort_cols=["c_custkey"]
        )
        o = spark.table("bkt_orders")
        c = spark.table("bkt_customer")
    except Exception:
        # results are layout-independent: if the harness session has no
        # writable warehouse dir for saveAsTable, join the plain scans —
        # the Exchange-free bucketed plan is asserted in
        # tests/test_layout.py, not here
        o, c = orders, cust
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "embedding_dim_profile",
    oracle="""
    SELECT dim, COUNT(*) AS n,
           ROUND(AVG(v), 4) + 0.0 AS mean_v,
           ROUND(MIN(v), 4) + 0.0 AS min_v,
           ROUND(MAX(v), 4) + 0.0 AS max_v
    FROM (
      SELECT CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ) GROUP BY dim ORDER BY dim
    """,
    description="Per-dimension profile of the embedding column "
    "(posexplode -> groupBy dim): the standard drift/normalization "
    "check before ANN indexing. Lateral explode is JVM-side generate "
    "(no Python), and the agg shuffles one row per (partition, dim) — "
    "dim cardinality is the vector width, so the shuffle is tiny at "
    "any corpus size.",
)
def q_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("val").cast("double")
    return (
        e.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.avg(v), 4) + F.lit(0.0)).alias("mean_v"),
            (F.round(F.min(v), 4) + F.lit(0.0)).alias("min_v"),
            (F.round(F.max(v), 4) + F.lit(0.0)).alias("max_v"),
        )
        .orderBy("dim")
    )


@query(
    "map_roundtrip_user_events",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    description="MapType surface: per-user counts packed into a "
    "map<event_type, n> (map_from_entries over collect_list of "
    "structs) then unpacked with explode back to rows. The oracle is "
    "the plain GROUP BY — equality proves the map build/explode "
    "round-trip is lossless. Maps stay JVM-side; the only shuffle is "
    "the user_id agg.",
)
def q_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    return (
        packed.select("user_id", F.explode("m").alias("event_type", "n"))
        .orderBy("user_id", "event_type")
    )


@query(
    "bitwise_agg_orders",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey % 4096) AS keys_and,
           bit_or(o_orderkey % 4096) AS keys_or,
           bit_xor(o_orderkey % 4096) AS keys_xor
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="Bitwise aggregate surface (bit_and/bit_or/bit_xor) — "
    "the primitives behind flag-set rollups and XOR-based set "
    "reconciliation (a missing/duplicated row flips the group XOR). "
    "Single-pass, mergeable, constant state per group.",
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4096
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(k).alias("keys_and"),
            F.bit_or(k).alias("keys_or"),
            F.bit_xor(k).alias("keys_xor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "calendar_parts_orders",
    oracle="""
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
           COUNT(*) AS n,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS week_iso,
           CAST(quarter(o_orderdate) AS INT) AS qtr
    FROM orders GROUP BY o_orderdate ORDER BY d
    """,
    description="Calendar-function surface: date_trunc / last_day / "
    "dayofweek / ISO weekofyear / quarter per distinct order date. "
    "Encodes the cross-engine trap explicitly: DuckDB numbers Sunday 0 "
    "where Spark numbers it 1 (oracle shifts by +1). All constant-"
    "foldable JVM date arithmetic on a grouped scan.",
)
def q_calendar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(d.alias("d"))
        .agg(F.count("*").alias("n"))
        .select(
            # DATE -> TIMESTAMP at the edge: hash-stable pandas form on
            # both engines (date objects vs datetime64 differ otherwise).
            F.col("d").cast("timestamp").alias("d"),
            "n",
            F.trunc("d", "month").cast("timestamp").alias("month_start"),
            F.last_day("d").cast("timestamp").alias("month_end"),
            F.dayofweek("d").alias("dow"),
            F.weekofyear("d").alias("week_iso"),
            F.quarter("d").alias("qtr"),
        )
        .orderBy("d")
    )


@query(
    "regex_counts_docs",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]{7,}')) AS n_long_words,
           coalesce(regexp_extract(lower(text), '[a-z]{7,}'), '') AS first_long_word
    FROM documents ORDER BY doc_id
    """,
    description="regexp_count / regexp_extract_all surface: long-word "
    "density plus first match per document — single-pass JVM regex "
    "(no Python UDF) over the text column; map-only plan, no shuffle.",
)
def q_regex_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    low = F.lower("text")
    return d.select(
        "doc_id",
        F.regexp_count(low, F.lit("[a-z]{7,}")).cast("bigint").alias("n_long_words"),
        F.coalesce(
            F.regexp_extract(low, "([a-z]{7,})", 1), F.lit("")
        ).alias("first_long_word"),
    ).orderBy("doc_id")


@query(
    "date_spine_daily_events",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
      FROM events GROUP BY 1),
    b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM b)
    SELECT CAST(spine.d AS TIMESTAMP) AS d, coalesce(daily.n, 0) AS n,
           coalesce(daily.total_value, CAST(0 AS DECIMAL(18,2))) AS total_value
    FROM spine LEFT JOIN daily USING (d) ORDER BY d
    """,
    description="Dense daily spine with zero-fill: bounds from the data "
    "(min/max date agg -> 1 row), sequence+explode generates the "
    "calendar, left join re-attaches per-day aggregates. The spine side "
    "is O(days) rows from a single-row aggregate, so the join "
    "broadcasts it — no shuffle of the fact side beyond the daily "
    "rollup. Complements gapfill_locf_daily (which carries values "
    "forward; this zero-fills counts).",
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total_value"),
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return (
        spine.join(daily, "d", "left")
        .select(
            F.col("d").cast("timestamp").alias("d"),
            F.coalesce("n", F.lit(0).cast("bigint")).alias("n"),
            F.coalesce("total_value", F.lit(0).cast("decimal(18,2)")).alias(
                "total_value"
            ),
        )
        .orderBy("d")
    )


@query(
    "array_set_ops_langs",
    oracle="""
    SELECT source,
           list_sort(list(DISTINCT lang)) AS langs_all,
           list_sort(list_intersect(list(DISTINCT lang), ['en', 'es']))
             AS langs_target,
           list_sort(list_filter(list(DISTINCT lang),
                                 x -> NOT list_contains(['en', 'es'], x)))
             AS langs_other
    FROM documents GROUP BY source ORDER BY source
    """,
    description="Array set-operation surface (array_intersect / "
    "array_except / array_sort over collect_set): per-source language "
    "coverage split against a target list. Set state stays bounded by "
    "lang cardinality, so the agg is mergeable and the shuffle tiny.",
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    target = F.array(F.lit("en"), F.lit("es"))
    langs = F.collect_set("lang")
    return (
        d.groupBy("source")
        .agg(
            F.array_sort(langs).alias("langs_all"),
            F.array_sort(F.array_intersect(langs, target)).alias("langs_target"),
            F.array_sort(F.array_except(langs, target)).alias("langs_other"),
        )
        .orderBy("source")
    )


@query(
    "hash_surface_docs",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha_256,
           md5(text) AS text_md5,
           base64(encode(substr(text, 1, 24))) AS head_b64
    FROM documents ORDER BY doc_id
    """,
    description="Cryptographic-hash and binary-encoding surface (sha2/"
    "md5/base64 over utf-8 bytes) — the content-addressing primitives "
    "under exact dedup, cache keys, and shard assignment. Map-only "
    "codegen; no shuffle.",
)
def q_hash_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("sha_256"),
        F.md5("text").alias("text_md5"),
        F.base64(F.encode(F.substring("text", 1, 24), "UTF-8")).alias("head_b64"),
    ).orderBy("doc_id")


@query(
    "interpolate_missing_values",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, epoch_us(ts) AS t_us,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '4'
                  THEN NULL ELSE value END AS v
      FROM events),
    w AS (
      SELECT event_id, user_id, t_us, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY t_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY t_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY t_us, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY t_us, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM base)
    SELECT event_id, user_id, (v IS NULL) AS was_null,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * (CAST(t_us AS DOUBLE) - pt) / (nt - pt)
                 END, 4) AS value_filled
    FROM w ORDER BY user_id, event_id
    """,
    description="Linear interpolation of missing time-series values "
    "(~25% of points deterministically nulled by md5(event_id) so both "
    "engines drop the same ones): nearest non-null neighbors via "
    "last/first IGNORE NULLS over one per-user sort, ramp fill between "
    "them, LOCF/NOCB at the edges. Both window frames share a single "
    "Exchange+Sort (operators/windows.py:interpolate_linear); "
    "complements gapfill_locf_daily's step-function fill.",
)
def q_interpolate_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.windows import interpolate_linear

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    nulled = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.when(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "4",
            F.lit(None),
        )
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = interpolate_linear(
        nulled, ["user_id"], "t_us", "v", out_col="value_filled", tiebreak=["event_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_null"),
        F.round("value_filled", 4).alias("value_filled"),
    ).orderBy("user_id", "event_id")


@query(
    "null_safe_join_nations",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '2'
                  THEN NULL ELSE c_nationkey END AS nk
      FROM customer),
    n AS (
      SELECT n_nationkey AS nk, n_name FROM nation
      UNION ALL SELECT NULL, 'UNKNOWN')
    SELECT n.n_name AS n_name, COUNT(*) AS n_customers
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    GROUP BY n.n_name ORDER BY n_name
    """,
    description="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): "
    "~12% of customer nation keys deterministically nulled, dim side "
    "augmented with a NULL 'UNKNOWN' row, so null keys MATCH instead "
    "of dropping. The scale point: Spark hashes null-safe equality "
    "like any equi-key — the plan stays a broadcast/shuffle hash "
    "join, it does not degrade to a theta-join cartesian.",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) < "2",
            F.lit(None).cast("bigint"),
        )
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("nk"), "n_name"
    )
    n = n.unionByName(
        n.sparkSession.createDataFrame(
            [(None, "UNKNOWN")], "nk bigint, n_name string"
        )
    )
    return (
        c.join(F.broadcast(n), c.nk.eqNullSafe(n.nk))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_name")
    )


@query(
    "map_hof_event_shares",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type),
    tot AS (SELECT user_id, SUM(n) AS total FROM per GROUP BY user_id)
    SELECT per.user_id AS user_id, per.event_type AS event_type,
           ROUND(CAST(per.n AS DOUBLE) / tot.total, 6) AS share
    FROM per JOIN tot USING (user_id)
    WHERE per.n >= 2
    ORDER BY user_id, event_type
    """,
    description="Map higher-order functions: per-user counts packed "
    "into a map, map_filter drops rare entries (n < 2), "
    "transform_values converts counts to shares, explode unpacks — "
    "the oracle computes shares relationally, so equality proves the "
    "whole map pipeline. Map state per user is bounded by event-type "
    "cardinality; one shuffle total.",
)
def q_map_hof_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m"),
        F.sum("n").alias("total"),
    )
    shares = packed.select(
        "user_id",
        F.transform_values(
            F.map_filter("m", lambda k, v: v >= 2),
            lambda k, v: F.round(v.cast("double") / F.col("total"), 6),
        ).alias("m"),
    )
    return shares.select(
        "user_id", F.explode("m").alias("event_type", "share")
    ).orderBy("user_id", "event_type")


# ------------------------------------------------- Spark-4 surface extras

@query(
    "xml_roundtrip_docs",
    oracle="""
    SELECT doc_id, lang AS lang_xml, source AS source_xml
    FROM documents ORDER BY doc_id
    """,
    description="XML structural surface (Spark 4 built-in to_xml/"
    "from_xml): each row serialized to an XML fragment and parsed back "
    "with an explicit schema; the oracle is the identity projection, so "
    "equality proves the roundtrip is lossless. JVM-side row-local "
    "work, map-only plan.",
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    xml = F.to_xml(F.struct("lang", "source"), {"rowTag": "doc"})
    parsed = F.from_xml(xml, "lang STRING, source STRING", {"rowTag": "doc"})
    return d.select("doc_id", parsed.alias("p")).select(
        "doc_id",
        F.col("p.lang").alias("lang_xml"),
        F.col("p.source").alias("source_xml"),
    ).orderBy("doc_id")


@query(
    "str_to_map_docs",
    oracle="""
    SELECT doc_id, 'lang' AS k, lang AS v FROM documents
    UNION ALL
    SELECT doc_id, 'source' AS k, source AS v FROM documents
    ORDER BY doc_id, k
    """,
    description="str_to_map parsing of key:value,k:v strings (the "
    "log/qs-param decode primitive) exploded back to rows; oracle "
    "rebuilds the pairs relationally. Map entries preserve insertion "
    "order in Spark — output is re-sorted so neither engine's entry "
    "order matters.",
)
def q_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    s = F.concat(F.lit("lang:"), "lang", F.lit(",source:"), "source")
    m = F.str_to_map(s, F.lit(","), F.lit(":"))
    return (
        d.select("doc_id", F.explode(m).alias("k", "v"))
        .orderBy("doc_id", "k")
    )


@query(
    "collated_lang_counts",
    oracle="""
    SELECT lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END)
             AS lang_norm,
           COUNT(*) AS n
    FROM documents GROUP BY lang_norm ORDER BY lang_norm
    """,
    description="Collation-aware grouping (Spark 4 UTF8_LCASE): langs "
    "mixed-case deterministically by doc_id parity, grouped under a "
    "case-insensitive collation instead of a lower() rewrite — "
    "collation rides the type, so every comparison/join/agg downstream "
    "inherits it. Output normalized with lower() because the grouped "
    "representative is an arbitrary member of the equivalence class.",
)
def q_collated_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(F.col("lang"))
    return (
        d.select(F.collate(mixed, "UTF8_LCASE").alias("lang_c"))
        .groupBy("lang_c")
        .agg(F.count("*").alias("n"))
        .select(F.lower("lang_c").alias("lang_norm"), "n")
        .orderBy("lang_norm")
    )


@query(
    "try_arithmetic_orders",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 7 = 0 THEN NULL
                ELSE ROUND(o_totalprice / (o_custkey % 7), 4) END AS price_ratio,
           o_orderkey > 0 AS overflow_is_null
    FROM orders ORDER BY o_orderkey
    """,
    description="ANSI-safe try_* arithmetic (Spark 4 runs ANSI mode by "
    "default, where /0 and bigint overflow are runtime ERRORS that "
    "kill the job): try_divide yields NULL on the deterministic zero "
    "denominators, try_add(key, BIGINT_MAX) NULLs instead of "
    "overflowing. The fault-tolerance contract batch curation needs — "
    "one poisoned row must not fail a 100 TB pass.",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    denom = F.col("o_custkey") % 7
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), denom), 4).alias("price_ratio"),
        F.try_add(F.col("o_orderkey"), F.lit(9223372036854775807))
        .isNull()
        .alias("overflow_is_null"),
    ).orderBy("o_orderkey")


@query(
    "bitmap_distinct_orders",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey % 10000) AS BIGINT) AS n_distinct_buckets
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="Bitmap aggregate surface (bitmap_construct_agg + "
    "bitmap_count): EXACT distinct counting of bounded-domain ints as "
    "a fixed-size bitmap — mergeable like HLL but exact, the right "
    "structure for bounded ids (enum codes, bucketed keys) where HLL's "
    "error and COUNT(DISTINCT)'s expand-shuffle are both unnecessary. "
    "Oracle: plain COUNT(DISTINCT). Domain shifted +1 because "
    "bitmap_bit_position maps both 0 and 1 to bit 0 ((x-1) clamped), "
    "which would silently merge those two values.",
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pos = F.bitmap_bit_position(F.col("o_custkey") % 10000 + 1)
    return (
        o.groupBy("o_orderstatus")
        .agg(F.bitmap_count(F.bitmap_construct_agg(pos)).alias("n_distinct_buckets"))
        .orderBy("o_orderstatus")
    )


@query(
    "lateral_top2_per_nation",
    oracle="""
    SELECT n.n_name AS n_name, c.c_name AS c_name,
           ROUND(c.c_acctbal, 2) AS bal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2) c
    ORDER BY n_name, bal DESC, c_name
    """,
    description="LATERAL correlated top-k (Spark 4 DataFrame "
    "lateralJoin + .outer() column refs): top-2 customers per nation "
    "without a window-over-everything — Catalyst decorrelates the "
    "per-row subquery into a ranked join, so the fact side is scanned "
    "once, not once per outer row.",
)
def q_lateral_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    top2 = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), "c_name")
        .limit(2)
        .select("c_name", "c_acctbal")
    )
    return (
        n.lateralJoin(top2)
        .select("n_name", "c_name", F.round("c_acctbal", 2).alias("bal"))
        .orderBy("n_name", F.col("bal").desc(), "c_name")
    )


@query(
    "recursive_cte_custkey_forest",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, chain.root, chain.depth + 1
      FROM customer c JOIN chain ON c.c_custkey // 10 = chain.node
      WHERE c.c_custkey >= 10)
    SELECT root, depth, COUNT(*) AS n
    FROM chain GROUP BY root, depth ORDER BY root, depth
    """,
    description="Recursive CTE (Spark 4.1 WITH RECURSIVE): a synthetic "
    "decimal-digit forest over custkeys (parent = key DIV 10) walked "
    "from the single-digit roots, counting nodes per (root, depth). "
    "Iterative joins run as successive Spark jobs with the frontier as "
    "the build side — the relational pattern behind hierarchy/"
    "reachability queries (and the dedup components op, which "
    "hand-rolls the same loop with localCheckpoint lineage cuts).",
)
def q_recursive_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte_v")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
          FROM customer_rcte_v WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, chain.root, chain.depth + 1
          FROM customer_rcte_v c JOIN chain ON c.c_custkey DIV 10 = chain.node
          WHERE c.c_custkey >= 10)
        SELECT root, depth, COUNT(*) AS n
        FROM chain GROUP BY root, depth ORDER BY root, depth
        """
    )


# ------------------------------------------- corpus curation, round 2

@query(
    "remove_dup_segments_docs",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    segs AS (
      SELECT doc_id, CAST(t.i AS INT) AS seg_idx,
             array_to_string(ws[(t.i*3+1):(t.i*3+3)], ' ') AS segment
      FROM docs, unnest(range(CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS t(i)),
    freq AS (SELECT segment, COUNT(DISTINCT doc_id) AS n_docs_with
             FROM segs GROUP BY 1),
    tagged AS (SELECT s.doc_id, s.seg_idx, s.segment, f.n_docs_with
               FROM segs s JOIN freq f USING (segment))
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN n_docs_with <= 4 THEN segment END,
                               ' ' ORDER BY seg_idx), '') AS cleaned_text,
           CAST(SUM(CASE WHEN n_docs_with <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_seg_kept,
           CAST(SUM(CASE WHEN n_docs_with <= 4 THEN 0 ELSE 1 END) AS BIGINT) AS n_seg_dropped
    FROM tagged GROUP BY doc_id ORDER BY doc_id
    """,
    description="C4-style corpus-wide duplicate-segment removal (line "
    "dedup over fixed 3-word segments, since fixture docs are single-"
    "line): segments occurring in >4 documents are boilerplate and "
    "dropped, survivors reassembled in order. One segment-keyed "
    "aggregation (the unavoidable corpus-wide shuffle), one join back, "
    "one per-doc reassembly whose ordering is an in-row array_sort of "
    "(idx, segment) structs — no window pass "
    "(operators/curation.py:remove_duplicate_segments).",
    bench=True,
)
def q_remove_dup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import remove_duplicate_segments
    from azure_etl_spark.operators.dedup import normalized_text

    docs = _td(spark, sf_dir)
    out = remove_duplicate_segments(
        docs, F.split(normalized_text("text"), " "), seg_len=3, max_occurrences=4
    )
    return out.orderBy("doc_id")


@query(
    "chunk_docs_sliding",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
    n AS (SELECT doc_id, w,
                 1 + CAST(ceil(greatest(len(w) - 64, 0) / 48.0) AS INT) AS nw
          FROM docs),
    c AS (SELECT doc_id, CAST(t.i AS INT) AS chunk_idx,
                 array_to_string(w[(t.i*48+1):(t.i*48+64)], ' ') AS chunk_text
          FROM n, unnest(range(CAST(nw AS BIGINT))) AS t(i))
    SELECT doc_id, chunk_idx,
           CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_words,
           chunk_text
    FROM c
    """,
    description="Overlapping context-window chunking (64-word windows, "
    "stride 48 => 16 words of overlap) — the pretraining/RAG chunk step. "
    "Map-only per-row HOF work (sequence/slice/array_join) + one "
    "posexplode; deterministic (doc_id, chunk_idx) keys independent of "
    "partitioning (operators/curation.py:chunk_sliding_windows).",
)
def q_chunk_docs_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.curation import chunk_sliding_windows

    return chunk_sliding_windows(_td(spark, sf_dir), window=64, stride=48)


@query(
    "unigram_logprob_docs",
    oracle=f"""
    WITH words AS (SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents),
    vocab AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM vocab)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(-ln(CAST(c AS DOUBLE) / t)), 6) AS avg_neg_logp
    FROM words JOIN vocab USING (w), tot
    GROUP BY doc_id ORDER BY doc_id
    """,
    description="Unigram language-model score (CCNet-style perplexity "
    "proxy): corpus vocabulary counts -> per-token -ln p(w) -> per-doc "
    "mean. The vocab table is vocabulary-sized, so AQE broadcasts it "
    "back against the exploded tokens; the corpus total joins as a "
    "single-row broadcast scalar — the fact side shuffles only for the "
    "final per-doc mean. High score = improbable/garbled text, the "
    "filter signal quality pipelines threshold on.",
    bench=True,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text

    docs = _td(spark, sf_dir)
    words = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("w")
    )
    # The vocabulary is consumed by BOTH the broadcast-join build side
    # and the corpus total; exchange reuse dedupes the explode+count
    # aggregate across the two consumers at runtime (verified round 13
    # with completed-task accounting: 73 executed tasks, two
    # corpus-sized stages — token stream + vocab build, the floor for
    # this join — identical with and without an explicit
    # localCheckpoint, so the checkpoint an earlier round-13 commit
    # interposed was removed as pure overhead; its claimed third
    # corpus pass counted SKIPPED stages).
    vocab = words.groupBy("w").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").alias("t"))
    return (
        words.join(vocab, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c").cast("double") / F.col("t"))), 6
            ).alias("avg_neg_logp"),
        )
        .orderBy("doc_id")
    )


@query(
    "bigram_logprob_docs",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
    bg AS (SELECT doc_id, w[CAST(t.i AS INT)] AS w1, w[CAST(t.i AS INT) + 1] AS w2
           FROM docs, unnest(range(1, CAST(len(w) AS BIGINT))) AS t(i)),
    cb AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    cu AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM cb GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT x) AS vs FROM
          (SELECT unnest(w) AS x FROM docs) u),
    scored AS (
      SELECT bg.doc_id,
             -ln((c2 + 0.5) / (c1 + 0.5 * vs)) AS nlp
      FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1), v),
    agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                   ROUND(AVG(nlp), 6) AS avg_neg_logp
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams, a.avg_neg_logp
    FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
    description="Bigram language-model score with add-0.5 smoothing "
    "(the honest in-engine step toward CCNet's KenLM perplexity "
    "filter): P(w2|w1) = (c(w1w2)+a)/(c(w1.)+aV), per-doc mean "
    "-ln P over adjacent-token bigrams. The bigram table is "
    "Heaps-bounded (AQE picks broadcast vs shuffle join by its actual "
    "size); context counts derive from the bigram table (tiny) and the "
    "vocab size joins as a 1-row broadcast scalar. Docs with <2 tokens "
    "survive with n_bigrams=0.",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text

    docs = _td(spark, sf_dir)
    toks = docs.select("doc_id", F.split(normalized_text("text"), " ").alias("w"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.when(F.size("w") < 2, F.array().cast("array<struct<w1:string,w2:string>>"))
            .otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("w1"),
                        F.element_at("w", i + 1).alias("w2"),
                    ),
                )
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cu = cb.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = toks.select(F.explode("w").alias("x")).agg(
        F.countDistinct("x").alias("vs")
    )
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "nlp",
            -F.log(
                (F.col("c2") + F.lit(0.5))
                / (F.col("c1") + F.lit(0.5) * F.col("vs"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nlp"), 6).alias("avg_neg_logp"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_neg_logp",
        )
        .orderBy("doc_id")
    )


@query(
    "bm25_score_docs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
    dl AS (SELECT doc_id, len(w) AS dl FROM toks),
    consts AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    words AS (SELECT doc_id, unnest(w) AS t FROM toks),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM words
           WHERE t IN ('hash', 'join', 'scan') GROUP BY doc_id, t),
    dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t),
    idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM dfreq, consts),
    parts AS (
      SELECT tf.doc_id,
             idf.idf * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / consts.avgdl))
               AS part
      FROM tf JOIN idf USING (t) JOIN dl USING (doc_id), consts)
    SELECT doc_id, ROUND(SUM(part), 6) AS score
    FROM parts GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 50
    """,
    description="BM25 relevance against a fixed term set (the lexical "
    "half of a RAG retrieval stack): corpus constants and per-term "
    "document frequencies are 1-row / |terms|-row broadcasts, tf is a "
    "filtered explode + groupBy — the corpus shuffles once, sized by "
    "matching tokens only. Lucene +1 idf smoothing; top-50 by score.",
)
def q_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = T.bm25_scores(_td(spark, sf_dir), ["hash", "join", "scan"])
    return (
        out.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
    )


@query(
    "hybrid_rrf_docs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
    dl AS (SELECT doc_id, len(w) AS dl FROM toks),
    consts AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    words AS (SELECT doc_id, unnest(w) AS t FROM toks),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM words
           WHERE t IN ('hash', 'join', 'scan') GROUP BY doc_id, t),
    dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t),
    idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM dfreq, consts),
    bm AS (
      SELECT tf.doc_id,
             SUM(idf.idf * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / consts.avgdl)))
               AS score
      FROM tf JOIN idf USING (t) JOIN dl USING (doc_id), consts
      GROUP BY tf.doc_id),
    lex AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS lrank
      FROM bm QUALIFY lrank <= 50),
    vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qv AS (SELECT v AS q FROM vecs WHERE vec_id = 0),
    sim AS (SELECT vec_id AS doc_id, list_cosine_similarity(v, q) AS s
            FROM vecs, qv WHERE vec_id <> 0),
    vec AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS INT)
               AS vrank
      FROM sim QUALIFY vrank <= 50),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.lrank AS lex_rank, v.vrank AS vec_rank,
             COALESCE(1.0 / (60 + l.lrank), 0) + COALESCE(1.0 / (60 + v.vrank), 0)
               AS rrf
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
    SELECT doc_id, lex_rank, vec_rank, ROUND(rrf, 6) AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    description="Hybrid retrieval via reciprocal rank fusion (the "
    "standard BM25 (+) dense-cosine composition, k=60): each ranker "
    "produces its top-50 independently — the lexical one from the "
    "matching-token shuffle, the dense one map-only + TakeOrdered — "
    "then a full-outer join on doc id sums 1/(60+rank). Ranker outputs "
    "are rank lists (tiny), so fusion costs nothing at any corpus "
    "size.",
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # each ranker: TakeOrderedAndProject to its top-50 FIRST, then the
    # (unpartitioned, but 50-row) window stamps ranks — the documented
    # tiny-result exception, never a corpus-wide single-partition sort
    bm = T.bm25_scores(_td(spark, sf_dir), ["hash", "join", "scan"])
    wlex = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex = (
        bm.orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
        .withColumn("lex_rank", F.row_number().over(wlex))
        .select("doc_id", "lex_rank")
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    from azure_etl_spark.functions.vectors import cosine as _cos

    sim = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), _cos(F.col("v"), F.col("q")).alias("s"))
    )
    wvec = Window.orderBy(F.col("s").desc(), F.col("doc_id"))
    vec = (
        sim.orderBy(F.col("s").desc(), "doc_id")
        .limit(50)
        .withColumn("vec_rank", F.row_number().over(wvec))
        .select("doc_id", "vec_rank")
    )
    fused = lex.join(vec, "doc_id", "full_outer").withColumn(
        "rrf",
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id", "lex_rank", "vec_rank", F.round("rrf", 6).alias("rrf_score")
        )
    )


def _mmr_rerank_oracle(k: int = 8, lam: float = 0.7, n_cand: int = 20) -> str:
    """Replays mmr_select: candidate top-20 by cosine, then k greedy
    rounds unrolled as CTEs — p{r} is the argmax of lam*rel-(1-lam)*
    max-sim-to-selected over the not-yet-picked, u{r} the growing
    selection. (1-lam) is interpolated from the SAME Python double the
    Spark side multiplies by, so scores are bit-identical."""
    om = repr(1 - lam)
    ctes = [
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "qv AS (SELECT v AS q FROM vecs WHERE vec_id = 0)",
        # MATERIALIZED is load-bearing: every round references the
        # previous selection CTE three times (cross join, NOT IN, union),
        # so inlining would re-evaluate the whole chain ~3^k times —
        # materialization keeps the oracle linear in k.
        f"""cand AS MATERIALIZED (
      SELECT vec_id AS id, list_cosine_similarity(v, q) AS rel, v
      FROM vecs, qv WHERE vec_id <> 0
      ORDER BY rel DESC, id LIMIT {n_cand})""",
        """u1 AS MATERIALIZED (
      SELECT id, rel, v, rel AS mmr_score, 1 AS rank
      FROM cand ORDER BY rel DESC, id LIMIT 1)""",
    ]
    for r in range(2, k + 1):
        ctes.append(f"""p{r} AS (
      SELECT id, rel, v, {lam} * rel - {om} * ms AS mmr_score, {r} AS rank
      FROM (
        SELECT c.id, any_value(c.rel) AS rel, any_value(c.v) AS v,
               MAX(list_cosine_similarity(c.v, s.v)) AS ms
        FROM cand c CROSS JOIN u{r - 1} s
        WHERE c.id NOT IN (SELECT id FROM u{r - 1})
        GROUP BY c.id) x
      ORDER BY mmr_score DESC, id LIMIT 1)""")
        ctes.append(
            f"u{r} AS MATERIALIZED "
            f"(SELECT * FROM u{r - 1} UNION ALL SELECT * FROM p{r})"
        )
    return f"""
    WITH {', '.join(ctes)}
    SELECT rank, id AS doc_id, ROUND(rel, 6) AS rel, ROUND(mmr_score, 6) AS mmr_score
    FROM u{k} ORDER BY rank
    """


@query(
    "mmr_rerank_docs",
    oracle=_mmr_rerank_oracle,
    description="MMR diversification (Carbonell & Goldstein 1998) of a "
    "dense-retrieval candidate list: top-20 by cosine, then 8 greedy "
    "rounds of lam*rel - (1-lam)*max-sim-to-selected with deterministic "
    "tie-breaks — the rerank pass runs on the CANDIDATE LIST, never "
    "the corpus, so each round is a tiny broadcast aggregate. Oracle "
    "unrolls all rounds as CTEs (the k-means/BPE technique).",
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.functions.vectors import cosine as _cos
    from azure_etl_spark.operators.similarity import mmr_select

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cos(F.col("v"), F.col("q")).alias("rel"),
            "v",
        )
        .orderBy(F.col("rel").desc(), "doc_id")
        .limit(20)
    )
    out = mmr_select(cand, k=8, lam=0.7)
    return out.select(
        "rank",
        "doc_id",
        F.round("rel", 6).alias("rel"),
        F.round("mmr_score", 6).alias("mmr_score"),
    ).orderBy("rank")


@query(
    "trimmed_mean_orders",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY 1)
    SELECT o.o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice BETWEEN lo AND hi) AS n_kept,
           ROUND(AVG(o_totalprice) FILTER (WHERE o_totalprice BETWEEN lo AND hi), 4)
             AS trimmed_mean
    FROM orders o JOIN q USING (o_orderpriority)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    description="5-95% trimmed mean per group: per-group percentile "
    "bounds (group-count-sized table) broadcast-joined back, then a "
    "conditional aggregate — the two-pass robust-statistic pattern "
    "(same shape as the MAD outlier op) that never sorts the fact "
    "table globally.",
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    q = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    within = F.col("o_totalprice").between(F.col("lo"), F.col("hi"))
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(within, 1)).alias("n_kept"),
            F.round(F.avg(F.when(within, F.col("o_totalprice"))), 4).alias(
                "trimmed_mean"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "upsert_orders_batch",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_orderstatus,
             ROUND(o_totalprice * 1.1, 2) AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT 900000000 + o_orderkey, 'N', 100.0
      FROM orders WHERE o_orderkey % 1000 = 0),
    merged AS (
      SELECT * FROM updates
      UNION ALL
      SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM updates u
                        WHERE u.o_orderkey = o.o_orderkey))
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS total
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="Batch MERGE/upsert (operators/aggregate.py:"
    "upsert_by_key): a synthetic update batch (repriced existing keys "
    "+ brand-new keys) merged into orders as updates UNION ALL "
    "(target ANTI JOIN updates) — MERGE INTO semantics without a "
    "transactional format; one anti-join shuffle, AQE-broadcast for "
    "small update batches. Verified via post-merge per-status rollup.",
)
def q_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.aggregate import upsert_by_key

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    repriced = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
    )
    inserts = o.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 900000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
    )
    merged = upsert_by_key(o, repriced.unionByName(inserts), ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts >= t1.t1 GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= t2.t2 GROUP BY e.user_id)
    SELECT COUNT(t1.user_id) AS n_viewed,
           COUNT(t2.user_id) AS n_clicked_after,
           COUNT(t3.user_id) AS n_purchased_after
    FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
            LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
    description="Ordered funnel (view -> click after -> purchase "
    "after): each stage is a min-timestamp aggregate constrained by "
    "the previous stage's time, chained with joins — every stage "
    "shrinks, so later joins ride AQE broadcasts; no per-user event "
    "collection anywhere. Single-row stage-count output.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("t1").alias("n_viewed"),
            F.count("t2").alias("n_clicked_after"),
            F.count("t3").alias("n_purchased_after"),
        )
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH ua AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events GROUP BY user_id, w),
    c AS (SELECT user_id, MIN(w) AS cw FROM ua GROUP BY user_id)
    SELECT CAST(c.cw AS TIMESTAMP) AS cohort_week,
           CAST((ua.w - c.cw) / 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT ua.user_id) AS BIGINT) AS n_users
    FROM ua JOIN c USING (user_id)
    GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset
    """,
    description="Weekly cohort retention: cohort = first active ISO "
    "week per user, cells count distinct users per (cohort, offset). "
    "The user-week activity table is pre-deduped BEFORE the cohort "
    "join (shrinks the fact to |users|x|weeks|), and the cohort map "
    "is user-count-sized — broadcast back. Both engines truncate "
    "weeks to ISO Monday.",
    bench=True,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ua = (
        ev.select("user_id", F.date_trunc("week", "ts").cast("date").alias("w"))
        .distinct()
    )
    c = ua.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        ua.join(c, "user_id")
        .groupBy(
            F.col("cw").cast("timestamp").alias("cohort_week"),
            (F.datediff("w", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "time_weighted_avg_users",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, value,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(value * (epoch_us(nts) - epoch_us(ts)))
                   / SUM(epoch_us(nts) - epoch_us(ts)), 6) AS twa
    FROM t WHERE nts IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    description="Time-weighted average per user over an IRREGULAR "
    "series: each observation weighted by its holding duration "
    "(lead(ts) - ts), the statistic a plain AVG gets wrong whenever "
    "sampling is bursty. One window pass (lead) sharing one shuffle "
    "with the per-user aggregate; users with a single event drop out "
    "(no holding interval).",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "value",
        F.unix_micros(F.lead("ts").over(w)).alias("nt_us"),
    ).filter(F.col("nt_us").isNotNull())
    dur = (F.col("nt_us") - F.col("t_us")).cast("double")
    return (
        t.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(F.sum(F.col("value") * dur) / F.sum(dur), 6).alias("twa"),
        )
        .orderBy("user_id")
    )


@query(
    "interval_overlap_join_events",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS p_id, epoch_us(ts) AS ps,
             epoch_us(ts) + 1800000000 AS pe
      FROM events WHERE event_type = 'purchase'),
    e AS (
      SELECT user_id, event_id AS e_id, epoch_us(ts) AS es,
             epoch_us(ts) + 600000000 AS ee
      FROM events WHERE event_type = 'error')
    SELECT p.user_id AS user_id, COUNT(*) AS n_overlaps
    FROM p JOIN e ON p.user_id = e.user_id AND p.ps <= e.ee AND e.es <= p.pe
    GROUP BY p.user_id ORDER BY user_id
    """,
    description="Interval-overlap join (purchase windows [t, t+30m] x "
    "error windows [t, t+10m] per user) via the chunk trick "
    "(operators/joins.py:chunked_interval_join): intervals explode "
    "onto fixed 10-minute chunks and the join is a plain hash "
    "equi-join on (user, chunk) + exact-overlap filter — the shape "
    "that scales where the naive theta join plans a nested loop. The "
    "oracle is the naive overlap join, so equality proves the "
    "chunking is lossless.",
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.joins import chunked_interval_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.unix_micros("ts").alias("ps"),
        (F.unix_micros("ts") + 1800000000).alias("pe"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("e_id"),
        F.unix_micros("ts").alias("es"),
        (F.unix_micros("ts") + 600000000).alias("ee"),
    )
    pairs = chunked_interval_join(
        p, e, ["user_id"], "ps", "pe", "es", "ee", chunk_width=600000000
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy("user_id")
    )


@query(
    "quality_gate_customers",
    oracle="""
    SELECT 'clean' AS bucket,
           CAST(SUM(CASE WHEN c_custkey IS NOT NULL
                          AND c_acctbal BETWEEN -1000 AND 10000
                          AND c_mktsegment IN ('AUTOMOBILE','BUILDING',
                              'FURNITURE','HOUSEHOLD','MACHINERY')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n
    FROM customer
    UNION ALL
    SELECT 'viol_acctbal_in_range',
           CAST(SUM(CASE WHEN NOT coalesce(c_acctbal BETWEEN -1000 AND 10000,
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'viol_custkey_not_null',
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'viol_mktsegment_known',
           CAST(SUM(CASE WHEN NOT coalesce(c_mktsegment IN ('AUTOMOBILE',
                              'BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'),
                              FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    ORDER BY bucket
    """,
    description="Declarative data-quality gate (operators/quality.py): "
    "clean-row count + per-rule violation counts from ONE flagged "
    "projection — N rules as N codegen'd predicates in a single scan, "
    "never N filter-scans. Output unpivoted to (bucket, n) rows.",
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.quality import flag_expectations

    c = _t(spark, sf_dir, "customer")
    rules = {
        "custkey_not_null": F.col("c_custkey").isNotNull(),
        "acctbal_in_range": F.col("c_acctbal").between(-1000, 10000),
        "mktsegment_known": F.col("c_mktsegment").isin(
            "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
        ),
    }
    flagged = flag_expectations(c, rules)
    agg = flagged.agg(
        F.sum((F.size("__violations") == 0).cast("long")).alias("clean"),
        *[
            F.sum(F.array_contains("__violations", name).cast("long")).alias(
                f"viol_{name}"
            )
            for name in rules
        ],
    )
    return (
        agg.unpivot([], [c_ for c_ in agg.columns], "bucket", "n")
        .orderBy("bucket")
    )


@query(
    "set_except_all_parts",
    oracle="""
    SELECT p_type FROM part WHERE p_size <= 30
    EXCEPT ALL
    SELECT p_type FROM part WHERE p_size <= 15
    ORDER BY p_type
    """,
    description="Multiset EXCEPT ALL (duplicate-preserving difference): "
    "each p_type keeps (count in <=30) - (count in <=15) copies — the "
    "bag semantics the distinct-based EXCEPT query (set_except_parts) "
    "cannot express. Spark plans a count-diff aggregation + generate, "
    "no row-by-row anti semantics.",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") <= 30).select("p_type")
    b = p.filter(F.col("p_size") <= 15).select("p_type")
    return a.exceptAll(b).orderBy("p_type")


@query(
    "date_format_orders",
    oracle="""
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
           strftime(o_orderdate, '%Y-%m') AS ym,
           strftime(o_orderdate, '%d/%m/%Y') AS dmy,
           CAST(strftime(o_orderdate, '%j') AS INT) AS day_of_year,
           CAST(make_date(CAST(strftime(o_orderdate, '%Y') AS INT), 1, 1)
                AS TIMESTAMP) AS year_start
    FROM orders GROUP BY o_orderdate ORDER BY d
    """,
    description="Datetime formatting parity (Spark Java patterns vs "
    "DuckDB strftime — the formats are reconstructed independently on "
    "each side, so equality verifies the pattern semantics): yyyy-MM, "
    "dd/MM/yyyy, day-of-year, and make_date construction. All "
    "constant-foldable JVM-side formatting over the distinct dates.",
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(d.alias("d"))
        .agg(F.count("*").alias("__n"))
        .select(
            F.col("d").cast("timestamp").alias("d"),
            F.date_format("d", "yyyy-MM").alias("ym"),
            F.date_format("d", "dd/MM/yyyy").alias("dmy"),
            F.dayofyear("d").alias("day_of_year"),
            F.make_date(F.year("d"), F.lit(1), F.lit(1))
            .cast("timestamp")
            .alias("year_start"),
        )
        .orderBy("d")
    )


@query(
    "aes_roundtrip_docs",
    oracle="""
    SELECT doc_id, substr(text, 1, 40) AS head, TRUE AS ciphertext_differs
    FROM documents ORDER BY doc_id
    """,
    description="Column-level encryption surface: aes_encrypt (GCM, "
    "random IV — ciphertext is salted per row) then aes_decrypt "
    "recovers the plaintext exactly; the oracle is the identity "
    "projection plus the ciphertext!=plaintext witness. The at-rest "
    "pattern for PII columns that must stay joinable only after "
    "authorized decryption; complements the irreversible masking in "
    "pii_scrub_docs. Map-only, JVM-side crypto.",
)
def q_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    key = F.lit("0123456789abcdef")  # 16-byte demo key; inject via conf in prod
    head = F.substring("text", 1, 40)
    enc = F.aes_encrypt(head.cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary")).cast("string")
    return d.select(
        "doc_id",
        dec.alias("head"),
        (enc.cast("string") != head).alias("ciphertext_differs"),
    ).orderBy("doc_id")


@query(
    "not_in_vs_not_exists_nulls",
    oracle="""
    WITH dim AS (
      SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END AS nk
      FROM nation)
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_nationkey NOT IN (SELECT nk FROM dim)) AS n_not_in,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.nk = c.c_nationkey))
        AS n_not_exists
    """,
    description="The NOT IN null trap, pinned by both engines: one NULL "
    "in the subquery list makes NOT IN three-valued-logic-false for "
    "EVERY row (n_not_in = 0), while NOT EXISTS keeps its natural "
    "semantics — the single most common silent-wrong-answer rewrite in "
    "warehouse SQL. Spark plans NOT IN as null-aware anti join "
    "(broadcast required), NOT EXISTS as a plain left-anti.",
)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_nin_v")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nat_nin_v")
    return spark.sql(
        """
        WITH dim AS (
          SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END AS nk
          FROM nat_nin_v)
        SELECT
          (SELECT COUNT(*) FROM cust_nin_v
           WHERE c_nationkey NOT IN (SELECT nk FROM dim)) AS n_not_in,
          (SELECT COUNT(*) FROM cust_nin_v c
           WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.nk = c.c_nationkey))
            AS n_not_exists
        """
    )


@query(
    "grouping_id_rollup_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
             AS gid,
           COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
    description="grouping()/grouping_id disambiguation in rollups: the "
    "bitmask separates 'NULL because subtotal row' from 'NULL data' — "
    "without it, rollup outputs are unparseable whenever grouping "
    "columns are nullable. One Expand + one aggregation pass.",
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus").cast("bigint") * 2
        + F.grouping("o_orderpriority").cast("bigint")
    )
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), gid.alias("gid"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
        )
        .orderBy("gid", "status", "priority")
    )


@query(
    "try_to_number_docs",
    oracle="""
    SELECT doc_id,
           TRY_CAST(CAST(doc_id AS VARCHAR) ||
                    CASE WHEN doc_id % 3 = 0 THEN 'x'
                         WHEN doc_id % 3 = 1 THEN '.5'
                         ELSE '' END AS DOUBLE) AS parsed,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS n_chars_rt
    FROM documents ORDER BY doc_id
    """,
    description="Fault-tolerant parsing (try_cast): a third of the "
    "synthesized strings are poisoned with a trailing 'x' and parse to "
    "NULL — never a job-killing ANSI error — while decimal and integer "
    "forms parse on both engines. (Inputs are synthesized rather than "
    "raw md5 hex because the engines' string->number grammars diverge "
    "at the edges: DuckDB reads '2e07' as sci-notation where Spark "
    "rejects it for INT, and Java accepts a trailing 'f'/'d' float "
    "suffix where DuckDB rejects it — parity holds on the common "
    "numeric grammar, which is what real dirty data exercises.) The "
    "ingestion posture: parse what parses, quarantine NULLs.",
)
def q_try_to_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _td(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat(
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("x"))
            .when(F.col("doc_id") % 3 == 1, F.lit(".5"))
            .otherwise(F.lit("")),
        )
        .try_cast("double")
        .alias("parsed"),
        F.col("n_chars").cast("string").try_cast("int").alias("n_chars_rt"),
    ).orderBy("doc_id")


@query(
    "date_arith_orders",
    oracle="""
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP)
             AS plus_month,
           CAST(CAST(o_orderdate AS DATE) + 45 AS TIMESTAMP) AS plus_45d,
           CAST(DATE '2024-01-15' - CAST(o_orderdate AS DATE) AS INT)
             AS days_to_asof
    FROM orders GROUP BY o_orderdate ORDER BY d
    """,
    description="Date arithmetic parity: add_months (month-end "
    "clamping matches DuckDB's +INTERVAL), date_add, and datediff "
    "against the fixed as-of date. Constant-foldable JVM arithmetic "
    "over the distinct dates.",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(d.alias("d"))
        .agg(F.count("*").alias("__n"))
        .select(
            F.col("d").cast("timestamp").alias("d"),
            F.add_months("d", 1).cast("timestamp").alias("plus_month"),
            F.date_add("d", 45).cast("timestamp").alias("plus_45d"),
            F.datediff(F.lit("2024-01-15").cast("date"), F.col("d")).alias(
                "days_to_asof"
            ),
        )
        .orderBy("d")
    )


@query(
    "sample_exact_k_docs",
    oracle="""
    SELECT doc_id, lang FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 50
    """,
    description="Deterministic EXACT-k uniform sample: take the k "
    "lowest md5(key) rows — a uniform permutation order both engines "
    "reproduce, unlike df.sample (partition-seeded, approximate "
    "fraction, no exact k). Plans as TakeOrderedAndProject: per-task "
    "k-heaps + driver merge, no global sort — the reservoir-sampling "
    "result with shuffle-free mechanics.",
)
def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        d.select("doc_id", "lang", h.alias("__h"))
        .orderBy("__h", "doc_id")
        .limit(50)
        .drop("__h")
    )


@query(
    "bool_agg_orders",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           bool_and(o_orderdate IS NOT NULL) AS dates_complete
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="Boolean aggregate surface (count_if / bool_and / "
    "bool_or): the assertion-style rollups data-quality dashboards are "
    "made of — single-pass, one-bit state per group, mergeable.",
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.bool_and(F.col("o_orderdate").isNotNull()).alias("dates_complete"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "array_predicates_docs",
    oracle=f"""
    SELECT doc_id,
           len(list_filter({_WORDS_SQL}, x -> len(x) >= 10)) > 0
             AS has_long_word,
           len(list_filter({_WORDS_SQL}, x -> len(x) > 15)) = 0
             AS all_words_short,
           len(list_filter({_WORDS_SQL},
                           x -> list_contains(['the','a','of'], x))) > 0
             AS has_stopword
    FROM documents ORDER BY doc_id
    """,
    description="Array-predicate HOFs (exists / forall): per-doc "
    "boolean gates over the token array without exploding — short-"
    "circuiting JVM lambdas, map-only plan; the cheap pre-filter stage "
    "before expensive text ops.",
)
def q_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text

    d = _td(spark, sf_dir)
    ws = F.split(normalized_text("text"), " ")
    stop = F.array(F.lit("the"), F.lit("a"), F.lit("of"))
    return d.select(
        "doc_id",
        F.exists(ws, lambda x: F.length(x) >= 10).alias("has_long_word"),
        F.forall(ws, lambda x: F.length(x) <= 15).alias("all_words_short"),
        F.exists(ws, lambda x: F.array_contains(stop, x)).alias("has_stopword"),
    ).orderBy("doc_id")


@query(
    "nested_array_flatten_docs",
    oracle=f"""
    WITH heads AS (
      SELECT source, {_WORDS_SQL}[1:5] AS head_words FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(head_words)) AS INT) AS total_sampled,
           CAST(len(list_distinct(flatten(list(head_words)))) AS INT)
             AS distinct_sampled
    FROM heads GROUP BY source ORDER BY source
    """,
    description="Nested arrays (array<array<string>>): per-source "
    "collect_list of per-doc head-word arrays, flatten, distinct — the "
    "two-level nesting pattern of grouped sequence features. Counts "
    "only in the output, so the result is order-insensitive even "
    "though collect_list is partition-order dependent.",
)
def q_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text

    d = _td(spark, sf_dir)
    heads = d.select(
        "source", F.slice(F.split(normalized_text("text"), " "), 1, 5).alias("hw")
    )
    return (
        heads.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("hw")).cast("int").alias("total_sampled"),
            F.size(F.array_distinct(F.flatten(F.collect_list("hw")))).alias(
                "distinct_sampled"
            ),
        )
        .orderBy("source")
    )


@query(
    "map_zip_event_halves",
    oracle="""
    WITH h AS (
      SELECT user_id, event_type,
             COUNT(*) FILTER (WHERE dayofmonth(ts) <= 15) AS n1,
             COUNT(*) FILTER (WHERE dayofmonth(ts) > 15) AS n2
      FROM events GROUP BY user_id, event_type)
    SELECT user_id, event_type, CAST(n2 - n1 AS BIGINT) AS delta
    FROM h ORDER BY user_id, event_type
    """,
    description="map_zip_with surface: per-user early-month and "
    "late-month count maps merged key-wise into deltas, exploded back "
    "to rows; the oracle computes deltas relationally, so equality "
    "proves the map merge (including keys present in only one half) "
    "is lossless. Maps stay bounded by event-type cardinality.",
)
def q_map_zip_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count_if(F.dayofmonth("ts") <= 15).alias("n1"),
        F.count_if(F.dayofmonth("ts") > 15).alias("n2"),
    )
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n1"))).alias("m1"),
        F.map_from_entries(F.collect_list(F.struct("event_type", "n2"))).alias("m2"),
    )
    merged = packed.select(
        "user_id",
        F.map_zip_with(
            "m1",
            "m2",
            lambda k, a, b: F.coalesce(b, F.lit(0)) - F.coalesce(a, F.lit(0)),
        ).alias("deltas"),
    )
    return merged.select(
        "user_id", F.explode("deltas").alias("event_type", "delta")
    ).orderBy("user_id", "event_type")


# ------------------------------------------------- perceptual image dedup


def _image_hash_ctes(kind: str) -> str:
    """CTE chain recomputing the perceptual hash of every synthetic PNM
    image in pure SQL (operators/imagehash.py): the deterministic
    texture formula (quadratic integer mix mod 251 + one perturbed
    pixel), nearest-neighbor sampling with the exact
    floor((i + 0.5) * src / dst) index map of codecs.resize_nearest,
    then dhash gradient bits (9x8) or ahash above-mean bits (8x8),
    packed into four 16-bit chunk values ch0..ch3 (same packing as
    shiftrightunsigned & 0xFFFF on the engine's int64)."""
    ncols = 9 if kind == "dhash" else 8
    ctes = f"""ids AS (SELECT doc_id FROM documents),
    grid AS (
      SELECT y.y AS y, x.x AS x
      FROM generate_series(0, 7) y(y), generate_series(0, {ncols - 1}) x(x)),
    px AS (
      SELECT i.doc_id, g.y, g.x,
             LEAST(CAST(FLOOR((g.y + 0.5) * 16.0 / 8) AS INT), 15) AS sy,
             LEAST(CAST(FLOOR((g.x + 0.5) * 24.0 / {ncols}) AS INT), 23) AS sx
      FROM ids i, grid g),
    v AS (
      SELECT doc_id, y, x,
             (((sx * 31 + sy * 17 + (doc_id - doc_id % 4) * 101 + 7)
               * (sx + sy * 3 + ((doc_id - doc_id % 4) % 89) + 1)) % 251
              + CASE WHEN sy = doc_id % 16 AND sx = doc_id % 24
                     THEN doc_id % 4 ELSE 0 END) % 256 AS val
      FROM px)"""
    if kind == "dhash":
        bits = """bits AS (
      SELECT l.doc_id, l.y * 8 + l.x AS pos, l.val > r.val AS b
      FROM v l JOIN v r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
      WHERE l.x < 8)"""
    else:
        bits = """m AS (SELECT doc_id, AVG(val) AS mu FROM v GROUP BY doc_id),
    bits AS (
      SELECT v.doc_id, v.y * 8 + v.x AS pos, v.val > m.mu AS b
      FROM v JOIN m ON v.doc_id = m.doc_id)"""
    packs = ",\n      ".join(
        f"CAST(SUM(CASE WHEN b AND pos // 16 = {c} THEN 1 << (pos % 16) "
        f"ELSE 0 END) AS INT) AS ch{c}"
        for c in range(4)
    )
    return f"""{ctes},
    {bits},
    h AS (
      SELECT doc_id,
      {packs}
      FROM bits GROUP BY doc_id)"""


def _image_hashed(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import (
        attach_synth_pnm,
        image_perceptual_hash,
    )

    docs = _td(spark, sf_dir).select("doc_id")
    return image_perceptual_hash(
        attach_synth_pnm(docs), "media", "__ph", kind
    )


@query(
    "image_dhash_docs",
    oracle=f"""
    WITH {_image_hash_ctes("dhash")}
    SELECT doc_id, ch0, ch1, ch2, ch3 FROM h ORDER BY doc_id
    """,
    description="Perceptual difference-hash (dHash) of every corpus "
    "image: REAL byte path (P5 PNM encoded, decoded, nearest-resized "
    "to 9x8, gradient-sign bits) in one Arrow mapInPandas pass; the "
    "oracle recomputes the identical hash from the deterministic pixel "
    "formula in pure SQL. Emitted as four 16-bit chunks — the LSH "
    "bucketing key for image_dhash_near_dup.",
)
def q_image_dhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash_chunks

    return (
        _image_hashed(spark, sf_dir, "dhash")
        .select("doc_id", *hash_chunks("__ph"))
        .orderBy("doc_id")
    )


@query(
    "image_ahash_docs",
    oracle=f"""
    WITH {_image_hash_ctes("ahash")}
    SELECT doc_id, ch0, ch1, ch2, ch3 FROM h ORDER BY doc_id
    """,
    description="Perceptual average-hash (aHash): 8x8 above-mean bits "
    "over the same decoded thumbnails (the mean of 64 uint8 samples is "
    "exact in float64, so the comparison replays bit-identically in "
    "SQL). Complements dHash — aHash keys on absolute luminance, dHash "
    "on gradients.",
)
def q_image_ahash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash_chunks

    return (
        _image_hashed(spark, sf_dir, "ahash")
        .select("doc_id", *hash_chunks("__ph"))
        .orderBy("doc_id")
    )


@query(
    "image_dhash_near_dup",
    bench=True,
    oracle=f"""
    WITH {_image_hash_ctes("dhash")}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
              + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3))
              AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
        + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3)) <= 3
    ORDER BY id_a, id_b
    """,
    description="Perceptual near-duplicate image pairs: dHash + the "
    "4x16-bit-chunk pigeonhole candidate join (any pair with hamming "
    "<= 3 shares a whole chunk, so candidates come from an equi-join — "
    "4 tiny rows per image shuffle, pixels never do, no all-pairs "
    "stage). The fixture plants groups of 4 near-identical images "
    "(single-pixel perturbations, intra-group hamming <= 1); the "
    "brute-force SQL oracle proves the bucketed join's recall is "
    "complete at this threshold.",
)
def q_image_dhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash64_near_dup_pairs

    hashed = _image_hashed(spark, sf_dir, "dhash")
    return hash64_near_dup_pairs(hashed, "doc_id", "__ph", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@query(
    "media_near_dup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_image_hash_ctes("dhash")},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
          + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3)) <= 3),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    fullgrid AS (SELECT y.y AS y, x.x AS x
                 FROM generate_series(0, 15) y(y), generate_series(0, 23) x(x)),
    lum AS (
      SELECT i.doc_id,
             CAST(SUM((((g.x * 31 + g.y * 17 + (i.doc_id - i.doc_id % 4) * 101 + 7)
                   * (g.x + g.y * 3 + ((i.doc_id - i.doc_id % 4) % 89) + 1)) % 251
                  + CASE WHEN g.y = i.doc_id % 16 AND g.x = i.doc_id % 24
                         THEN i.doc_id % 4 ELSE 0 END) % 256) AS BIGINT) AS lum
      FROM ids i, fullgrid g GROUP BY i.doc_id),
    members AS (SELECT l.doc_id, l.lum, c.component
                FROM lum l JOIN comp c ON l.doc_id = c.id),
    winners AS (
      SELECT component, doc_id AS winner FROM (
        SELECT component, doc_id,
               ROW_NUMBER() OVER (PARTITION BY component
                   ORDER BY lum DESC, doc_id ASC) AS rn
        FROM members) x WHERE rn = 1),
    losers AS (SELECT m.doc_id FROM members m JOIN winners w
               ON m.component = w.component AND m.doc_id <> w.winner)
    SELECT l.doc_id, l.lum FROM lum l
    WHERE l.doc_id NOT IN (SELECT doc_id FROM losers)
    ORDER BY doc_id
    """,
    description="Media near-dup CLUSTER resolution keeping the BEST "
    "member per group (round-7; VERDICT r6 #2): dhash pigeonhole pairs "
    "-> Pregel min-label connected components -> argmax of an integer "
    "luminance-sum score (ties to lowest id) — the media twin of "
    "dedup_keep_best_quality, replacing keep-min-id, which over-drops "
    "chains (a~b, b~c, a!~c would lose BOTH b and c). Score is the "
    "exact int64 pixel sum, so the oracle replays it from the texture "
    "formula; components via recursive-CTE reachability.",
)
def q_media_near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import (
        attach_synth_pnm,
        image_luminance_sum,
    )
    from azure_etl_spark.plans.corpus_pipeline import media_near_dup_keep_best

    docs = _td(spark, sf_dir).select("doc_id")
    media = image_luminance_sum(
        attach_synth_pnm(docs).withColumn("media_type", F.lit("image/pnm")),
        "media",
        "lum",
    )
    kept = media_near_dup_keep_best(media, keep_by=F.col("lum"))
    return kept.select("doc_id", "lum").orderBy("doc_id")


# --------------------------------------------- unigram-LM tokenizer (r6)


def _uni_lpf(lp: str, piece_expr: str) -> str:
    return f"COALESCE(map_extract({lp}, {piece_expr})[1], -1e9)"


def _uni_viterbi_ctes(
    src: str, src_cols: list[str], lp_cte: str, pfx: str, word: str = "word"
) -> list[str]:
    """Unrolled Viterbi CTE chain replaying operators/unigram.py's two
    folds: forward scores b1..b12 (each CTE references the previous
    ONCE — linear plan, the SQL twin of the engine's aggregate-fold),
    then 12 backtrace steps picking the LONGEST piece that achieves
    the optimal score (exact float equality — both engines evaluate
    the identical expression). Ends at ``{pfx}out``: src_cols + toks."""
    from azure_etl_spark.operators.unigram import PIECE_MAX, WORD_MAX

    ctes = [
        f"{pfx}f0 AS (SELECT s.*, l.lp AS lp, [0.0::DOUBLE] AS B "
        f"FROM {src} s CROSS JOIN {lp_cte} l)"
    ]
    for i in range(1, WORD_MAX + 1):
        cands = []
        for k in range(1, min(PIECE_MAX, i) + 1):
            prev = "0.0" if i == k else f"b{i - k}"
            cands.append(
                f"{prev} + "
                + _uni_lpf("lp", f"substring({word}, {i - k + 1}, {k})")
            )
        expr = f"GREATEST({', '.join(cands)})" if len(cands) > 1 else cands[0]
        ctes.append(f"{pfx}f{i} AS (SELECT *, ({expr}) AS b{i} FROM {pfx}f{i - 1})")
    blist = ", ".join(f"b{i}" for i in range(1, WORD_MAX + 1))
    ctes.append(
        f"{pfx}t0 AS (SELECT *, list_concat(B, [{blist}]) AS BB, "
        f"CAST(length({word}) AS INT) AS p0, CAST([] AS VARCHAR[]) AS tk0 "
        f"FROM {pfx}f{WORD_MAX})"
    )
    for t in range(1, WORD_MAX + 1):
        p = f"p{t - 1}"
        conds = []
        for k in range(PIECE_MAX, 1, -1):
            conds.append(
                f"WHEN {p} >= {k} AND BB[GREATEST({p} + 1, 1)] = "
                f"BB[GREATEST({p} - {k} + 1, 1)] + "
                + _uni_lpf("lp", f"substring({word}, {p} - {k} + 1, {k})")
                + f" THEN {k}"
            )
        kt = f"CASE WHEN {p} <= 0 THEN 0 {' '.join(conds)} ELSE 1 END"
        ctes.append(
            f"{pfx}t{t} AS (SELECT *, ({kt}) AS k{t}, "
            f"({p} - ({kt})) AS p{t}, "
            f"CASE WHEN ({kt}) = 0 THEN tk{t - 1} ELSE "
            f"list_append(tk{t - 1}, substring({word}, {p} - ({kt}) + 1, ({kt}))) "
            f"END AS tk{t} FROM {pfx}t{t - 1})"
        )
    cols = ", ".join(src_cols)
    ctes.append(
        f"{pfx}out AS (SELECT {cols}, list_reverse(tk{WORD_MAX}) AS toks "
        f"FROM {pfx}t{WORD_MAX})"
    )
    return ctes


def _uni_lp_cte(name: str, vocab_cte: str) -> str:
    # MATERIALIZED is load-bearing: the 1-row map is referenced by 36+
    # lookups per pass; inlined, DuckDB would rebuild it per reference
    return (
        f"{name} AS MATERIALIZED (SELECT map(list(piece ORDER BY piece), "
        f"list(ln(n) - ln(tt.t) ORDER BY piece)) AS lp "
        f"FROM {vocab_cte} CROSS JOIN (SELECT SUM(n) AS t FROM {vocab_cte}) tt "
        f"GROUP BY tt.t)"
    )


def _uni_train_ctes() -> list[str]:
    """Seed + EM_ITERS unrolled Viterbi-EM rounds, ending at vocab2
    (piece, n) and its log-prob map lp2 — the SQL replay of
    operators/unigram.unigram_train (spec: operators/unigram_ref.py)."""
    from azure_etl_spark.operators.unigram import (
        EM_ITERS,
        PIECE_MAX,
        SEED_MULTI,
        WORD_MAX,
    )

    ctes = [
        _bpe_word_cte(),
        f"wfl AS (SELECT word, cnt FROM wf WHERE length(word) <= {WORD_MAX})",
        f"""sub AS (
      SELECT substring(word, i.i, k.k) AS piece, CAST(SUM(cnt) AS BIGINT) AS n
      FROM wfl, generate_series(1, {WORD_MAX}) i(i),
           generate_series(1, {PIECE_MAX}) k(k)
      WHERE i.i + k.k - 1 <= length(word) GROUP BY 1)""",
        f"""seed_multi AS (SELECT piece, n FROM sub WHERE length(piece) > 1
      ORDER BY n DESC, piece LIMIT {SEED_MULTI})""",
        """seed AS MATERIALIZED (SELECT piece, n FROM sub WHERE length(piece) = 1
      UNION ALL SELECT piece, n FROM seed_multi)""",
        _uni_lp_cte("lp0", "seed"),
    ]
    prev_vocab = "seed"
    for r in range(1, EM_ITERS + 1):
        ctes += _uni_viterbi_ctes("wfl", ["word", "cnt"], f"lp{r - 1}", f"v{r}_")
        ctes.append(
            f"""uses{r} AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u
      FROM (SELECT unnest(toks) AS piece, cnt FROM v{r}_out) GROUP BY piece)"""
        )
        ctes.append(
            f"""vocab{r} AS MATERIALIZED (
      SELECT s.piece,
             (COALESCE(u.u, 0) + CASE WHEN length(s.piece) = 1 THEN 1 ELSE 0 END) AS n
      FROM {prev_vocab} s LEFT JOIN uses{r} u ON s.piece = u.piece
      WHERE (COALESCE(u.u, 0) + CASE WHEN length(s.piece) = 1 THEN 1 ELSE 0 END) > 0)"""
        )
        ctes.append(_uni_lp_cte(f"lp{r}", f"vocab{r}"))
        prev_vocab = f"vocab{r}"
    return ctes


def _unigram_train_oracle() -> str:
    return (
        f"WITH {', '.join(_uni_train_ctes())}\n"
        "SELECT piece, CAST(n AS BIGINT) AS n_uses, "
        "ROUND(ln(n) - ln(tt.t), 6) AS logp "
        "FROM vocab2 CROSS JOIN (SELECT SUM(n) AS t FROM vocab2) tt "
        "ORDER BY piece"
    )


def _unigram_encode_oracle() -> str:
    from azure_etl_spark.operators.unigram import EM_ITERS, WORD_MAX

    ctes = _uni_train_ctes()
    ctes.append(r"""dwords AS (
      SELECT doc_id, s.pos AS pos, s.w AS w FROM (
        SELECT doc_id,
               unnest(list_transform(
                 list_filter(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                             ELSE string_split_regex(trim(lower(text)), '\s+') END,
                             x -> regexp_matches(x, '^[a-z]+$')),
                 (x, i) -> struct_pack(w := x, pos := i))) AS s
        FROM documents) t)""")
    ctes.append(
        f"dshort AS (SELECT DISTINCT w AS word FROM dwords "
        f"WHERE length(w) <= {WORD_MAX})"
    )
    ctes += _uni_viterbi_ctes("dshort", ["word"], f"lp{EM_ITERS}", "e_")
    ctes.append(f"""enc AS (
      SELECT d.doc_id, d.pos,
             CASE WHEN length(d.w) > {WORD_MAX} THEN [d.w] ELSE s.toks END AS toks
      FROM dwords d LEFT JOIN e_out s ON d.w = s.word)""")
    ctes.append("""docagg AS (
      SELECT doc_id, flatten(list(toks ORDER BY pos)) AS toks
      FROM enc GROUP BY doc_id)""")
    return (
        f"WITH {', '.join(ctes)}\n"
        "SELECT d.doc_id, CAST(COALESCE(len(a.toks), 0) AS INT) AS n_tokens, "
        "COALESCE(array_to_string(a.toks, ' '), '') AS tok_str "
        "FROM documents d LEFT JOIN docagg a ON d.doc_id = a.doc_id "
        "ORDER BY d.doc_id"
    )


@query(
    "unigram_train_vocab",
    oracle=_unigram_train_oracle,
    description="Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer "
    "training via deterministic fixed-iteration Viterbi-EM: substring "
    "seed vocabulary (top-60 multi-char pieces + all chars), then 2 "
    "hard-EM rounds — Viterbi-segment the Heaps-law-bounded word "
    "table under broadcast piece log-probs (the DP is an aggregate "
    "FOLD, pure codegen, unrolled to 12 static steps), count uses, "
    "renormalize with char add-one smoothing. Corpus touched once; "
    "per-round cost is O(|vocab words|). Oracle unrolls both EM "
    "rounds as chained CTEs (materialized log-prob maps).",
)
def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.tokenize import word_frequencies
    from azure_etl_spark.operators.unigram import unigram_train

    vocab = unigram_train(word_frequencies(_td(spark, sf_dir)))
    return vocab.select(
        "piece", "n_uses", F.round("logp", 6).alias("logp")
    ).orderBy("piece")


@query(
    "unigram_encode_docs",
    oracle=_unigram_encode_oracle,
    description="Encode the corpus with the trained unigram-LM "
    "vocabulary: only DISTINCT words run the Viterbi DP (ties -> "
    "longest piece), each occurrence pays one join; words beyond the "
    "length cap pass through as single OOV tokens; empty docs emit "
    "zero tokens (left join + coalesce). Oracle replays train + "
    "encode end-to-end in one unrolled CTE chain.",
)
def q_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.tokenize import word_frequencies
    from azure_etl_spark.operators.unigram import unigram_encode, unigram_train

    docs = _td(spark, sf_dir)
    vocab = unigram_train(word_frequencies(docs))
    enc = unigram_encode(docs, vocab.select("piece", F.col("n_uses").alias("n_occ")))
    return enc.select(
        "doc_id",
        F.col("n_uni_tokens").alias("n_tokens"),
        F.concat_ws(" ", "uni_tokens").alias("tok_str"),
    ).orderBy("doc_id")


# --------------------------------------------- WordPiece tokenizer (r7)


_WP_N_MERGES = 8


def _wp_round_ctes(n_merges: int) -> list[str]:
    """CTE chain replaying wordpiece_train (operators/wordpiece.py):
    w0 = sentinel symbol strings with ## continuation markers, then per
    round r: symbol counts y{r}, pair counts c{r}, the likelihood-ratio
    argmax b{r} (score = pair/(n_lhs*n_rhs) in DOUBLE — identical ops
    both engines — desc, RS-joined pair key asc), and the guarded
    greedy leftmost merge w{r} (same exhausted-vocab LEFT JOIN +
    COALESCE guard as the BPE chain)."""
    from azure_etl_spark.operators.tokenize import DSEP, PSEP, SEP

    ctes = [
        _bpe_word_cte(),
        f"""w0 AS (
      SELECT '{SEP}' || array_to_string(
               CASE WHEN length(word) = 1 THEN [word]
                    ELSE list_prepend(word[1:1],
                           list_transform(string_split(word[2:], ''),
                                          c -> '##' || c)) END,
               '{DSEP}') || '{SEP}' AS s,
             cnt
      FROM wf)""",
    ]
    for r in range(1, n_merges + 1):
        ctes.append(f"""y{r} AS MATERIALIZED (
      SELECT sym, CAST(SUM(cnt) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(substring(s, 2, length(s) - 2), '{DSEP}')) AS sym,
               cnt
        FROM w{r - 1}) t GROUP BY sym)""")
        ctes.append(f"""p{r} AS (
      SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
                    i -> struct_pack(lhs := arr[i], rhs := arr[i + 1]))) AS pr, cnt
      FROM (SELECT string_split(substring(s, 2, length(s) - 2), '{DSEP}') AS arr, cnt
            FROM w{r - 1}) t)""")
        ctes.append(f"""c{r} AS (
      SELECT pr.lhs AS lhs, pr.rhs AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM p{r} GROUP BY 1, 2)""")
        ctes.append(f"""b{r} AS MATERIALIZED (
      SELECT lhs, rhs, lhs || substring(rhs, 3) AS merged, pair_count,
             CAST(pair_count AS DOUBLE) / (CAST(sl.n AS DOUBLE) * CAST(sr.n AS DOUBLE))
               AS score,
             '{SEP}' || lhs || '{DSEP}' || rhs || '{SEP}' AS pat,
             '{SEP}' || lhs || substring(rhs, 3) || '{SEP}' AS rep
      FROM c{r} JOIN y{r} sl ON sl.sym = c{r}.lhs JOIN y{r} sr ON sr.sym = c{r}.rhs
      ORDER BY score DESC, lhs || '{PSEP}' || rhs ASC LIMIT 1)""")
        ctes.append(f"""w{r} AS (
      SELECT COALESCE(replace(s, b.pat, b.rep), s) AS s, cnt
      FROM w{r - 1} LEFT JOIN b{r} b ON TRUE)""")
    return ctes


def _wp_train_oracle() -> str:
    n = _WP_N_MERGES
    union = "\n      UNION ALL ".join(
        f"SELECT {r} AS rank, lhs, rhs, merged, pair_count, score FROM b{r}"
        for r in range(1, n + 1)
    )
    return f"""
    WITH {', '.join(_wp_round_ctes(n))}
    SELECT rank, lhs, rhs, merged, pair_count, score FROM ({union}) u ORDER BY rank
    """


def _wp_encode_oracle() -> str:
    from azure_etl_spark.operators.tokenize import DSEP
    from azure_etl_spark.operators.wordpiece import WP_WORD_MAX

    n = _WP_N_MERGES
    ctes = _wp_round_ctes(n)
    # grow-only vocab: initial alphabet + one merged piece per round,
    # MATERIALIZED because every match step probes it
    merged_union = " UNION SELECT merged FROM ".join(
        ["v0"] + [f"b{r}" for r in range(1, n + 1)]
    )
    ctes.append(f"""v0 AS (
      SELECT DISTINCT unnest(string_split(substring(s, 2, length(s) - 2), '{DSEP}'))
               AS merged
      FROM w0)""")
    ctes.append(
        f"vl AS MATERIALIZED (SELECT list(merged) AS v FROM "
        f"(SELECT merged FROM {merged_union}) u)"
    )
    ctes.append(r"""dwords AS (
      SELECT doc_id, s.pos AS pos, s.w AS w FROM (
        SELECT doc_id,
               unnest(list_transform(
                 list_filter(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                             ELSE string_split_regex(trim(lower(text)), '\s+') END,
                             x -> regexp_matches(x, '^[a-z]+$')),
                 (x, i) -> struct_pack(w := x, pos := i))) AS s
        FROM documents) t)""")
    ctes.append(
        f"dshort AS (SELECT DISTINCT w AS word FROM dwords "
        f"WHERE length(w) <= {WP_WORD_MAX})"
    )
    # greedy longest-match fold, unrolled: per step the inner select
    # computes done + the longest matching k (CASE tries long -> short),
    # the outer advances (p, tk, fail) — each CTE references the
    # previous exactly once, so the chain stays linear
    ctes.append("""g0 AS (
      SELECT word, v, 1 AS p, CAST([] AS VARCHAR[]) AS tk, FALSE AS fail
      FROM dshort CROSS JOIN vl)""")
    for t in range(1, WP_WORD_MAX + 1):
        cases = " ".join(
            f"WHEN p + {k - 1} <= length(word) AND list_contains(v, "
            f"CASE WHEN p = 1 THEN substring(word, p, {k}) "
            f"ELSE '##' || substring(word, p, {k}) END) THEN {k}"
            for k in range(WP_WORD_MAX, 0, -1)
        )
        ctes.append(f"""g{t} AS (
      SELECT word, v,
             CASE WHEN done OR k = 0 THEN p ELSE p + k END AS p,
             CASE WHEN done OR k = 0 THEN tk
                  ELSE list_append(tk, CASE WHEN p = 1 THEN substring(word, p, k)
                                       ELSE '##' || substring(word, p, k) END) END AS tk,
             CASE WHEN done THEN fail WHEN k = 0 THEN TRUE ELSE fail END AS fail
      FROM (SELECT *, (fail OR p > length(word)) AS done,
                   (CASE WHEN fail OR p > length(word) THEN 0 {cases}
                         ELSE 0 END) AS k
            FROM g{t - 1}) s)""")
    ctes.append(f"""seg AS (
      SELECT word, CASE WHEN fail THEN ['[UNK]'] ELSE tk END AS toks
      FROM g{WP_WORD_MAX})""")
    ctes.append(f"""enc AS (
      SELECT d.doc_id, d.pos,
             CASE WHEN length(d.w) > {WP_WORD_MAX} THEN ['[UNK]'] ELSE s.toks END
               AS toks
      FROM dwords d LEFT JOIN seg s ON d.w = s.word)""")
    ctes.append("""docagg AS (
      SELECT doc_id, flatten(list(toks ORDER BY pos)) AS toks
      FROM enc GROUP BY doc_id)""")
    return (
        f"WITH {', '.join(ctes)}\n"
        "SELECT d.doc_id, CAST(COALESCE(len(a.toks), 0) AS INT) AS n_wp_tokens, "
        "COALESCE(array_to_string(a.toks, ' '), '') AS tok_str "
        "FROM documents d LEFT JOIN docagg a ON d.doc_id = a.doc_id "
        "ORDER BY d.doc_id"
    )


@query(
    "wordpiece_train",
    oracle=_wp_train_oracle,
    description="WordPiece tokenizer training (Schuster & Nakajima "
    "2012 / BERT): same one-shuffle word-frequency scan and per-round "
    "1-row argmax as BPE, but the merge maximizes the likelihood-ratio "
    "score pair/(n_lhs*n_rhs) and non-initial symbols carry the ## "
    "continuation marker (merging strips it from the rhs). Completes "
    "the production tokenizer family (BPE, unigram-LM, WordPiece). "
    "Oracle unrolls all 8 rounds with the identical double-precision "
    "score argmax.",
)
def q_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.wordpiece import wordpiece_train, word_frequencies

    merges, _ = wordpiece_train(word_frequencies(_td(spark, sf_dir)), _WP_N_MERGES)
    return merges.orderBy("rank")


@query(
    "wordpiece_encode_docs",
    oracle=_wp_encode_oracle,
    description="Encode the corpus with the trained WordPiece vocab "
    "via greedy longest-match-first (the published algorithm, unlike "
    "BPE's merge replay): per word an aggregate FOLD consumes the "
    "longest vocab piece at each position (## form when non-initial), "
    "falling to [UNK] when nothing matches or the word exceeds the "
    "length cap. Only DISTINCT words run the fold; the vocab rides as "
    "a broadcast map. Oracle replays train + the unrolled match loop "
    "end-to-end.",
)
def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.wordpiece import (
        word_frequencies,
        wordpiece_encode,
        wordpiece_train,
        wordpiece_vocab,
    )

    docs = _td(spark, sf_dir)
    words = word_frequencies(docs)
    _, rounds = wordpiece_train(words, _WP_N_MERGES)
    enc = wordpiece_encode(docs, wordpiece_vocab(words, rounds))
    return enc.select(
        "doc_id",
        "n_wp_tokens",
        F.concat_ws(" ", "wp_tokens").alias("tok_str"),
    ).orderBy("doc_id")


# ------------------------------------- hashed n-gram quality features (r6)


def _hashed_logreg_oracle(
    n_buckets: int = 8, n: int = 3, iters: int = 3, lr: float = 0.5
) -> str:
    """Replays hashed_ngram_features + logreg end-to-end: char 3-grams
    -> md5 first-8-hex-digits bucket (digit-by-digit base-16 value, the
    simhash_md5_chunks trick — Spark's conv() computes the identical
    integer), bucket-fraction features, then the same unrolled
    zero-init GD as _logreg_oracle over the 1+n_buckets features."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring(md5(g), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    xcols = ",\n             ".join(
        f"CASE WHEN len(bk) = 0 THEN 0.0 ELSE "
        f"CAST(len(list_filter(bk, v -> v = {b})) AS DOUBLE) / len(bk) END"
        f" AS x{b + 1}"
        for b in range(n_buckets)
    )
    feats = [f"x{j}" for j in range(n_buckets + 1)]
    wcols = [f"w{j}" for j in range(n_buckets + 1)]

    def zexpr(alias: str) -> str:
        return " + ".join(f"{alias}.{w} * {x}" for w, x in zip(wcols, feats))

    ctes = [
        f"""gr AS (
      SELECT doc_id, y,
             CASE WHEN length(s) < {n} THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, length(s) - {n - 1}),
                                      i -> substring(s, i, {n})) END AS grams
      FROM (SELECT doc_id, trim(lower(text)) AS s,
                   CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
            FROM documents) t)""",
        f"""bkt AS (SELECT doc_id, y,
             list_transform(grams, g -> ({digits}) % {n_buckets}) AS bk
      FROM gr)""",
        f"""feats AS MATERIALIZED (
      SELECT doc_id, y, 1.0 AS x0,
             {xcols}
      FROM bkt)""",
        "winit AS (SELECT " + ", ".join(f"0.0 AS {w}" for w in wcols) + ")",
    ]
    prev = "winit"
    for it in range(1, iters + 1):
        g = ", ".join(
            f"AVG((1.0 / (1.0 + exp(-({zexpr('w')}))) - y) * {x}) AS g{j}"
            for j, x in enumerate(feats)
        )
        ctes.append(f"g{it} AS (SELECT {g} FROM feats CROSS JOIN {prev} w)")
        upd = ", ".join(
            f"w.{wc} - {lr} * g.g{j} AS {wc}" for j, wc in enumerate(wcols)
        )
        ctes.append(f"wit{it} AS (SELECT {upd} FROM {prev} w CROSS JOIN g{it} g)")
        prev = f"wit{it}"
    return f"""
    WITH {', '.join(ctes)}
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-({zexpr('w')}))), 5) AS prob,
           CAST(y AS INT) AS label
    FROM feats CROSS JOIN {prev} w
    WHERE doc_id < 300 ORDER BY doc_id
    """


@query(
    "logreg_hashed_ngram_quality",
    oracle=_hashed_logreg_oracle,
    description="The quality classifier on RAW TEXT via the hashing "
    "trick (fastText's input shape, Joulin et al. 2016): char 3-grams "
    "hashed into 8 fixed buckets, bucket-fraction features, then the "
    "same 3-step distributed-GD logistic regression as "
    "logreg_quality_filter. No vocabulary table to build or ship — "
    "feature width is fixed regardless of corpus size, the whole "
    "point at 100 TB. All in-row HOFs (one grams array, one bucket "
    "array, filtered counts), no explode, no shuffle beyond the "
    "gradient aggregate. Oracle replays hashing digit-by-digit and "
    "unrolls the GD.",
)
def q_logreg_hashed_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.quality import (
        hashed_ngram_features,
        logreg_fit,
        logreg_score,
    )

    docs = _td(spark, sf_dir)
    lab = docs.withColumn(
        "y", F.when(F.col("source") == "src0", F.lit(1.0)).otherwise(F.lit(0.0))
    )
    feats = hashed_ngram_features(lab, n_buckets=8).withColumn("x0", F.lit(1.0))
    cols = [f"x{j}" for j in range(9)]
    w = logreg_fit(feats, cols, "y", iters=3, lr=0.5)
    return (
        logreg_score(feats, cols, w)
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.round("prob", 5).alias("prob"),
            F.col("y").cast("int").alias("label"),
        )
        .orderBy("doc_id")
    )


# ----------------------------------------- perceptual audio dedup (r6)


def _audio_fp_ctes() -> str:
    """CTE chain recomputing the audio fingerprint in pure SQL
    (operators/audiohash.py): the deterministic int16 sample formula,
    integer stride-band energies, Haitsma-Kalker difference-of-
    difference sign bits, packed into ch0..ch3 (same 16-bit chunk
    packing as the engine's shiftrightunsigned & 0xFFFF)."""
    base = "(doc_id - doc_id % 4)"
    fmod = (
        f"(((i + 3) * ({base} % 97 + 5) * 31 + {base} * 17"
        f" + (i * i % 13) * ({base} % 41 + 1)) % 2003)"
    )
    val = (
        f"CASE WHEN i = doc_id % 324 THEN (({fmod} + (doc_id % 4) * 50) % 2003)"
        f" - 1001 ELSE {fmod} - 1001 END"
    )
    packs = ",\n      ".join(
        f"CAST(SUM(CASE WHEN bset AND pos // 16 = {c} THEN 1 << (pos % 16) "
        f"ELSE 0 END) AS INT) AS ch{c}"
        for c in range(4)
    )
    return f"""samp AS (
      SELECT d.doc_id, i.i AS i, ({val}) AS s
      FROM (SELECT doc_id FROM documents) d, generate_series(0, 323) i(i)),
    en AS (
      SELECT doc_id, i // 36 AS t, (i % 36) % 9 AS b,
             CAST(SUM(s * s) AS BIGINT) AS e
      FROM samp GROUP BY 1, 2, 3),
    diff AS (
      SELECT l.doc_id, l.t, l.b, l.e - r.e AS d
      FROM en l JOIN en r ON l.doc_id = r.doc_id AND l.t = r.t
                         AND r.b = l.b + 1
      WHERE l.b < 8),
    abits AS (
      SELECT lo.doc_id, lo.t * 8 + lo.b AS pos, hi.d > lo.d AS bset
      FROM diff lo JOIN diff hi ON lo.doc_id = hi.doc_id
                               AND hi.t = lo.t + 1 AND hi.b = lo.b
      WHERE lo.t < 8),
    h AS (
      SELECT doc_id,
      {packs}
      FROM abits GROUP BY doc_id)"""


def _audio_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.audiohash import (
        attach_synth_wav,
        audio_perceptual_hash,
    )

    docs = _td(spark, sf_dir).select("doc_id")
    return audio_perceptual_hash(attach_synth_wav(docs), "media", "__ph")


@query(
    "audio_fp_docs",
    oracle=f"""
    WITH {_audio_fp_ctes()}
    SELECT doc_id, ch0, ch1, ch2, ch3 FROM h ORDER BY doc_id
    """,
    description="Perceptual audio fingerprint (Haitsma-Kalker 2002 "
    "robust-hash bit derivation over integer stride-band energies) of "
    "every corpus clip: REAL byte path (16-bit PCM WAV encoded, "
    "decoded, energy grid, difference-of-difference sign bits) in one "
    "Arrow mapInPandas pass; the oracle recomputes the identical "
    "fingerprint from the deterministic sample formula in pure SQL. "
    "Emitted as four 16-bit chunks — the LSH bucketing key.",
)
def q_audio_fp_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash_chunks

    return (
        _audio_hashed(spark, sf_dir)
        .select("doc_id", *hash_chunks("__ph"))
        .orderBy("doc_id")
    )


@query(
    "audio_fp_near_dup",
    bench=True,
    oracle=f"""
    WITH {_audio_fp_ctes()}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
              + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3))
              AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
        + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3)) <= 3
    ORDER BY id_a, id_b
    """,
    description="Perceptual near-duplicate audio pairs: the "
    "fingerprint + the same 4x16-bit-chunk pigeonhole candidate join "
    "as image/simhash near-dup (complete recall at hamming <= 3, "
    "equi-join candidates, bit_count verify; samples never shuffle). "
    "Fixture plants groups of 4 single-sample-perturbed clips "
    "(596/600 planted pairs within threshold, 0 cross-group); the "
    "brute-force SQL oracle proves the bucketed join finds exactly "
    "the same pair set.",
)
def q_audio_fp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash64_near_dup_pairs

    hashed = _audio_hashed(spark, sf_dir)
    return hash64_near_dup_pairs(hashed, "doc_id", "__ph", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


# ------------------------------------ 128-bit image dhash (scale path)


def _image_hash128_ctes() -> str:
    """128-bit dhash oracle: same texture formula as the 64-bit image
    oracle but a 9x16 thumbnail (16 rows of gradient bits), packed into
    eight 16-bit chunk values ch0..ch7 for brute-force hamming."""
    packs = ",\n      ".join(
        f"CAST(SUM(CASE WHEN b AND pos // 16 = {c} THEN 1 << (pos % 16) "
        f"ELSE 0 END) AS INT) AS ch{c}"
        for c in range(8)
    )
    return f"""ids AS (SELECT doc_id FROM documents),
    grid AS (
      SELECT y.y AS y, x.x AS x
      FROM generate_series(0, 15) y(y), generate_series(0, 8) x(x)),
    px AS (
      SELECT i.doc_id, g.y, g.x,
             LEAST(CAST(FLOOR((g.y + 0.5) * 16.0 / 16) AS INT), 15) AS sy,
             LEAST(CAST(FLOOR((g.x + 0.5) * 24.0 / 9) AS INT), 23) AS sx
      FROM ids i, grid g),
    v AS (
      SELECT doc_id, y, x,
             (((sx * 31 + sy * 17 + (doc_id - doc_id % 4) * 101 + 7)
               * (sx + sy * 3 + ((doc_id - doc_id % 4) % 89) + 1)) % 251
              + CASE WHEN sy = doc_id % 16 AND sx = doc_id % 24
                     THEN doc_id % 4 ELSE 0 END) % 256 AS val
      FROM px),
    bits AS (
      SELECT l.doc_id, l.y * 8 + l.x AS pos, l.val > r.val AS b
      FROM v l JOIN v r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
      WHERE l.x < 8),
    h AS (
      SELECT doc_id,
      {packs}
      FROM bits GROUP BY doc_id)"""


_H128_HAM = " + ".join(
    f"bit_count(xor(a.ch{c}, b.ch{c}))" for c in range(8)
)


@query(
    "image_dhash128_near_dup",
    oracle=f"""
    WITH {_image_hash128_ctes()}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST({_H128_HAM} AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE {_H128_HAM} <= 3
    ORDER BY id_a, id_b
    """,
    description="The billion-item scale path for perceptual image "
    "dedup: a 128-bit dhash (9x16 thumbnail, two int64 words) paired "
    "via 4 x 32-BIT pigeonhole chunks — same completeness at hamming "
    "<= 3 (a local edit flips the same few bits at any signature "
    "length), but per-chunk collision rate n/2^32, so buckets stay "
    "collision-free to ~4e9 items where the 64-bit/16-bit-chunk "
    "variant's birthday term (measured, SCALE.md media scaling) would "
    "dominate. Multi-index-hashing sizing rule: bits-per-chunk >= "
    "log2(n).",
)
def q_image_dhash128_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import (
        attach_synth_pnm,
        hash128_near_dup_pairs,
        image_perceptual_hash128,
    )

    docs = _td(spark, sf_dir).select("doc_id")
    hashed = image_perceptual_hash128(attach_synth_pnm(docs), "media", "dh")
    return hash128_near_dup_pairs(
        hashed, "doc_id", "dh0", "dh1", max_hamming=3
    ).orderBy("id_a", "id_b")


# ----------------------------------------- perceptual video dedup (r6)


def _video_fp_ctes() -> str:
    """CTE chain recomputing the temporally-pooled clip dhash in pure
    SQL: per sampled thumbnail pixel, the integer mean (sum // n) of
    the four frame textures (with the one perturbed frame-pixel), then
    the same dhash gradient bits + 16-bit chunk packing as the still
    image oracle."""
    base = "(doc_id - doc_id % 4)"

    def frame_val(f: int) -> str:
        p = (
            f"(((sx * 31 + sy * 17 + {base} * 101 + {f} * 59 + 7)"
            f" * (sx + sy * 3 + {f} + ({base} % 89) + 1)) % 251)"
        )
        return (
            f"CASE WHEN {f} = doc_id % 4 AND sy = doc_id % 16"
            f" AND sx = doc_id % 24"
            f" THEN ({p} + (doc_id % 4) * 40) % 256 ELSE {p} END"
        )

    pooled = "(" + " + ".join(frame_val(f) for f in range(4)) + ") // 4"
    packs = ",\n      ".join(
        f"CAST(SUM(CASE WHEN b AND pos // 16 = {c} THEN 1 << (pos % 16) "
        f"ELSE 0 END) AS INT) AS ch{c}"
        for c in range(4)
    )
    return f"""ids AS (SELECT doc_id FROM documents),
    grid AS (
      SELECT y.y AS y, x.x AS x
      FROM generate_series(0, 7) y(y), generate_series(0, 8) x(x)),
    px AS (
      SELECT i.doc_id, g.y, g.x,
             LEAST(CAST(FLOOR((g.y + 0.5) * 16.0 / 8) AS INT), 15) AS sy,
             LEAST(CAST(FLOOR((g.x + 0.5) * 24.0 / 9) AS INT), 23) AS sx
      FROM ids i, grid g),
    v AS (
      SELECT doc_id, y, x, ({pooled}) AS val
      FROM px),
    bits AS (
      SELECT l.doc_id, l.y * 8 + l.x AS pos, l.val > r.val AS b
      FROM v l JOIN v r ON l.doc_id = r.doc_id AND l.y = r.y AND r.x = l.x + 1
      WHERE l.x < 8),
    h AS (
      SELECT doc_id,
      {packs}
      FROM bits GROUP BY doc_id)"""


def _video_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import (
        attach_synth_pnm_stream,
        video_pooled_dhash,
    )

    docs = _td(spark, sf_dir).select("doc_id")
    return video_pooled_dhash(attach_synth_pnm_stream(docs), "media", "__ph")


@query(
    "video_fp_docs",
    oracle=f"""
    WITH {_video_fp_ctes()}
    SELECT doc_id, ch0, ch1, ch2, ch3 FROM h ORDER BY doc_id
    """,
    description="Temporally-pooled clip fingerprint for the "
    "concatenated-PNM video format: decode the frame stream, pool to "
    "one INTEGER-mean thumbnail (sum // n, exact), dhash it — one "
    "Arrow mapInPandas pass over real clip bytes; the oracle replays "
    "the pooled pixel formula and hash in pure SQL. Emitted as four "
    "16-bit chunks.",
)
def q_video_fp_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash_chunks

    return (
        _video_hashed(spark, sf_dir)
        .select("doc_id", *hash_chunks("__ph"))
        .orderBy("doc_id")
    )


@query(
    "video_fp_near_dup",
    bench=True,
    oracle=f"""
    WITH {_video_fp_ctes()}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
              + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3))
              AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
        + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3)) <= 3
    ORDER BY id_a, id_b
    """,
    description="Near-duplicate video clips: one frame edited out of "
    "four still lands within hamming 2 of its group after integer-mean "
    "pooling (measured: 600/600 planted pairs, 561 exact, none across "
    "groups), and the shared 4x16-bit pigeonhole chunk join finds "
    "exactly the brute-force pair set — clips never shuffle, no "
    "all-pairs stage, the third modality on the same dedup machinery.",
)
def q_video_fp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.imagehash import hash64_near_dup_pairs

    hashed = _video_hashed(spark, sf_dir)
    return hash64_near_dup_pairs(hashed, "doc_id", "__ph", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


# ------------------------------------------- mergeable sketches (r7)


def _md5_bucket_sql(expr: str, width: int) -> str:
    """DuckDB replay of operators/sketch._row_hash % width: the first
    8 hex digits of md5(expr) as a base-16 integer, digit-by-digit
    (identical to Spark's conv(substring(md5(..),1,8),16,10))."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring(md5({expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({digits}) % {width})"


@query(
    "cms_join_size_orders_customer",
    oracle=f"""
    WITH rr AS (SELECT unnest([0, 1, 2]) AS r),
    ca AS MATERIALIZED (
      SELECT r,
             {_md5_bucket_sql("CAST(r AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)", 512)} AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders CROSS JOIN rr GROUP BY 1, 2),
    cb AS MATERIALIZED (
      SELECT r,
             {_md5_bucket_sql("CAST(r AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)", 512)} AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer CROSS JOIN rr GROUP BY 1, 2),
    ip AS (SELECT ca.r, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS ip
           FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b GROUP BY 1),
    rows_axis AS (SELECT DISTINCT r FROM (SELECT r FROM ca UNION ALL SELECT r FROM cb)),
    per_row AS (SELECT COALESCE(ip.ip, 0) AS ip
                FROM rows_axis LEFT JOIN ip ON rows_axis.r = ip.r),
    est AS (SELECT CAST(COALESCE(MIN(ip), 0) AS BIGINT) AS est FROM per_row),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT ex.n_exact, est.est FROM ex CROSS JOIN est
    """,
    description="Equi-join output-cardinality estimate from two CMS "
    "counter-tables (operators/sketch.cms_join_size_estimate — the "
    "classic AGMS/CMS inner-product estimator): true join size = "
    "sum_v cnt_a(v)*cnt_b(v); each hash row's bucket-wise inner "
    "product overcounts it only by colliding cross terms, so min over "
    "rows >= true always. The planner-style 'how badly does this join "
    "blow up' answer computed from two <= depth*width-row persisted "
    "sketches BEFORE committing a 100 TB shuffle — the decision never "
    "touches the data. Pure BIGINT; the oracle replays the salted-md5 "
    "buckets digit-by-digit and the exact join size rides along to "
    "exhibit the one-sided guarantee.",
)
def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sketch import cms_join_size_estimate, cms_table

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    sa = cms_table(o, "o_custkey", depth=3, width=512)
    sb = cms_table(c, "c_custkey", depth=3, width=512)
    est = cms_join_size_estimate(sa, sb)
    exact = o.join(c, o.o_custkey == c.c_custkey).agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    return exact.crossJoin(F.broadcast(est)).select("n_exact", "est")


@query(
    "bloom_pruned_join_orders",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o.o_totalprice) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1 ORDER BY 1
    """,
    description="Bloom semi-join reduction (operators/sketch.py): the "
    "dim key-set (BUILDING customers) folds into a (word, bits) "
    "bit-table, the fact side is pruned by k=3 map-side broadcast "
    "probes BEFORE its shuffle, then the exact join removes Bloom "
    "false positives — so the result is provably identical to the "
    "plain join (the oracle). The deterministic, persistable sibling "
    "of Spark's transient runtime bloom filter: at 100 TB the "
    "non-matching fact bulk dies before any Exchange.",
)
def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sketch import bloom_pruned_join

    o = _t(spark, sf_dir, "orders")
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    j = bloom_pruned_join(o, c, "o_custkey", "c_custkey", num_bits=1 << 14, k=3)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "cms_word_freq_docs",
    oracle=f"""
    WITH w AS MATERIALIZED (
      SELECT unnest({_WORDS_SQL}) AS word FROM documents),
    cnt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM w GROUP BY 1),
    top AS MATERIALIZED (
      SELECT word, n_exact FROM cnt ORDER BY n_exact DESC, word LIMIT 12),
    rr AS (SELECT unnest([0, 1, 2]) AS r),
    counters AS MATERIALIZED (
      SELECT r, {_md5_bucket_sql("CAST(r AS VARCHAR) || ':' || word", 256)} AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w CROSS JOIN rr GROUP BY 1, 2),
    probes AS (
      SELECT t.word, t.n_exact, rr.r,
             {_md5_bucket_sql("CAST(rr.r AS VARCHAR) || ':' || t.word", 256)} AS b
      FROM top t CROSS JOIN rr)
    SELECT p.word, ANY_VALUE(p.n_exact) AS n_exact,
           CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
    FROM probes p LEFT JOIN counters c ON p.r = c.r AND p.b = c.b
    GROUP BY p.word ORDER BY p.word
    """,
    description="Count-min sketch word frequencies (operators/"
    "sketch.py, Cormode & Muthukrishnan 2005): depth 3 x width 256 "
    "counter-table built in one explode + one bounded aggregate, "
    "point estimates = min over the depth counters for the exact "
    "top-12 words. est >= exact always; collisions inflate both "
    "engines identically because the salted-md5 bucket hash is "
    "replayed digit-by-digit in the oracle. The table is mergeable "
    "(union + sum) — build per shard/day, merge cheap.",
    bench=True,
)
def q_cms_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import cms_estimate, cms_table

    docs = _td(spark, sf_dir)
    words = docs.select(
        F.explode(F.split(normalized_text("text"), " ")).alias("word")
    )
    # ONE corpus pass (round 13): the exact word-count aggregate feeds
    # BOTH consumers — the top-12 and, via cms_table(weight=), the
    # sketch counters (sum of per-word counts per bucket == count of
    # raw occurrences per bucket, exactly). Exchange reuse dedupes the
    # aggregate across its consumers at runtime (verified round 13
    # with completed-task accounting: 38 executed tasks, one
    # corpus-sized stage, identical with and without an explicit
    # localCheckpoint — an earlier round-13 claim that broadcast
    # futures re-ran the pass 4x counted SKIPPED stages and was
    # corrected; the interposed checkpoint was removed as pure
    # overhead).
    cnt = words.groupBy("word").agg(F.count("*").alias("n_exact"))
    sketch = cms_table(
        cnt, "word", depth=3, width=256, weight=F.col("n_exact")
    )
    top = cnt.orderBy(F.col("n_exact").desc(), "word").limit(12)
    est = cms_estimate(sketch, top.select("word"), "word", depth=3, width=256)
    return top.join(est, "word").select("word", "n_exact", "est").orderBy("word")


@query(
    "cms_heavy_hitters_docs",
    oracle=f"""
    WITH w AS MATERIALIZED (
      SELECT unnest({_WORDS_SQL}) AS word FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
    rr AS (SELECT unnest([0, 1, 2]) AS r),
    counters AS MATERIALIZED (
      SELECT r, {_md5_bucket_sql("CAST(r AS VARCHAR) || ':' || word", 256)} AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM w CROSS JOIN rr GROUP BY 1, 2),
    cand AS MATERIALIZED (SELECT DISTINCT word FROM w),
    probes AS (
      SELECT c.word, rr.r,
             {_md5_bucket_sql("CAST(rr.r AS VARCHAR) || ':' || c.word", 256)} AS b
      FROM cand c CROSS JOIN rr),
    est AS (
      SELECT p.word, CAST(MIN(COALESCE(ct.cnt, 0)) AS BIGINT) AS est
      FROM probes p LEFT JOIN counters ct ON p.r = ct.r AND p.b = ct.b
      GROUP BY 1)
    SELECT e.word, e.est, tot.n
    FROM est e CROSS JOIN tot
    WHERE e.est * 100 >= tot.n * 1
    ORDER BY e.word
    """,
    description="phi-heavy hitters from the count-min sketch alone "
    "(operators/sketch.cms_heavy_hitters): words whose estimated "
    "share of the stream is >= 1/100, with the stream length N "
    "recovered from the sketch's own row-0 counters and the threshold "
    "compared in pure BIGINT (est*100 >= N*1 — no float phi, so both "
    "engines agree bit-for-bit). One-sided guarantee from est >= "
    "true: every TRUE 1%-heavy word is returned, always; extras are "
    "bounded CMS collision error. The probe side is |vocab| x depth "
    "rows against a broadcast counter-table — nothing data-sized "
    "shuffles to make the decision.",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import cms_heavy_hitters, cms_table

    docs = _td(spark, sf_dir)
    words = docs.select(
        F.explode(F.split(normalized_text("text"), " ")).alias("word")
    )
    sketch = cms_table(words, "word", depth=3, width=256)
    return cms_heavy_hitters(
        sketch, words, "word", 1, 100, depth=3, width=256
    ).orderBy("word")


@query(
    "loghist_quantiles_orders",
    oracle="""
    WITH v AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS v FROM orders),
    h AS (SELECT CAST(length(bin(v)) AS INT) AS b,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
    c AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM h),
    q(q_num, q_den) AS (VALUES (50, 100), (90, 100), (99, 100)),
    pick AS (
      SELECT q.q_num, q.q_den, MIN(c.b) AS b
      FROM q CROSS JOIN tot JOIN c ON c.cum * q.q_den >= tot.n * q.q_num
      GROUP BY 1, 2)
    SELECT q_num, q_den, CAST(CASE WHEN b >= 63 THEN 9223372036854775807 ELSE (CAST(1 AS BIGINT) << b) - 1 END AS BIGINT) AS est
    FROM pick ORDER BY q_num
    """,
    description="Order-price quantiles from the 63-row log-histogram "
    "(operators/sketch.loghist_table): bucket = bit-length of the "
    "cent-scaled price, the p50/p90/p99 answer is the first bucket "
    "whose cumulative count reaches ceil(q*N) via the pure-BIGINT "
    "compare cum*q_den >= N*q_num. Deterministic, persistable, "
    "mergeable (pointwise sum — per-shard build == whole build, "
    "exactly) where percentile_approx is an opaque one-shot "
    "aggregate; guarantee true <= est < 2*true + 1. The decision "
    "runs entirely over the bounded sketch — nothing data-sized "
    "shuffles.",
)
def q_loghist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sketch import loghist_quantiles, loghist_table

    cents = _t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    h = loghist_table(cents, "v")
    return loghist_quantiles(h, [(50, 100), (90, 100), (99, 100)]).orderBy(
        "q_num"
    )


@query(
    "loghist_bucket_orders",
    oracle="""
    WITH v AS (SELECT o_totalprice, CAST(o_totalprice * 100 AS BIGINT) AS v
               FROM orders),
    h AS (SELECT CAST(length(bin(v)) AS INT) AS b,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
    c AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM h),
    q(q_num, q_den) AS (VALUES (25, 100), (50, 100), (75, 100)),
    pick AS (
      SELECT q.q_num, MIN(c.b) AS b
      FROM q CROSS JOIN tot JOIN c ON c.cum * q.q_den >= tot.n * q.q_num
      GROUP BY 1),
    cuts AS (SELECT list_sort(list(DISTINCT CASE WHEN b >= 63 THEN 9223372036854775807 ELSE (CAST(1 AS BIGINT) << b) - 1 END))
               AS cuts FROM pick),
    bucketed AS (
      SELECT v.o_totalprice,
             1 + len(list_filter(cuts.cuts, c -> c < v.v)) AS bucket
      FROM v CROSS JOIN cuts)
    SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS lo,
           CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS hi
    FROM bucketed GROUP BY 1 ORDER BY 1
    """,
    description="Quantile bucketing WITHOUT a global sort "
    "(operators/sketch.loghist_bucket) — the scale path "
    "ntile_deciles_orders' description promises: quartile cutpoints "
    "come from the 63-row log-histogram (pure-BIGINT pick, replayed "
    "bit-for-bit) and each order's bucket is 1 + #cutpoints strictly "
    "below its cent price, a pure expression against the broadcast "
    "one-row cutpoint array. The orders table never shuffles, never "
    "sorts, and never crosses a single-task window — the plan lint's "
    "one data-sized GLOBAL_WINDOW_ALLOWED entry, answered. Bucket "
    "populations inherit the sketch's factor-of-2 coarseness; "
    "membership is exact and engine-independent.",
    bench=True,
)
def q_loghist_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sketch import loghist_bucket

    cents = _t(spark, sf_dir, "orders").select(
        "o_totalprice", (F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    b = loghist_bucket(cents, "v", [(25, 100), (50, 100), (75, 100)])
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("decimal(18,2)").alias("lo"),
            F.max("o_totalprice").cast("decimal(18,2)").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "loghist_grouped_len_by_lang",
    oracle=f"""
    WITH d AS (SELECT lang, CAST(len({_WORDS_SQL}) AS BIGINT) AS n
               FROM documents),
    h AS (SELECT lang, CAST(length(bin(n)) AS INT) AS b,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM d GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
    c AS (SELECT lang, b, SUM(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum
          FROM h),
    q(q_num, q_den) AS (VALUES (50, 100), (90, 100), (99, 100)),
    pick AS (
      SELECT c.lang, q.q_num, q.q_den, MIN(c.b) AS b
      FROM q CROSS JOIN c
      JOIN tot ON tot.lang = c.lang AND c.cum * q.q_den >= tot.n * q.q_num
      GROUP BY 1, 2, 3)
    SELECT lang, q_num, q_den,
           CAST(CASE WHEN b >= 63 THEN 9223372036854775807 ELSE (CAST(1 AS BIGINT) << b) - 1 END AS BIGINT) AS est
    FROM pick ORDER BY lang, q_num
    """,
    description="Per-language document-length quantiles from GROUPED "
    "log-histograms (operators/sketch.loghist_grouped_table): the "
    "rollup form — <= 63 rows PER KEY whatever the corpus, exactly "
    "mergeable per (key, bucket), completing the grouped sketch "
    "family (HLL rollup, grouped KMV, now grouped quantiles). The one "
    "shuffle's partial aggregate collapses to <= 63 rows/key map-side, "
    "so hot domains cost the same as cold ones; the cumulative window "
    "partitions BY KEY over sketch-sized frames. Per-domain length "
    "quantiles are the standard curation signal for length filters.",
)
def q_loghist_grouped_len_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import (
        loghist_grouped_quantiles,
        loghist_grouped_table,
    )

    d = _td(spark, sf_dir).select(
        "lang",
        F.size(F.split(normalized_text("text"), " ")).alias("n_words"),
    )
    sk = loghist_grouped_table(d, "lang", "n_words")
    return loghist_grouped_quantiles(
        sk, "lang", [(50, 100), (90, 100), (99, 100)]
    ).orderBy("lang", "q_num")


@query(
    "loghist_tail_share_by_lang",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, CAST(len({_WORDS_SQL}) AS BIGINT) AS n
               FROM documents),
    h AS (SELECT lang, CAST(length(bin(n)) AS INT) AS b,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM d GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
    c AS (SELECT lang, b, SUM(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum
          FROM h),
    pick AS (
      SELECT c.lang, MIN(c.b) AS b
      FROM c JOIN tot ON tot.lang = c.lang AND c.cum * 100 >= tot.n * 90
      GROUP BY 1),
    cut AS (SELECT lang, CAST(CASE WHEN b >= 63 THEN 9223372036854775807 ELSE (CAST(1 AS BIGINT) << b) - 1 END AS BIGINT) AS p90_est
            FROM pick)
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE d.n > cut.p90_est) AS BIGINT)
             AS n_above,
           cut.p90_est
    FROM d JOIN cut ON d.lang = cut.lang
    GROUP BY d.lang, cut.p90_est
    ORDER BY d.lang
    """,
    description="Sketch-driven length-tail audit — the composition the "
    "grouped histogram exists for: per-language p90 length cutpoints "
    "come from the <= 63-row/key sketch, then ONE broadcast join "
    "(#langs rows) flags each document's tail membership map-side and "
    "aggregates the share. The corpus is scanned once, shuffles only "
    "for the final per-lang count, and never sorts — the per-domain "
    "'drop/inspect the freak-length tail' curation filter at 100 TB. "
    "Deterministic given the sketch; replayed bit-for-bit in SQL.",
)
def q_loghist_tail_share_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import (
        loghist_grouped_quantiles,
        loghist_grouped_table,
    )

    d = _td(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(F.split(normalized_text("text"), " ")).alias("n_words"),
    )
    cut = loghist_grouped_quantiles(
        loghist_grouped_table(d, "lang", "n_words"), "lang", [(90, 100)]
    ).select("lang", F.col("est").alias("p90_est"))
    return (
        d.join(F.broadcast(cut), "lang")
        .groupBy("lang", "p90_est")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_if(F.col("n_words") > F.col("p90_est"))
            .cast("bigint")
            .alias("n_above"),
        )
        .select("lang", "n_docs", "n_above", "p90_est")
        .orderBy("lang")
    )


_KMV_HV_SQL = _md5_bucket_sql("'0:' || word", 1 << 32)


def _md5_hv_sql(expr: str, ndigits: int) -> str:
    """DuckDB replay of operators/sketch._row_hash at ``4*ndigits``
    bits: the first ``ndigits`` hex digits of md5(expr) as a base-16
    BIGINT, digit-by-digit."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring(md5({expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (ndigits - 1 - j)}"
        for j in range(ndigits)
    )
    return f"({digits})"


@query(
    "kmv_distinct_words_docs",
    oracle=f"""
    WITH w AS MATERIALIZED (
      SELECT DISTINCT unnest({_WORDS_SQL}) AS word FROM documents),
    hv AS MATERIALIZED (SELECT DISTINCT {_KMV_HV_SQL} AS hv FROM w),
    km AS MATERIALIZED (SELECT hv FROM hv ORDER BY hv LIMIT 256),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seen,
                   CAST(COALESCE(MAX(hv), 0) AS BIGINT) AS kth FROM km),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM w)
    SELECT ex.n_exact, agg.n_seen, agg.kth,
           CAST(CASE WHEN agg.n_seen < 256 THEN agg.n_seen
                ELSE (CAST(255 AS BIGINT) * 4294967296)
                     // GREATEST(agg.kth, 1) END AS BIGINT) AS est
    FROM ex CROSS JOIN agg
    """,
    description="Distinct vocabulary size from the KMV k-minimum-"
    "values sketch (operators/sketch.kmv_table; Bar-Yossef et al. "
    "2002, Beyer et al. 2007): the 256 smallest distinct 32-bit "
    "salted-md5 word hashes, estimate = (k-1)*2^32 div kth in pure "
    "BIGINT — the oracle replays the same hashes digit-by-digit and "
    "the same integral division, so est matches bit-for-bit (the "
    "deterministic, persistable, EXACTLY-mergeable sibling of the "
    "opaque hll_sketch_agg binary in hll_sketch_rollup_users). The "
    "distinct's partial aggregate dedupes map-side; the top-k is a "
    "TakeOrderedAndProject — the shuffle carries 8-byte distinct "
    "hashes, never words.",
    bench=True,
)
def q_kmv_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import kmv_distinct_estimate, kmv_table

    words = _td(spark, sf_dir).select(
        F.explode(F.split(normalized_text("text"), " ")).alias("word")
    )
    sk = kmv_table(words, "word", k=256)
    est = kmv_distinct_estimate(sk, k=256)
    exact = words.agg(F.countDistinct("word").cast("bigint").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact", "n_seen", "kth", "est"
    )


@query(
    "kmv48_distinct_words_docs",
    oracle=f"""
    WITH w AS MATERIALIZED (
      SELECT DISTINCT unnest({_WORDS_SQL}) AS word FROM documents),
    hv AS MATERIALIZED (
      SELECT DISTINCT {_md5_hv_sql("'0:' || word", 12)} AS hv FROM w),
    km AS MATERIALIZED (SELECT hv FROM hv ORDER BY hv LIMIT 256),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seen,
                   CAST(COALESCE(MAX(hv), 0) AS BIGINT) AS kth FROM km),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM w)
    SELECT ex.n_exact, agg.n_seen, agg.kth,
           CAST(CASE WHEN agg.n_seen < 256 THEN agg.n_seen
                ELSE (CAST(255 AS BIGINT) * {1 << 48})
                     // GREATEST(agg.kth, 1) END AS BIGINT) AS est
    FROM ex CROSS JOIN agg
    """,
    description="The KMV sketch's large-n scale path: 48-bit hashes "
    "(first 12 md5 hex digits), collision-free in practice to ~10^10 "
    "distincts where 32 bits start conflating values at ~10^8 "
    "(birthday term n^2/2^33 — measured head-to-head in SCALE.md), "
    "still pure BIGINT end-to-end: estimate (k-1)*2^48 div kth, "
    "replayed digit-by-digit by the oracle. Same bounded plan shape "
    "as kmv_distinct_words_docs — the mirror of the 128-bit dhash "
    "escape hatch for the image pigeonhole join.",
)
def q_kmv48_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import kmv_distinct_estimate, kmv_table

    words = _td(spark, sf_dir).select(
        F.explode(F.split(normalized_text("text"), " ")).alias("word")
    )
    sk = kmv_table(words, "word", k=256, bits=48)
    est = kmv_distinct_estimate(sk, k=256, bits=48)
    exact = words.agg(F.countDistinct("word").cast("bigint").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact", "n_seen", "kth", "est"
    )


@query(
    "kmv_grouped_lang_vocab",
    oracle=f"""
    WITH w AS MATERIALIZED (
      SELECT DISTINCT lang, unnest({_WORDS_SQL}) AS word FROM documents),
    hv AS MATERIALIZED (
      SELECT DISTINCT lang, {_KMV_HV_SQL} AS hv FROM w),
    km AS MATERIALIZED (
      SELECT lang, hv FROM (
        SELECT lang, hv,
               row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
        FROM hv) WHERE rn <= 256),
    agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_seen,
                   CAST(COALESCE(MAX(hv), 0) AS BIGINT) AS kth
            FROM km GROUP BY 1),
    ex AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_exact FROM w GROUP BY 1)
    SELECT ex.lang, ex.n_exact, agg.n_seen, agg.kth,
           CAST(CASE WHEN agg.n_seen < 256 THEN agg.n_seen
                ELSE (CAST(255 AS BIGINT) * 4294967296)
                     // GREATEST(agg.kth, 1) END AS BIGINT) AS est
    FROM ex JOIN agg ON ex.lang = agg.lang
    ORDER BY ex.lang
    """,
    description="Per-language vocabulary estimates from GROUPED KMV "
    "sketches (operators/sketch.kmv_grouped_table): the rollup form — "
    "per-key k-min hash tables a user can persist per shard/day as "
    "plain rows and merge EXACTLY per key, the deterministic twin of "
    "hll_sketch_rollup_users' opaque binaries. dropDuplicates "
    "partial-aggregates (key, hash) map-side so the one Exchange "
    "carries fixed-width pairs; the k-min is a rank window over the "
    "same key partitioning (no per-key collect_set — a hot key's "
    "distinct set never buffers on one executor); per-key estimates "
    "run over <= k rows/key in pure BIGINT, replayed bit-for-bit.",
)
def q_kmv_grouped_lang_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import (
        kmv_grouped_estimate,
        kmv_grouped_table,
    )

    words = _td(spark, sf_dir).select(
        "lang", F.explode(F.split(normalized_text("text"), " ")).alias("word")
    )
    sk = kmv_grouped_table(words, "lang", "word", k=256)
    est = kmv_grouped_estimate(sk, "lang", k=256)
    exact = words.groupBy("lang").agg(
        F.countDistinct("word").cast("bigint").alias("n_exact")
    )
    return (
        exact.join(est, "lang")
        .select("lang", "n_exact", "n_seen", "kth", "est")
        .orderBy("lang")
    )


@query(
    "kmv_lang_diff_docs",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT lang, unnest({_WORDS_SQL}) AS word FROM documents
      WHERE lang IN ('en', 'fr')),
    ha AS MATERIALIZED (
      SELECT DISTINCT {_KMV_HV_SQL} AS hv FROM base WHERE lang = 'en'),
    hb AS MATERIALIZED (
      SELECT DISTINCT {_KMV_HV_SQL} AS hv FROM base WHERE lang = 'fr'),
    ka AS MATERIALIZED (SELECT hv FROM ha ORDER BY hv LIMIT 256),
    kb AS MATERIALIZED (SELECT hv FROM hb ORDER BY hv LIMIT 256),
    kx AS MATERIALIZED (
      SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
      ORDER BY hv LIMIT 256),
    uagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
                    CAST(COALESCE(MAX(hv), 0) AS BIGINT) AS kth FROM kx),
    uest AS (SELECT k_used,
                    CAST(CASE WHEN k_used < 256 THEN k_used
                         ELSE (CAST(255 AS BIGINT) * 4294967296)
                              // GREATEST(kth, 1) END AS BIGINT) AS union_est
             FROM uagg),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS in_a_only FROM kx
          WHERE hv IN (SELECT hv FROM ka)
            AND hv NOT IN (SELECT hv FROM kb))
    SELECT m.in_a_only, u.k_used, u.union_est,
           CAST((m.in_a_only * u.union_est)
                // GREATEST(u.k_used, 1) AS BIGINT) AS diff_est
    FROM m CROSS JOIN uest AS u
    """,
    description="English-vocabulary-not-in-French estimate from two "
    "KMV sketches (operators/sketch.kmv_diff_estimate) — the theta "
    "a-not-b, completing the sketch set algebra (distinct/union, "
    "intersection, now difference): in_a_only of the merged sketch's "
    "k_used union-sample hashes lie in A's sketch but not B's, so "
    "|A \\\\ B| = in_a_only * union_est div k_used in pure BIGINT. "
    "Every frame in the decision is <= k rows and broadcast.",
)
def q_kmv_lang_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import kmv_diff_estimate, kmv_table

    base = _td(spark, sf_dir).filter(F.col("lang").isin("en", "fr"))

    def words(lang: str):
        return base.filter(F.col("lang") == lang).select(
            F.explode(F.split(normalized_text("text"), " ")).alias("word")
        )

    ka = kmv_table(words("en"), "word", k=256)
    kb = kmv_table(words("fr"), "word", k=256)
    return kmv_diff_estimate(ka, kb, k=256)


@query(
    "kmv_lang_overlap_docs",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT lang, unnest({_WORDS_SQL}) AS word FROM documents
      WHERE lang IN ('en', 'fr')),
    ha AS MATERIALIZED (
      SELECT DISTINCT {_KMV_HV_SQL} AS hv FROM base WHERE lang = 'en'),
    hb AS MATERIALIZED (
      SELECT DISTINCT {_KMV_HV_SQL} AS hv FROM base WHERE lang = 'fr'),
    ka AS MATERIALIZED (SELECT hv FROM ha ORDER BY hv LIMIT 256),
    kb AS MATERIALIZED (SELECT hv FROM hb ORDER BY hv LIMIT 256),
    kx AS MATERIALIZED (
      SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
      ORDER BY hv LIMIT 256),
    uagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
                    CAST(COALESCE(MAX(hv), 0) AS BIGINT) AS kth FROM kx),
    uest AS (SELECT k_used,
                    CAST(CASE WHEN k_used < 256 THEN k_used
                         ELSE (CAST(255 AS BIGINT) * 4294967296)
                              // GREATEST(kth, 1) END AS BIGINT) AS union_est
             FROM uagg),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS matches FROM kx
          WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb))
    SELECT m.matches, u.k_used, u.union_est,
           CAST((m.matches * u.union_est)
                // GREATEST(u.k_used, 1) AS BIGINT) AS inter_est
    FROM m CROSS JOIN uest AS u
    """,
    description="English/French shared-vocabulary estimate from two "
    "KMV sketches (operators/sketch.kmv_intersect_estimate) — the "
    "theta-sketch set-operation pattern: the merged sketch's k_used "
    "smallest union hashes are a uniform sample of A ∪ B, matches of "
    "them lie in both inputs, |A ∩ B| ≈ matches * union_est div "
    "k_used in pure BIGINT (no float Jaccard — both engines agree "
    "bit-for-bit). Every frame in the decision is <= k rows and "
    "broadcast; per-language sketches can be persisted per shard/day "
    "and merged exactly before comparing.",
)
def q_kmv_lang_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import kmv_intersect_estimate, kmv_table

    docs = _td(spark, sf_dir)

    def words(lang: str) -> DataFrame:
        return docs.filter(F.col("lang") == lang).select(
            F.explode(F.split(normalized_text("text"), " ")).alias("word")
        )

    a = kmv_table(words("en"), "word", k=256)
    b = kmv_table(words("fr"), "word", k=256)
    return kmv_intersect_estimate(a, b, k=256)


@query(
    "kll_quantiles_orders",
    oracle=f"""
    WITH hv AS MATERIALIZED (
      SELECT CAST(o_totalprice * 100 AS BIGINT) AS v,
             {_md5_hv_sql("'kll:' || CAST(o_orderkey AS VARCHAR)", 12)} AS h
      FROM orders),
    pw AS MATERIALIZED (
      SELECT v, CASE WHEN h = 0 THEN (CAST(1 AS BIGINT) << 48)
                     ELSE h & (-h) END AS p
      FROM hv),
    lv AS (SELECT unnest(generate_series(0, 48)) AS l),
    cnts AS (SELECT l, (SELECT COUNT(*) FROM pw
                        WHERE pw.p >= (CAST(1 AS BIGINT) << lv.l)) AS c
             FROM lv),
    meta AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pw) AS n,
                    (SELECT MIN(l) FROM cnts WHERE c <= 1024) AS lvl),
    surv AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, p) AS rank
             FROM pw, meta WHERE pw.p >= (CAST(1 AS BIGINT) << meta.lvl)),
    q(q_num, q_den) AS (VALUES (50, 100), (90, 100), (99, 100))
    SELECT q.q_num, q.q_den,
           CAST(COALESCE(
             MIN(surv.v) FILTER (WHERE
               surv.rank * (CAST(1 AS BIGINT) << meta.lvl) * q.q_den
               >= meta.n * q.q_num),
             MAX(surv.v)) AS BIGINT) AS est
    FROM surv, meta, q
    GROUP BY 1, 2 ORDER BY q_num
    """,
    description="Order-price p50/p90/p99 from the deterministic "
    "KLL-style level sample (operators/sketch.kll_table, round 8): "
    "row r survives to level L iff its salted-md5 key hash has L "
    "trailing zero bits — KLL's per-level coin flips with the coins "
    "replaced by hash bits, so the oracle replays the sample, the "
    "level selection, and the pure-BIGINT weighted-rank estimate "
    "bit-for-bit. <= 1024 survivor rows whatever the data; ~1.6% rank "
    "error at q=0.5 vs loghist_quantiles_orders' factor-of-2 bracket; "
    "EXACTLY mergeable per shard (merge == whole-build identity, "
    "tests/test_sketch.py). Build = one pass of 49 conditional "
    "partial counts + one broadcast-filtered pass — no sort, no "
    "global window over data.",
    bench=True,
)
def q_kll_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sketch import kll_quantiles, kll_table

    # fan out the single-row-group fixture scan: the md5 level hash is
    # the query's only per-row work and must not serialize on one core
    # (same reason _td does this for the documents table)
    o = ensure_min_partitions(
        _t(spark, sf_dir, "orders").select(
            (F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            F.col("o_orderkey"),
        )
    )
    sk = kll_table(o, "v", "o_orderkey", k=1024)
    return kll_quantiles(sk, [(50, 100), (90, 100), (99, 100)]).orderBy("q_num")


def _ivf_append_oracle(
    k_clusters: int = 8, max_iter: int = 3, dim: int = 64
) -> str:
    """Replays the incremental-index append: train the deterministic
    k-means on vec_id < 40 (the persisted centroids), then assign every
    NEW vector (vec_id >= 40) by the same (distance, cid) argmin —
    assignment is a pure function of the frozen centroids, which is
    exactly what makes the append map-side and oracle-checkable."""
    ctes = _kmeans_ctes(k_clusters, max_iter, dim, where="vec_id < 40")
    ctes.append(
        "newv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings WHERE vec_id >= 40)"
    )
    d = _sq_dist_sql("n.v", "c.centroid", dim)
    return f"""
    WITH {', '.join(ctes)}
    SELECT vec_id, cid, ROUND(d, 6) AS dist FROM (
      SELECT n.vec_id, c.cid, {d} AS d,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY {d} ASC, c.cid ASC) AS rn
      FROM newv n CROSS JOIN c{max_iter} c) x
    WHERE rn = 1 ORDER BY vec_id
    """


def _ivf_refit_oracle(
    k_clusters: int = 8, max_iter: int = 3, dim: int = 64
) -> str:
    """Replays ivf_index_refit's retrain-and-reassign: the SAME
    deterministic k-means (k-lowest-id init, fixed rounds) trained on
    the FULL vector set — exactly what the refit reads back from the
    generation's persisted ``vectors`` table — then every vector
    assigned by the (distance, cid) argmin against the new centroids."""
    ctes = _kmeans_ctes(k_clusters, max_iter, dim)
    d = _sq_dist_sql("n.v", "c.centroid", dim)
    return f"""
    WITH {', '.join(ctes)}
    SELECT vec_id, CAST(cid AS INTEGER) AS cid FROM (
      SELECT n.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY {d} ASC, c.cid ASC) AS rn
      FROM vecs n CROSS JOIN c{max_iter} c) x
    WHERE rn = 1 ORDER BY vec_id
    """


@query(
    "ivf_refit_assign",
    oracle=_ivf_refit_oracle,
    description="Managed ANN index refit (round 9, VERDICT r8 #6 — "
    "drift said WHEN to refit, operators/similarity.ivf_index_refit "
    "DOES it): drives the real persisted lifecycle end-to-end — build "
    "the generation-0 index on vec_id<40, append the rest against the "
    "frozen quantizer, then REFIT: retrain k-means on the full "
    "persisted vectors table, re-assign in one broadcast map-side "
    "pass, write generation 1's tables invisibly, and swap the "
    "one-row generation pointer in a single atomic snapshot commit "
    "(old generation time-travelable via pointer history). The query "
    "returns generation 1's assignments read back from the snapshot "
    "table; the oracle retrains the same deterministic k-means on the "
    "full embeddings set in unrolled CTEs and replays every "
    "assignment — a refit that trained on the wrong vector set, "
    "dropped an append, or swapped non-atomically is a hash mismatch.",
)
def q_ivf_refit_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_refit,
        ivf_index_tables,
    )
    from azure_etl_spark.sources.snapshot import read_snapshot

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="ivf_refit_") + "/idx"
    ivf_index_build(e.filter(F.col("vec_id") < 40), path, k=8, max_iter=3)
    ivf_index_append(e.filter(F.col("vec_id") >= 40), path, batch="b1")
    assert ivf_index_refit(spark, path) == 1
    t = ivf_index_tables(spark, path)
    return (
        read_snapshot(spark, t["assignments"])
        .select("vec_id", F.col("cid").cast("int").alias("cid"))
        .orderBy("vec_id")
    )


@query(
    "ivf_append_assign",
    oracle=_ivf_append_oracle,
    description="Incremental ANN index maintenance (round 8, VERDICT "
    "r7 #6): new embedding batches join the FROZEN coarse quantizer "
    "instead of triggering a refit — operators/similarity.ivf_assign "
    "is one broadcast join of the k-row centroid table + a grouped "
    "(distance, cid) argmin, deterministic given the centroids, so "
    "the oracle trains the same k-means on the vec_id<40 subset and "
    "replays the assignment of the rest exactly. The persisted form "
    "(ivf_index_build/append on snapshot tables) appends (id, cid) + "
    "a drift-stats row per batch; ivf_index_drift reads the stats "
    "alone to say when the frozen quantizer went stale (refit "
    "signal). At 100 TB: append cost is map-side assignment of the "
    "new batch only — vectors never reshuffle, the index tables are "
    "the only writes.",
)
def q_ivf_append_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import ivf_assign, kmeans_fit

    e = _t(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") < 40)
    new = e.filter(F.col("vec_id") >= 40)
    _a, cents = kmeans_fit(train, k=8, max_iter=3)
    out = ivf_assign(new, cents)
    return out.select(
        "vec_id", "cid", F.round("dist", 6).alias("dist")
    ).orderBy("vec_id")


def _bpe_encode_bytes_oracle() -> str:
    """Replays bpe_encode_bytes: the same unrolled-merge CTE chain on
    per-word structs (symbol string for ^[a-z]+$ words, NULL for OOV),
    then byte-fallback hex tokens + the ▁ boundary marker per word —
    case-preserved words, nothing dropped, no UNK."""
    from azure_etl_spark.operators.tokenize import DSEP, SEP

    n = _BPE_N_MERGES
    ctes = _bpe_round_ctes(n)
    ctes.append(rf"""e0 AS (
      SELECT doc_id, list_transform(words, w -> struct_pack(
               w := w,
               s := CASE WHEN regexp_matches(w, '^[a-z]+$')
                    THEN '{SEP}' || array_to_string(string_split(w, ''), '{DSEP}') || '{SEP}'
                    ELSE NULL END)) AS ent
      FROM (SELECT doc_id,
                   list_filter(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                               ELSE string_split_regex(trim(text), '\s+') END,
                               w -> length(w) > 0) AS words
            FROM documents) t)""")
    for r in range(1, n + 1):
        # same exhausted-vocabulary guard as w{r} (ADVICE r5)
        ctes.append(f"""e{r} AS (
      SELECT doc_id, list_transform(ent, x -> struct_pack(
               w := x.w,
               s := CASE WHEN x.s IS NULL THEN NULL
                    ELSE COALESCE(replace(x.s, b.pat, b.rep), x.s) END)) AS ent
      FROM e{r - 1} LEFT JOIN b{r} b ON TRUE)""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT doc_id, CAST(len(toks) AS INT) AS n_bpe_tokens,
           CAST(len(list_filter(toks,
                t -> regexp_matches(t, '^<0x[0-9A-F]{{2}}>$'))) AS INT)
             AS n_byte_tokens,
           array_to_string(toks, ' ') AS tok_str
    FROM (SELECT doc_id, flatten(list_transform(ent, x ->
            list_concat(['▁'], CASE WHEN x.s IS NOT NULL
              THEN string_split(substring(x.s, 2, length(x.s) - 2), '{DSEP}')
              ELSE list_transform(generate_series(1, length(hex(encode(x.w))) // 2),
                   i -> '<0x' || substring(hex(encode(x.w)), i * 2 - 1, 2) || '>')
            END))) AS toks
          FROM e{n}) f
    ORDER BY doc_id
    """


@query(
    "bpe_encode_bytes_docs",
    oracle=_bpe_encode_bytes_oracle,
    description="Byte-fallback BPE encode (round 8, VERDICT r7 #8 — "
    "the GPT-2 no-UNK contract): every case-preserved word is emitted "
    "— in-vocabulary words through the learned merges exactly like "
    "bpe_encode_docs, everything else as <0xHH> UTF-8 byte tokens — "
    "each word preceded by the ▁ boundary marker, making the flat "
    "stream LOSSLESS (bpe_decode_bytes reassembles the whitespace-"
    "normalized input byte-exactly; property-tested on arbitrary "
    "UTF-8 incl. the marker character itself, which byte-encodes and "
    "so never collides). Same plan as bpe_encode_docs: one broadcast "
    "merge list, one corpus pass, zero shuffles; the oracle unrolls "
    "the merges over per-word structs and replays the byte fallback "
    "hex-for-hex.",
)
def q_bpe_encode_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.tokenize import (
        bpe_encode_bytes,
        bpe_train,
        word_frequencies,
    )

    d = _td(spark, sf_dir)
    _, rounds = bpe_train(word_frequencies(d), _BPE_N_MERGES)
    enc = bpe_encode_bytes(d, rounds)
    return enc.select(
        "doc_id",
        "n_bpe_tokens",
        "n_byte_tokens",
        F.array_join("bpe_tokens", " ").alias("tok_str"),
    ).orderBy("doc_id")


@query(
    "snapshot_wap_publish_gold",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey <= 2000
    UNION ALL
    SELECT o_orderkey, 'W' AS o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey BETWEEN 5000 AND 6000
    """,
    description="Snapshot write-audit-publish end-to-end (round 8, "
    "VERDICT r7 #5 — sources/snapshot.py stage/publish/discard): a "
    "BAD batch (nulled keys) is staged first and its publish must be "
    "BLOCKED by the expectations audit and discarded — the oracle "
    "excludes those rows, so a broken audit gate is a driver hash "
    "mismatch, not just a unit-test failure — then the good batch "
    "stages, audits, and publishes atomically (the staged data dir is "
    "adopted verbatim: publish is O(manifest), data written once), "
    "and the final read is target + audited append.",
)
def q_snapshot_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.sources.snapshot import (
        SnapshotConstraintError,
        discard_staged_commit,
        publish_staged_commit,
        read_snapshot,
        stage_snapshot_commit,
        write_snapshot,
    )

    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    target = orders.filter(F.col("o_orderkey") <= 2000).select(*cols)
    good = (
        orders.filter(F.col("o_orderkey").between(5000, 6000))
        .select(
            F.col("o_orderkey"),
            F.lit("W").alias("o_orderstatus"),
            F.col("o_totalprice"),
        )
    )
    bad = good.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
            F.col("o_orderkey")
        ),
    )
    path = tempfile.mkdtemp(prefix="snap_wap_") + "/tbl"
    write_snapshot(target, path)
    rules = {"key_not_null": F.col("o_orderkey").isNotNull()}
    sid_bad = stage_snapshot_commit(bad, path)
    try:
        publish_staged_commit(spark, path, sid_bad, expectations=rules)
    except SnapshotConstraintError:
        discard_staged_commit(spark, path, sid_bad)
    sid = stage_snapshot_commit(good, path)
    publish_staged_commit(spark, path, sid, expectations=rules)
    return read_snapshot(spark, path).select(*cols)


@query(
    "kll_grouped_len_by_lang",
    oracle=f"""
    WITH d AS (SELECT lang, CAST(len({_WORDS_SQL}) AS BIGINT) AS v,
                      {_md5_hv_sql("'kll:' || CAST(doc_id AS VARCHAR)", 12)} AS h
               FROM documents),
    pw AS MATERIALIZED (
      SELECT lang, v, CASE WHEN h = 0 THEN (CAST(1 AS BIGINT) << 48)
                           ELSE h & (-h) END AS p
      FROM d),
    hist AS (SELECT lang, CAST(length(bin(p)) - 1 AS INT) AS l,
                    COUNT(*) AS cnt
             FROM pw GROUP BY 1, 2),
    sc AS (SELECT lang, l, cnt,
                  SUM(cnt) OVER (PARTITION BY lang ORDER BY l DESC) AS s
           FROM hist),
    meta AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n,
                    CAST(COALESCE(MAX(CASE WHEN s > 256 THEN l + 1 END), 0)
                         AS INT) AS lvl
             FROM sc GROUP BY lang),
    surv AS (SELECT pw.lang, v,
                    ROW_NUMBER() OVER (PARTITION BY pw.lang ORDER BY v, p)
                      AS rank
             FROM pw JOIN meta ON meta.lang = pw.lang
             WHERE pw.p >= (CAST(1 AS BIGINT) << meta.lvl)),
    q(q_num, q_den) AS (VALUES (50, 100), (95, 100))
    SELECT s.lang AS lang, q.q_num, q.q_den,
           CAST(COALESCE(
             MIN(s.v) FILTER (WHERE
               s.rank * (CAST(1 AS BIGINT) << m.lvl) * q.q_den
               >= m.n * q.q_num),
             MAX(s.v)) AS BIGINT) AS est
    FROM surv s JOIN meta m ON m.lang = s.lang CROSS JOIN q
    GROUP BY 1, 2, 3 ORDER BY 1, 2
    """,
    description="Per-language document-length p50/p95 from GROUPED "
    "KLL level samples (operators/sketch.kll_grouped_table, round 8): "
    "<= k=256 survivor rows PER KEY whatever the corpus, the rank "
    "member of the grouped sketch family next to grouped KMV "
    "(distinct) and grouped loghist (2x-bracket quantiles) — a few "
    "percent rank error where the loghist rollup brackets within 2x. "
    "One groupBy computes the per-key level histogram (<= 49 rows/key "
    "map-side), survivors filter against the broadcast thresholds, "
    "and the rank window partitions BY KEY over sketch-sized frames. "
    "Oracle replays hash levels, per-key level selection, and the "
    "pure-BIGINT weighted rank bit-for-bit.",
)
def q_kll_grouped_len_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.dedup import normalized_text
    from azure_etl_spark.operators.sketch import (
        kll_grouped_quantiles,
        kll_grouped_table,
    )

    d = _td(spark, sf_dir).select(
        "lang",
        F.size(F.split(normalized_text("text"), " ")).alias("n_words"),
        "doc_id",
    )
    sk = kll_grouped_table(d, "lang", "n_words", "doc_id", k=256)
    return kll_grouped_quantiles(sk, "lang", [(50, 100), (95, 100)]).orderBy(
        "lang", "q_num"
    )


def _pq_append_oracle(
    m: int = 4,
    k_codes: int = 16,
    max_iter: int = 3,
    dim: int = 64,
    train_where: str = "vec_id < 40",
    enc_where: str = "vec_id >= 40",
) -> str:
    """Replays pq_index_append: train the m deterministic sub-space
    k-means on ``train_where`` (the persisted codebooks), then encode
    every ``enc_where`` vector by the same per-subspace (distance, cid)
    argmin and sum the quantization error — encoding against frozen
    codebooks is a pure function, which is what makes the append
    map-side and oracle-checkable. With ``train_where='TRUE'`` this is
    the REFIT oracle (pq_refit_codes): retrain on the full set, encode
    the full set."""
    sub_len = dim // m

    def dist(va: str, vb: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {sub_len}),"
            f" i -> ({va}[i] - {vb}[i]) ** 2))"
        )

    ctes = [
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE {train_where})",
        "newv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE {enc_where})",
    ]
    for s in range(m):
        lo, hi = s * sub_len + 1, (s + 1) * sub_len
        ctes.append(f"sv{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM vecs)")
        ctes.append(f"nsv{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM newv)")
        ctes.append(f"""c0_{s} AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
             v AS centroid
      FROM (SELECT vec_id, v FROM sv{s} ORDER BY vec_id LIMIT {k_codes}))""")
        for n in range(1, max_iter + 1):
            ctes.append(f"""a{n}_{s} AS (
      SELECT id, cid, v FROM (
        SELECT e.vec_id AS id, c.cid, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid')} ASC, c.cid ASC) AS rn
        FROM sv{s} e CROSS JOIN c{n - 1}_{s} c) x WHERE rn = 1)""")
            ctes.append(f"""c{n}_{s} AS (
      SELECT cid, list(mv ORDER BY pos) AS centroid
      FROM (SELECT cid, pos, AVG(val) AS mv
            FROM (SELECT cid, generate_subscripts(v, 1) AS pos,
                         unnest(v) AS val FROM a{n}_{s}) u
            GROUP BY cid, pos) g
      GROUP BY cid)""")
        ctes.append(f"""encN{s} AS (
      SELECT vec_id, cid AS code, d FROM (
        SELECT e.vec_id, c.cid, {dist('e.v', 'c.centroid')} AS d,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {dist('e.v', 'c.centroid')} ASC, c.cid ASC) AS rn
        FROM nsv{s} e CROSS JOIN c{max_iter}_{s} c) x WHERE rn = 1)""")
    joins = " ".join(
        f"JOIN encN{s} n{s} USING (vec_id)" for s in range(1, m)
    )
    codes = " || ',' || ".join(f"CAST(n{s}.code AS VARCHAR)" for s in range(m))
    qerr = " + ".join(f"n{s}.d" for s in range(m))
    return f"""
    WITH {', '.join(ctes)}
    SELECT vec_id, {codes} AS codes_str, ROUND({qerr}, 4) AS qerr
    FROM encN0 n0 {joins}
    ORDER BY vec_id
    """


def _pq_refit_oracle() -> str:
    inner = _pq_append_oracle(train_where="TRUE", enc_where="TRUE")
    return f"SELECT vec_id, codes_str FROM ({inner}) _r ORDER BY vec_id"


@query(
    "pq_refit_codes",
    oracle=_pq_refit_oracle,
    description="Managed PQ index refit (round 9 — the codebook twin "
    "of ivf_refit_assign, operators/similarity.pq_index_refit): drive "
    "the persisted lifecycle end-to-end — build generation 0 on "
    "vec_id<40, append the rest against the frozen codebooks, then "
    "REFIT: retrain the m sub-space k-means on the generation's full "
    "persisted vectors table, re-encode every vector, write "
    "generation 1 invisibly and swap the one-row generation pointer "
    "in a single atomic snapshot commit. The query returns generation "
    "1's codes table; the oracle retrains all m deterministic "
    "sub-space k-means on the FULL embeddings set in unrolled CTEs "
    "and replays every code — a refit that trained on the wrong "
    "vector set or dropped an appended batch is a hash mismatch.",
)
def q_pq_refit_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.operators.similarity import (
        pq_index_append,
        pq_index_build,
        pq_index_refit,
        pq_index_tables,
    )
    from azure_etl_spark.sources.snapshot import read_snapshot

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="pq_refit_") + "/idx"
    pq_index_build(
        e.filter(F.col("vec_id") < 40), path, m=4, k_codes=16, max_iter=3,
        dim=64,
    )
    pq_index_append(
        e.filter(F.col("vec_id") >= 40), path, batch="b1", m=4, dim=64
    )
    assert pq_index_refit(spark, path) == 1
    t = pq_index_tables(spark, path)
    return (
        read_snapshot(spark, t["codes"])
        .select(
            "vec_id",
            F.concat_ws(",", F.col("codes").cast("array<string>")).alias(
                "codes_str"
            ),
        )
        .orderBy("vec_id")
    )


@query(
    "pq_append_codes",
    oracle=_pq_append_oracle,
    description="Incremental PQ index maintenance — the codebook half "
    "of VERDICT r7 #6 (operators/similarity.pq_index_build/append): "
    "new embedding batches encode against the FROZEN persisted "
    "codebooks (one broadcast of m x k_codes centroids + a grouped "
    "per-subspace argmin — no refit, vectors never reshuffle) and the "
    "64x-compressed codes table appends; the per-batch quantization "
    "error feeds pq_index_drift, the refit signal. Oracle trains the "
    "same m sub-space k-means on vec_id<40 and replays the frozen "
    "encode of the rest exactly.",
)
def q_pq_append_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.similarity import (
        pq_encode_with_error,
        pq_train,
    )

    e = _t(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") < 40)
    new = e.filter(F.col("vec_id") >= 40)
    cb = pq_train(train, m=4, k_codes=16, max_iter=3, dim=64)
    enc = pq_encode_with_error(new, cb, m=4, dim=64)
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_str"),
        F.round("qerr", 4).alias("qerr"),
    ).orderBy("vec_id")


@query(
    "kll_bucket_orders",
    oracle=f"""
    WITH hv AS MATERIALIZED (
      SELECT o_totalprice, CAST(o_totalprice * 100 AS BIGINT) AS v,
             {_md5_hv_sql("'kll:' || CAST(o_orderkey AS VARCHAR)", 12)} AS h
      FROM orders),
    pw AS MATERIALIZED (
      SELECT v, CASE WHEN h = 0 THEN (CAST(1 AS BIGINT) << 48)
                     ELSE h & (-h) END AS p
      FROM hv),
    lv AS (SELECT unnest(generate_series(0, 48)) AS l),
    cnts AS (SELECT l, (SELECT COUNT(*) FROM pw
                        WHERE pw.p >= (CAST(1 AS BIGINT) << lv.l)) AS c
             FROM lv),
    meta AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pw) AS n,
                    (SELECT MIN(l) FROM cnts WHERE c <= 1024) AS lvl),
    surv AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, p) AS rank
             FROM pw, meta WHERE pw.p >= (CAST(1 AS BIGINT) << meta.lvl)),
    q(q_num, q_den) AS (VALUES (25, 100), (50, 100), (75, 100)),
    pick AS (
      SELECT q.q_num,
             CAST(COALESCE(
               MIN(surv.v) FILTER (WHERE
                 surv.rank * (CAST(1 AS BIGINT) << meta.lvl) * q.q_den
                 >= meta.n * q.q_num),
               MAX(surv.v)) AS BIGINT) AS est
      FROM surv, meta, q
      GROUP BY 1),
    cuts AS (SELECT list_sort(list(DISTINCT est)) AS cuts FROM pick),
    bucketed AS (
      SELECT hv.o_totalprice,
             1 + len(list_filter(cuts.cuts, c -> c < hv.v)) AS bucket
      FROM hv CROSS JOIN cuts)
    SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS lo,
           CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS hi
    FROM bucketed GROUP BY 1 ORDER BY 1
    """,
    description="Quantile bucketing at KLL precision WITHOUT a global "
    "sort (operators/sketch.kll_bucket, round 8): quartile cutpoints "
    "come from the <= 1024-row KLL level sample (~1.5% rank error) "
    "instead of loghist_bucket's factor-of-2 bucket bounds — so the "
    "bucket POPULATIONS land within a few percent of exact ntile's "
    "while keeping the scale plan: sketch aggregate + ONE-row "
    "broadcast NLJ + pure-expression bucketing; the data never "
    "shuffles, never sorts, never crosses a data-sized window. "
    "Membership is exact and deterministic given the sketch — the "
    "oracle replays cutpoints and bucket assignment bit-for-bit.",
    bench=True,
)
def q_kll_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_spark.operators.sketch import kll_bucket

    cents = ensure_min_partitions(
        _t(spark, sf_dir, "orders").select(
            "o_totalprice",
            (F.col("o_totalprice") * 100).cast("bigint").alias("v"),
            "o_orderkey",
        )
    )
    b = kll_bucket(cents, "v", "o_orderkey", [(25, 100), (50, 100), (75, 100)])
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("decimal(18,2)").alias("lo"),
            F.max("o_totalprice").cast("decimal(18,2)").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "streaming_text_near_dup_gold",
    # Pinned-constant oracle (the snapshot_delete_skipping pattern):
    # the planted corpus and the writer are fully deterministic, so the
    # surviving ids ARE the contract — a recall or idempotence
    # regression changes the set and fails the driver hash.
    oracle="""
    SELECT * FROM (VALUES (CAST(0 AS BIGINT)), (10), (101))
    t(doc_id) ORDER BY doc_id
    """,
    description="Streaming cross-batch TEXT near-dup end-to-end "
    "(round 8, VERDICT r7 #1 — streaming/sinks."
    "incremental_text_near_dup_writer): batch 0 plants a base doc, a "
    "light edit of it, an exact copy, and a unique doc (within-batch "
    "exact + near collapse -> {0, 10}); batch 1 plants ANOTHER light "
    "edit of the indexed base (cross-batch near-dup, rejected via the "
    "signature index alone — text never re-read), a fresh doc "
    "(admitted), and an exact copy of the indexed unique doc "
    "(rejected at the linear digest stage); batch 1 is then REPLAYED "
    "with the same id to prove idempotence. Final survivors pinned: "
    "{0, 10, 101}.",
)
def q_streaming_text_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from azure_etl_spark.streaming.sinks import incremental_text_near_dup_writer

    base = (
        "the quick brown fox jumps over the lazy dog while rain falls "
        "on the quiet village green"
    )
    uniq1 = (
        "seventeen green turtles paddle across a warm shallow lagoon "
        "under bright southern stars at midnight hour"
    )
    uniq2 = (
        "an entirely different report about quarterly metrics and "
        "pipeline throughput written for the data team review"
    )
    root = tempfile.mkdtemp(prefix="stream_tnd_")
    target = f"{root}/t"
    w = incremental_text_near_dup_writer(target, f"{root}/i")
    b0 = spark.createDataFrame(
        [(0, base), (1, base.replace("lazy", "sleepy")), (2, base), (10, uniq1)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(100, base.replace("rain", "snow")), (101, uniq2), (102, uniq1)],
        "doc_id long, text string",
    )
    w(b0, 0)
    w(b1, 1)
    w(b1, 1)  # crash-redelivery: must converge to the same state
    return spark.read.parquet(target).select("doc_id").orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items() if spec.bench}
