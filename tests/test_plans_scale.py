"""Scale hygiene: the physical plans must show pushdown, pruning,
broadcast, and top-k patterns — not just correct answers.

These assertions are the local[*] stand-in for '1000 executors, 100 TB':
a plan that pushes filters, prunes columns, broadcasts dims, and avoids
global sorts scales; one that doesn't, doesn't.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_spark.operators.filters import filter_isin, top_k
from azure_etl_spark.plans.queries import QUERIES
from azure_etl_spark.sources.files import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_isin_filter_pushed_to_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = filter_isin(li, "l_returnflag", ["A", "N"]).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan and "In(l_returnflag" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(li.select("l_orderkey", "l_quantity"))
    # ReadSchema must contain only the projected columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}


def test_topk_plans_take_ordered(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    df = top_k(o, 100, F.col("o_totalprice").desc())
    assert "TakeOrderedAndProject" in _plan(df)


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(QUERIES["join_revenue_per_nation"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_flagship_partial_aggregation(spark, sf_dir):
    """groupBy min/max must plan partial (map-side) + final hash
    aggregates so the shuffle carries one row per partition/key."""
    plan = _plan(QUERIES["flagship_gold_minmax"].fn(spark, sf_dir))
    assert "partial_min" in plan and "partial_max" in plan
    assert "HashAggregate" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    df = QUERIES["tpch_q1ish"].fn(spark, sf_dir)
    df.collect()  # AQE: codegen spans only visible in the final plan
    plan = _plan(df)
    # executedPlan renders whole-stage-codegen stages as "*(n) Op"
    assert "WholeStageCodegen" in plan or "*(" in plan
