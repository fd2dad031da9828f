"""End-to-end medallion pipeline on the crypto-shaped view, checked
against a DuckDB oracle computed from the same raw input (the golden
test of SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

from pyspark.sql import functions as F

from azure_etl_spark.plans.pipeline import MedallionPipeline
from azure_etl_spark.plans.queries import crypto_view


def test_medallion_end_to_end(spark, sf_dir, duck, tmp_path):
    raw = crypto_view(spark, sf_dir)
    pipe = MedallionPipeline(root=str(tmp_path), as_of=dt.date(2024, 1, 15))
    gold = pipe.run(spark, raw)

    rows = {r["symbol"]: r for r in gold.collect()}
    expected = duck.sql(
        """
        WITH crypto AS (SELECT l_returnflag AS symbol,
                               CAST(l_extendedprice AS DECIMAL(10,2)) AS price
                        FROM lineitem),
        silver AS (SELECT DISTINCT symbol, price FROM crypto)
        SELECT symbol, MIN(price) mn, MAX(price) mx, MAX(price)-MIN(price) diff
        FROM silver GROUP BY symbol
        """
    ).fetchall()
    assert len(rows) == len(expected)
    for sym, mn, mx, diff in expected:
        r = rows[sym]
        assert r["min_value_by_symbol"] == mn
        assert r["max_value_by_symbol"] == mx
        assert r["difference_between_min_max"] == diff
        assert (r["year"], r["month"], r["day"]) == (2024, 1, 15)

    # layer materialization contracts
    assert glob.glob(os.path.join(pipe.path("bronze"), "*.parquet"))
    assert glob.glob(os.path.join(pipe.path("silver"), "*.parquet"))
    # gold is hive-partitioned by the stamp date -> prunable backfill reads
    assert os.path.isdir(os.path.join(pipe.path("gold"), "year=2024", "month=1", "day=15"))

    # document serving layer: all-string + unique id (goldToCosmosdb shape)
    doc_files = glob.glob(os.path.join(pipe.path("serving_documents"), "*.json"))
    assert doc_files
    docs = [json.loads(line) for f in doc_files for line in open(f) if line.strip()]
    assert len(docs) == len(rows)
    assert all(isinstance(v, str) for d in docs for v in d.values())
    assert len({d["id"] for d in docs}) == len(docs)

    # staged warehouse copy: parquet staged + COPY INTO DDL generated
    assert "COPY INTO goldtable" in pipe.results["copy_sql"]
    staged = spark.read.parquet(os.path.join(pipe.path("serving_stage"), "goldtable"))
    assert staged.count() == len(rows)


def test_gold_partition_pruning(spark, sf_dir, tmp_path):
    """A date-filtered gold read must scan only the matching partition."""
    raw = crypto_view(spark, sf_dir)
    pipe = MedallionPipeline(root=str(tmp_path), as_of=dt.date(2024, 1, 15))
    pipe.run(spark, raw)
    gold = spark.read.parquet(pipe.path("gold"))
    plan = (
        gold.filter((F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 15))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
