"""eng_* SQL scalar UDFs must equal their DataFrame twins cell-for-cell
on the fixture corpus (plus edge rows), and stay JVM-side (no
BatchEvalPython in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_spark.functions.sql_udfs import register_sql_functions
from azure_etl_spark.operators.dedup import normalized_text
from azure_etl_spark.operators.text import fingerprint, quality_score, token_count
from azure_etl_spark.sources.files import load_table


def _corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(
        [(900001, ""), (900002, "   "), (900003, "x"), (900004, "a  b\t c\n d")],
        "doc_id long, text string",
    )
    return docs.unionByName(edges)


def test_sql_udfs_equal_dataframe_twins(spark, sf_dir):
    register_sql_functions(spark)
    _corpus(spark, sf_dir).createOrReplaceTempView("__udf_docs")
    got = spark.sql(
        """SELECT doc_id, eng_norm_text(text) AS nt, eng_token_count(text) AS tc,
                  eng_fingerprint(text) AS fp, eng_quality(text) AS q
           FROM __udf_docs"""
    )
    want = _corpus(spark, sf_dir).select(
        "doc_id",
        normalized_text("text").alias("nt"),
        token_count("text").alias("tc"),
        fingerprint("text").alias("fp"),
        quality_score("text").alias("q"),
    )
    g = {r["doc_id"]: (r["nt"], r["tc"], r["fp"], r["q"]) for r in got.collect()}
    w = {r["doc_id"]: (r["nt"], r["tc"], r["fp"], r["q"]) for r in want.collect()}
    assert g == w


def test_sql_udfs_stay_jvm_side(spark, sf_dir):
    register_sql_functions(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__udf_docs2")
    plan = (
        spark.sql("SELECT eng_quality(text) FROM __udf_docs2")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
