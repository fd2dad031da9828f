"""Plan lint: EVERY registry query's physical plan is swept for scale
anti-patterns. This is the systematic version of the spot checks in
test_plans_scale.py — a new query can't ship with a cartesian product or
a row-at-a-time Python UDF without failing here.

Allowed Python nodes are the Arrow-batched ones (ArrowEvalPython,
MapInPandas/FlatMapGroupsInPandas for the multimodal/grouped-map paths,
BatchEvalPythonUDTF for the declared UDTF demo); the banned node is
plain BatchEvalPython — the per-row pickle path that turns a JVM scan
into a Python loop.
"""

from __future__ import annotations

import pytest

from azure_etl_spark.plans.queries import QUERIES

# queries whose *builders* run real side work (streams, Derby, iterative
# fitting) — plan-built elsewhere; everything else is linted here.
SKIP = {"streaming_hourly_rollup", "jdbc_roundtrip_gold", "ivf_topk"}

LINTABLE = sorted(n for n in QUERIES if n not in SKIP)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", LINTABLE)
def test_no_scale_antipatterns(spark, sf_dir, name):
    plan = _plan(QUERIES[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    cleaned = plan.replace("BatchEvalPythonUDTF", "")
    assert "BatchEvalPython" not in cleaned, f"{name}: row-at-a-time Python UDF"
