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
SKIP = {
    "streaming_hourly_rollup",
    "jdbc_roundtrip_gold",
    "ivf_topk",
    "ivf_append_assign",  # builder fits k-means (localCheckpoint side work)
    "pq_append_codes",  # builder fits per-subspace k-means (same)
    "streaming_text_near_dup_gold",  # builder runs the foreachBatch writer
}

LINTABLE = sorted(n for n in QUERIES if n not in SKIP)

# Partitionless Window nodes: `Window.orderBy(...)` with no partitionBy
# moves the ENTIRE input to one task (Spark itself warns "No Partition
# Defined ... serious performance degradation"). Over a frame that is
# sketch-/aggregate-sized that is fine and sometimes the only way to
# stamp a deterministic global rank — but it must be a conscious,
# justified choice, never an accident on a corpus-sized frame. Every
# query whose plan contains one must appear here with the bound on the
# window's input; a new query hitting the lint either gets partitioned,
# pre-limited (TakeOrderedAndProject first, window over <= N rows), or
# earns an entry.
GLOBAL_WINDOW_ALLOWED = {
    # weights over the per-domain aggregate: rows = #domains, not #docs
    "domain_rebalance_weights": "window input = one row per domain",
    # both rankers limit(50) BEFORE the rank window stamps 1..50
    "hybrid_rrf_docs": "windows run over top-50 rank lists",
    # the log2 histogram is <= 63 rows by construction
    "loghist_quantiles_orders": "window input = <=63-row loghist sketch",
    # the KLL level sample is <= k=1024 rows by construction (the rank
    # window orders SURVIVORS, never data — kll_table filters first)
    "kll_quantiles_orders": "window input = <=1024-row KLL level sample",
    # same rank window over the <=1024-row sample; the DATA side is
    # bucketed map-side against the broadcast cutpoint array
    "kll_bucket_orders": "window input = <=1024-row KLL level sample",
    # same cumsum window over the <=63-row sketch; the DATA side is
    # bucketed map-side against the broadcast cutpoint array
    "loghist_bucket_orders": "window input = <=63-row loghist sketch",
    # gold frame = one row per symbol (3 in the fixture); add_id's
    # deterministic_order mode is documented small-serving-output-only
    # (the scalable default is monotonically_increasing_id)
    "serving_cast_all_id": "window input = per-symbol gold aggregate",
    # the one DATA-SIZED entry, kept deliberately: exact ntile semantics
    # REQUIRE a total order; the query description names the scale path
    # (cutpoint binning, no global sort) and this variant exists for
    # exact-SQL parity
    "ntile_deciles_orders": "exact ntile semantics; documented ceiling",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _iter_nodes(node):
    yield node
    # AdaptiveSparkPlanExec hides its subtree from children(); descend
    # through the adaptive boundary explicitly or the sweep sees nothing
    if node.nodeName() == "AdaptiveSparkPlan":
        yield from _iter_nodes(node.executedPlan())
        return
    for i in range(node.children().size()):
        yield from _iter_nodes(node.children().apply(i))


@pytest.mark.parametrize("name", LINTABLE)
def test_no_scale_antipatterns(spark, sf_dir, name):
    root = QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
    plan = root.toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    cleaned = plan.replace("BatchEvalPythonUDTF", "")
    assert "BatchEvalPython" not in cleaned, f"{name}: row-at-a-time Python UDF"
    for node in _iter_nodes(root):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            assert name in GLOBAL_WINDOW_ALLOWED, (
                f"{name}: partitionless Window (single-task sort of its "
                "whole input at scale) — partition it, pre-limit it, or "
                "justify it in GLOBAL_WINDOW_ALLOWED"
            )
