"""Round-6 plan-shape assertions.

1. `pagerank_trade_graph_prod` iterations must be broadcast joins over
   dst-partitioned cached edges — the shape that removed all
   per-iteration edge-table shuffles (≈9 s → ≈1.6 s at sf0.1).
2. `dedup_embedding_cosine`'s bucket self-join runs behind the relative
   hot-bucket guard with broadcast re-joins of the tiny bucket list —
   no extra full-table exchange beyond the self-join's own.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from python_btc_etl_spark import plans

from .conftest import SF_SMALL


def _explained(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_pagerank_prod_iterations_are_broadcast_no_edge_shuffles(spark):
    df = plans.REGISTRY["pagerank_trade_graph_prod"].fn(spark, SF_SMALL)
    plan = _explained(spark, df)
    assert "BroadcastHashJoin" in plan, plan
    # No sort-merge/shuffled-hash join of the edge table per iteration.
    assert "SortMergeJoin" not in plan, plan
    # Exchange budget: edges repartition + deg agg (both inside cached
    # plans) + the final ranking window + per-iteration broadcast
    # exchanges only. 3 iterations of join+agg+join previously added a
    # hash shuffle each; a regression reappears as extra exchanges here.
    assert _exchanges(plan) <= 7, plan


def test_embedding_cosine_guard_uses_broadcast_bucket_list(spark):
    df = plans.REGISTRY["dedup_embedding_cosine"].fn(spark, SF_SMALL)
    plan = _explained(spark, df)
    # The guard's occupancy list re-join must broadcast (<= 2^planes
    # rows), not shuffle the vector table an extra time.
    assert "BroadcastHashJoin" in plan, plan
    assert "collect_list" not in plan, plan


def test_kcore_rounds_are_broadcast_semijoins(spark):
    # The registered query eagerly localCheckpoints each round (without
    # it, the per-round broadcasts re-execute prior rounds ~2^R times —
    # measured 62 s vs 2 s at sf0.1), so the FINAL plan is a checkpoint
    # scan; the shape contract lives on the single-round builder.
    from python_btc_etl_spark.plans import graph

    edges = graph._trade_edges(spark, SF_SMALL).repartition("src")
    alive = edges.groupBy(edges.src.alias("node")).count().select(
        "node", F.col("count").alias("d")
    )
    plan = _explained(spark, graph._kcore_round(edges, alive))
    assert "BroadcastHashJoin" in plan, plan
    # The edge table must never sort-merge per peel round.
    assert "SortMergeJoin" not in plan, plan


def test_zorder_pruning_audit_has_no_global_sort_or_window(spark):
    df = plans.REGISTRY["zorder_layout_pruning_audit"].fn(spark, SF_SMALL)
    plan = _explained(spark, df)
    # File assignment is value-range chunking — a per-row expression —
    # not a global sort/ntile; a Window here would be the single-
    # partition bottleneck the query exists to avoid.
    assert "Window" not in plan, plan
    # The dimension-stats join is a broadcast of a 1-row aggregate.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
