"""Round-4 plan-shape assertions: the dedup verify joins' size-guarded
broadcast (`plans.dedup._maybe_broadcast`) must hint while the signature
table fits under VERIFY_BROADCAST_CAP and degrade to a planner-chosen
shuffle join past it — the 100 TB story with no code change."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_btc_etl_spark import plans
from python_btc_etl_spark.plans import dedup

from .conftest import SF_SMALL


def _explained(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_maybe_broadcast_hints_under_cap(spark):
    small = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    hinted = dedup._maybe_broadcast(small)
    assert hinted is not small  # hint applied
    plan = _explained(spark.range(100).join(hinted, F.col("id") == F.col("k")))
    assert "BroadcastHashJoin" in plan, plan


def test_maybe_broadcast_unhinted_past_cap(spark):
    small = spark.range(10).select(F.col("id").alias("k"))
    assert dedup._maybe_broadcast(small, cap=0) is small  # no hint, planner decides


def test_verify_join_degrades_to_shuffle_past_cap(spark, monkeypatch):
    """With the cap forced to 0 and auto-broadcast off, the ngram verify
    plan must contain no broadcast join at all — pure shuffle joins, the
    exact plan a 100 TB signature table would get."""
    monkeypatch.setattr(dedup, "VERIFY_BROADCAST_CAP", 0)
    # Earlier tests may have materialized the shingle cache: a cached
    # InMemoryRelation keeps the physical plan it was BUILT with (incl.
    # its broadcast joins) inside the explain text, which would
    # false-positive the no-BHJ assertion below.
    spark.catalog.clearCache()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = plans.REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMALL)
        plan = _explained(df)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_verify_join_still_broadcasts_at_test_scale(spark):
    """Default cap: the sf0.001 signature table is tiny, so the verify
    joins must carry the measured-4x broadcast hint."""
    df = plans.REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMALL)
    assert "BroadcastHashJoin" in _explained(df)


def test_zorder_spread_plan_stays_linear(spark):
    """with_zval binds each Morton shift-or-mask step to its own alias;
    the physical plan must contain a LINEAR number of shiftleft nodes
    (2 spreads x 5 steps + interleave ~ 22 printed), never the 2^5-copy
    explosion an interpolated SQL string would produce (~250+)."""
    df = plans.REGISTRY["zorder_layout_stats"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert 0 < plan.count("shiftleft") <= 40, plan.count("shiftleft")


def test_spatial_join_is_equi_join_not_nested_loop(spark):
    """Grid blocking must plan as a hash equi-join on the cell key —
    a BroadcastNestedLoopJoin would mean the blocking condition fell
    out of the join keys and the pair search went quadratic."""
    df = plans.REGISTRY["spatial_grid_proximity_join"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Every Lloyd assignment must broadcast the K centroids against the
    corpus — the corpus side must never shuffle for assignment."""
    df = plans.REGISTRY["kmeans_lloyd_centroids"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_profiler_is_single_scan(spark):
    """table_profile_orders computes all per-column stats in ONE fused
    aggregate: exactly one parquet scan of orders in the plan. The
    formatted explain prints every node twice (tree line + detail
    section), so one physical scan == 2 text occurrences."""
    df = plans.REGISTRY["table_profile_orders"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert plan.count("Scan parquet") == 2, plan.count("Scan parquet")


def test_pii_redaction_has_no_shuffle_before_summary(spark):
    """The detect+redact pipeline is scan-local: one scan, and the only
    exchanges feed the final one-row summary aggregate (nodes print
    twice in formatted explain: <=2 real exchanges == <=4 text hits)."""
    df = plans.REGISTRY["pii_redaction_audit"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert plan.count("Scan parquet") == 2, plan.count("Scan parquet")
    assert plan.count("Exchange") <= 4, plan.count("Exchange")


def test_merge_cdc_single_merge_join(spark):
    """Three-clause MERGE must resolve through exactly ONE (full-outer)
    merge join on the key — more joins would mean per-clause passes."""
    df = plans.REGISTRY["merge_full_cdc_apply"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert plan.count("SortMergeJoin") // 2 == 1, plan.count("SortMergeJoin")
    assert "CartesianProduct" not in plan


def test_e2e_corpus_build_is_single_scan_no_joins(spark):
    """The composed gates→dedup→split→budget pipeline must run off ONE
    documents scan with zero joins: the dedup is a window, the split a
    scalar hash, the budget one aggregate."""
    df = plans.REGISTRY["e2e_corpus_build"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert plan.count("Scan parquet") // 2 == 1, plan.count("Scan parquet")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert j not in plan, j


def test_pagerank_no_cartesian(spark):
    """Every PageRank round is an equi-join on the edge key; a cartesian
    would mean rank propagation degenerated to all-pairs."""
    df = plans.REGISTRY["pagerank_trade_graph"].fn(spark, SF_SMALL)
    plan = _explained(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
