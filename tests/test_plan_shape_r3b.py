"""Plan-shape pins for the later round-3 operators: each encodes the
scale property that makes the operator viable at 100 TB."""

from __future__ import annotations

import re

from .test_plan_shape import explained


def test_temporal_join_is_equi_with_residual(spark):
    """The point-in-time join must plan as an EQUI join on the customer
    key with the validity window as a residual filter — never a pure
    range (nested-loop) join."""
    plan = explained(spark, "temporal_dim_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    joins = re.findall(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert joins, plan


def test_checksum_manifest_one_agg_per_table(spark):
    """Each table contributes exactly one scan + one two-phase aggregate;
    XOR folds map-side (partial HashAggregate below the exchange)."""
    plan = explained(spark, "table_checksum_manifest")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 5, plan
    assert "Join" not in plan, plan


def test_quantization_broadcasts_dim_stats(spark):
    """The 64-row per-dimension stats table must broadcast; the exploded
    dims side never shuffles for the join."""
    plan = explained(spark, "embedding_int8_quantization")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_skew_profile_broadcasts_global_stats(spark):
    """The single global-stats row joins via broadcast; per-key counts
    aggregate with map-side partials."""
    plan = explained(spark, "join_key_skew_profile")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_correlation_matrix_joins_daily_not_raw(spark):
    """The pair self-join must run on the aggregated daily table: both
    join children contain an aggregate below them."""
    plan = explained(spark, "correlation_matrix_types")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


def test_session_paths_single_user_shuffle_chain(spark):
    """Sessionize + in-session ranking share the user_id sort order; the
    plan must not contain any join."""
    plan = explained(spark, "top_session_paths")
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_containment_equi_join_candidates(spark):
    """Containment candidates come from the inverted-index equi-join —
    no cross product anywhere in the plan."""
    plan = explained(spark, "dedup_containment")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
