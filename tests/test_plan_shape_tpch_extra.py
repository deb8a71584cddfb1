"""Physical-plan shape assertions for the tpch_extra query family —
the q8/q11/q15/q16/q20/q21 shapes must keep their designed-for-100-TB
plans, not merely return correct rows at test scale."""

from __future__ import annotations

import re

from .test_plan_shape import explained


def test_q8_single_aggregation_pass(spark):
    """The market-share ratio needs ONE aggregation over the joined fact
    (two conditional sums), not separate numerator/denominator scans —
    exactly one exchange above the join tree for the group-by."""
    plan = explained(spark, "q8_market_share")
    # partial + final of the same aggregate → ≥2 HashAggregate nodes, but
    # only ONE aggregation exchange (plus broadcasts, which are not
    # shuffle exchanges).
    assert plan.count("HashAggregate") >= 2, plan
    shuffles = re.findall(r"hashpartitioning\(", plan)
    # lineitem⋈orders and orders⋈customer shuffle; the group-by adds one.
    assert len(shuffles) <= 5, plan
    assert "CartesianProduct" not in plan, plan


def test_q8_dims_broadcast(spark):
    """part/supplier/nation are dims — every one must ride a broadcast,
    leaving only fact⋈fact shuffles."""
    plan = explained(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_q11_threshold_is_broadcast_not_recomputed(spark):
    """The global-total scalar must be a 1-row broadcast joined into the
    per-part stream — a nested-loop re-evaluation per group would scan
    lineitem twice per row at scale."""
    plan = explained(spark, "q11_important_parts")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q15_max_is_broadcast_join_not_sort(spark):
    """Picking the max-revenue supplier must not globally sort the
    revenue view: the max is a 1-row aggregate broadcast back. No Sort
    node may feed the filter (the final orderBy of ≤a few rows is fine)."""
    plan = explained(spark, "q15_top_supplier")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan or "Sort" in plan, plan


def test_q16_not_in_is_anti_join(spark):
    """The NOT IN (deficit suppliers) must plan as a broadcast left-anti
    join on the fact, not a per-row subquery."""
    plan = explained(spark, "q16_supplier_count")
    assert "LeftAnti" in plan, plan
    # distinct-count: expand/partial/final aggregation present
    assert plan.count("HashAggregate") >= 2, plan


def test_q20_two_aggregation_depths_share_partitioning(spark):
    """supp_part (group by suppkey, partkey) joins part_total (group by
    partkey) on partkey; both aggregates must be partial+final and the
    join must be a real hash/merge join, not nested-loop."""
    plan = explained(spark, "q20_dominant_suppliers")
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q21_decorrelated_no_per_row_probes(spark):
    """EXISTS/NOT EXISTS over lineitem aliases must decorrelate into
    per-order aggregates joined on the order key — the plan may contain
    joins and aggregates but no nested-loop/cartesian artifacts."""
    plan = explained(spark, "q21_sole_failing_supplier")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan
    assert "TakeOrderedAndProject" in plan, plan
