"""Physical-plan shape assertions for the round-3 operator additions:
the point of each rewrite is a *plan property* (no quadratic join, no
global ntile sort, scan-stage-only work), so each property is pinned
here — a regression that silently reintroduces the slow plan fails CI
even though results stay correct."""

from __future__ import annotations

import re

from .test_plan_shape import explained


def test_skyline_no_quadratic_join(spark):
    """The Pareto skyline must run as the distinct-price window sweep —
    never the oracle's quadratic NOT-EXISTS nested-loop self-join."""
    plan = explained(spark, "skyline_parts_pareto")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"\(\d+\) Window", plan), plan


def test_zorder_no_global_sort_bucketing(spark):
    """Z-cell assignment must be a scan-local expression from broadcast
    min/max — not an ntile over a single-partition global sort."""
    plan = explained(spark, "zorder_layout_stats")
    assert "ntile" not in plan, plan
    assert "Window" not in plan, plan


def test_lm_filter_equi_joins_only(spark):
    """LM join-back runs on (w1, w2) equi keys — no cartesian pairing."""
    plan = explained(spark, "lm_rare_bigram_filter")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_repetition_ratio_no_shuffle(spark):
    """The repetition score is per-row HOF arithmetic: zero aggregation
    shuffles — the only exchange is the output sort."""
    plan = explained(spark, "repetition_gram_ratio")
    assert "hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_forward_asof_single_window_no_join(spark):
    """Forward as-of must be ONE window pass over the unioned stream
    (both first(ignorenulls) columns share a spec) — no join at all."""
    plan = explained(spark, "asof_next_purchase")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_mad_outliers_broadcast_stat_joins(spark):
    """Per-type median/MAD tables join back via broadcast — the event
    stream must never shuffle for the join."""
    plan = explained(spark, "mad_outliers_by_type")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_ewma_range_join_not_cartesian(spark):
    """The EWMA lookback self-join carries the event_type equi key; the
    day-range predicate must ride on an equi join, not a cartesian."""
    plan = explained(spark, "ewma_daily_decay")
    assert "CartesianProduct" not in plan, plan


def test_longest_streak_no_join(spark):
    """Gaps-and-islands is windows + aggregation on one shuffle key —
    the constant-key trick exists precisely to avoid any self-join."""
    plan = explained(spark, "longest_streak_per_user")
    assert "Join" not in plan, plan


def test_constraint_report_anti_join_on_distinct_keys(spark):
    """Referential-integrity check must left-anti join the DISTINCT key
    projection (aggregate below the join), not the raw fact table."""
    plan = explained(spark, "constraint_quality_report")
    assert "LeftAnti" in plan, plan
