"""Round-7 plan-shape pins, batch 3 (link prediction, rank/contingency
stats, two-pass median, HITS).

What must hold at 100 TB:

1. link_prediction_suppliers: the top-k is TakeOrderedAndProject (never
   a global sort materialization) and the degree re-joins broadcast.
2. chi_square_independence: the customer dim join broadcasts (the fact
   table is never shuffled for the join) and the marginal re-joins
   broadcast too.
3. mannwhitney_u_values: the row-scale running-count window is
   PARTITIONED by the domain block — no unpartitioned window ever sees
   the per-value table; the block-prefix table re-joins via broadcast.
4. exact_median_two_pass: pass 2 ranks only the located histogram
   bin(s) — scan_fraction must be a small sliver of the table.
5. hits_hubs_authorities: all three score re-joins broadcast and the
   cached edge table is reused (InMemoryTableScan), mirroring the
   PageRank shuffle shape.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_link_prediction_topk_and_broadcasts(spark):
    from python_btc_etl_spark.plans.graph import link_prediction_suppliers

    plan = _executed_plan(link_prediction_suppliers(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_chi_square_broadcast_only(spark):
    from python_btc_etl_spark.plans.ordered_stats import chi_square_independence

    plan = _executed_plan(chi_square_independence(spark, SF_SMALL))
    # Dim join + two marginal joins + the total: all broadcast, no SMJ.
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_mannwhitney_window_partitioned_by_block(spark):
    from python_btc_etl_spark.plans.ordered_stats import mannwhitney_u_values

    plan = _executed_plan(mannwhitney_u_values(spark, SF_SMALL))
    # The row-scale running-count window must carry the block partition
    # key; the only unpartitioned window is over the ~500 domain blocks.
    i = plan.index("Window")
    window_sections = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert any(
        "block#" in ln and "value#" in ln for ln in window_sections
    ), plan[i : i + 2000]
    # Block-prefix table comes back via broadcast, never a shuffle join.
    assert "BroadcastHashJoin" in plan, plan


def test_two_pass_median_scans_a_sliver(spark):
    from python_btc_etl_spark.plans.ordered_stats import exact_median_two_pass

    row = exact_median_two_pass(spark, SF_SMALL).collect()[0]
    assert row["pass2_rows"] >= 1
    # The whole point: pass 2 touches only the median bin(s), a small
    # fraction of the table (~1-2 of ~400 domain bins).
    assert row["scan_fraction"] < 0.05, row


def test_hits_broadcast_shape(spark):
    from python_btc_etl_spark.plans.graph import hits_hubs_authorities

    plan = _executed_plan(hits_hubs_authorities(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "InMemoryTableScan" in plan, plan
