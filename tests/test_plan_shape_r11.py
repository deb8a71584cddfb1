"""Round-11 plan-shape pins: decile_stats_approx must touch the fact
table with scans + hash aggregates ONLY — no Window (the exact twin's
single-partition ntile sort is precisely what it removes), no Sort
before the aggregate, no fact-table Exchange beyond the two hash-agg
shuffles."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_decile_approx_no_window_no_global_sort(spark):
    from python_btc_etl_spark.plans.ordered_stats import decile_stats_approx

    df = decile_stats_approx(spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "Window" not in plan
    assert "ntile" not in plan.lower()
    # the bucket assignment is a literal projection (broadcast cut
    # points folded into the scan), aggregated by hash — codegen'd
    assert "HashAggregate" in plan
    # the fact scan feeds the partial hash aggregate directly: no Sort,
    # Window, or Exchange between the parquet scan and the aggregate
    # (Sorts later in the plan order only the 10-row result)
    lines = plan.splitlines()
    scan_i = next(i for i, ln in enumerate(lines) if "FileScan parquet" in ln)
    path = []
    for ln in reversed(lines[:scan_i]):
        if "HashAggregate" in ln:
            break
        path.append(ln)
    assert not any(
        ("Sort" in ln or "Window" in ln or "Exchange" in ln) for ln in path
    ), path
