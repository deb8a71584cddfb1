"""Round-5 plan-shape assertions: scale-hardening of the last flagged
aggregation shapes.

1. `minhash_calibration` mean must be a distributed partial HashAggregate
   over an exact decimal(38,18) sum — never a single-buffer
   collect_list/ObjectHashAggregate over the full candidate-pair set
   (the round-4 verdict's one 100 TB scale-killer).
2. The production-path twins of the determinism folds (pagerank /
   label centroids / k-means) must plan with NO per-group collect_list —
   plain partial-aggregable sum/avg shapes only.
"""

from __future__ import annotations

from python_btc_etl_spark import plans

from .conftest import SF_SMALL


def _explained(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_minhash_calibration_mean_is_partial_hashaggregate(spark):
    df = plans.REGISTRY["minhash_calibration"].fn(spark, SF_SMALL)
    plan = _explained(spark, df)
    # No array materialization of the pair set anywhere in the plan.
    assert "collect_list" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    # The global agg must decompose into partial+final HashAggregate
    # (decimal sum is associative, so Spark plans map-side combine).
    assert "HashAggregate" in plan, plan
    # dsum(…, 18) sums decimal(36,18) inputs (Spark widens the buffer).
    assert "sum" in plan and "decimal(36,18)" in plan, plan


def test_production_twins_have_no_pergroup_collect(spark):
    for name in (
        "pagerank_trade_graph_prod",
        "embedding_label_centroids_prod",
        "kmeans_lloyd_centroids_prod",
    ):
        df = plans.REGISTRY[name].fn(spark, SF_SMALL)
        plan = _explained(spark, df)
        assert "collect_list" not in plan, f"{name}: per-group array fold leaked"
        assert "ObjectHashAggregate" not in plan, f"{name}: object agg leaked"
