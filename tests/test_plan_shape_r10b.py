"""Plan-shape pins for the late round-10 queries: the facts the SQL
oracle cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stream_quality_gate_scoring_plan_is_broadcast_only(spark):
    """Every model join in the per-batch scoring plan must broadcast —
    the batch side is the only relation that may shuffle. A
    SortMergeJoin here would shuffle the (vocabulary-sized) model
    every micro-batch."""
    from python_btc_etl_spark.plans.stream import (
        SQG_BATCHES,
        _sqg_decisions,
        _sqg_model,
    )

    model = _sqg_model(spark, SF_SMALL)
    batch = spark.createDataFrame(
        [(SQG_BATCHES, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    plan = _executed_plan(_sqg_decisions(model, batch, 0))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_k_anonymity_audit_is_one_pass_no_joins(spark):
    """The governance audit is one partial-aggregable pass over the QI
    classes: single scan, zero joins, no row-level output columns."""
    from python_btc_etl_spark.plans.analytics import k_anonymity_audit

    df = k_anonymity_audit(spark, SF_SMALL)
    plan = _executed_plan(df)
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert j not in plan, j
    assert plan.count("Scan parquet") <= 2  # one logical scan (plan string may repeat)
    row = df.collect()[0]
    # risk metrics are internally consistent
    assert row["rows_at_risk"] >= row["classes_below_k"] * 0  # non-negative
    assert row["min_class_size"] >= 1
    assert row["min_l_diversity"] >= 1


def test_cardinality_audit_never_joins(spark):
    """The estimator must price the join WITHOUT running it: no join
    operator anywhere except the single-row broadcast combine. Runs at
    SF_MEDIUM — sf0.001 has only 15 user keys, so the 1/16 key-domain
    slice is legitimately EMPTY there (and the empty-slice est=0 path
    is itself asserted below at SF_SMALL)."""
    from tests.conftest import SF_MEDIUM

    from python_btc_etl_spark.plans.scale import (
        CARD_SLICES,
        join_cardinality_estimate_audit,
    )

    df = join_cardinality_estimate_audit(spark, SF_MEDIUM)
    plan = _executed_plan(df)
    for j in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert j not in plan, j
    row = df.collect()[0]
    # estimator sanity: unbiasedness cannot be asserted on one draw, but
    # the exact ground truth must bound the scaled sample sensibly
    assert row["exact_pairs"] > 0
    assert row["est_pairs"] >= 0
    assert 0 < row["n_keys_sampled"] <= row["n_keys"]
    # the sampled slice is ~1/CARD_SLICES of the key domain
    assert row["n_keys_sampled"] * CARD_SLICES < row["n_keys"] * 3

    # empty-slice corner (15 keys at sf0.001, none in the 1/16 slice):
    # the estimator must say 0, not NULL
    small = join_cardinality_estimate_audit(spark, SF_SMALL).collect()[0]
    if small["n_keys_sampled"] == 0:
        assert small["est_pairs"] == 0 and small["err_ppm"] == -1000000


def test_dsir_beats_random_invariant(spark):
    """dsir >= random is provable (top-K maximizes the K-subset sum);
    the engine must exhibit it on real data."""
    from python_btc_etl_spark.plans.pipeline import dsir_vs_random_baseline

    rows = {r["method"]: r for r in dsir_vs_random_baseline(spark, SF_SMALL).collect()}
    assert rows["dsir"]["w_sum"] >= rows["random"]["w_sum"]
    assert rows["dsir"]["n_docs"] == rows["random"]["n_docs"]
