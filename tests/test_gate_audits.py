"""Invariants of the round-10 gate audits that the hash differential
can't state as properties: tercile mass balance in the contingency
tables and the order-audit's containment bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM


def test_contingency_marginals_are_terciles(spark):
    from python_btc_etl_spark.plans.pipeline import quality_signal_contingency

    rows = quality_signal_contingency(spark, SF_MEDIUM).collect()
    n = sum(r["n_docs"] for r in rows)
    ent = {}
    lm = {}
    for r in rows:
        ent[r["entropy_band"]] = ent.get(r["entropy_band"], 0) + r["n_docs"]
        lm[r["lm_band"]] = lm.get(r["lm_band"], 0) + r["n_docs"]
    # every band exists and holds roughly a third of the mass (terciles
    # over a quantized rate can deviate by the largest tie group, not more)
    assert set(ent) == {"low", "mid", "high"}
    assert set(lm) == {"head", "middle", "tail"}
    for marg in (ent, lm):
        for v in marg.values():
            assert v >= n // 6, (marg, n)  # no band collapsed


def test_length_bias_audit_masses(spark):
    from python_btc_etl_spark.plans.pipeline import gate_length_bias_audit

    rows = gate_length_bias_audit(spark, SF_MEDIUM).collect()
    assert sum(r["n_docs"] for r in rows) > 0
    for r in rows:
        assert r["bigram_sum"] >= r["n_docs"]  # every scored doc has >=1 bigram
    # long docs carry more bigram mass per doc than short docs
    per_doc = {
        b: sum(r["bigram_sum"] for r in rows if r["length_band"] == b)
        / max(1, sum(r["n_docs"] for r in rows if r["length_band"] == b))
        for b in ("short", "medium", "long")
    }
    assert per_doc["short"] < per_doc["long"]


def test_order_sensitivity_bounds(spark):
    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.plans.pipeline import pipeline_order_sensitivity

    rows = {
        r["pipeline_order"]: r
        for r in pipeline_order_sensitivity(spark, SF_MEDIUM).collect()
    }
    assert set(rows) == {"dedup_first", "gate_first"}
    n_corpus = load(spark, SF_MEDIUM, "documents").count()
    for r in rows.values():
        # each order's survivors are a strict subset of the corpus
        # (the tercile gate always drops its tail third)
        assert 0 < r["n_docs"] < n_corpus
        assert r["bigram_sum"] >= r["n_docs"]
