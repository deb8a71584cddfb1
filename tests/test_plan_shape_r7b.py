"""Round-7 plan-shape pins, batch 2.

1. Partition-spec evolution: under the evolved spec (day, event_type)
   the full predicate must be PURE directory pruning — both columns
   appear as PartitionFilters on the scan and NO residual data filter
   on event_type survives in the physical plan.  Under the old spec
   only `d` is a partition filter and event_type must remain a residual.
2. Winnowing fingerprinting is per-row compute: the fingerprint-table
   plan contains no Exchange (zero shuffles before the joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _partition_filters(plan: str) -> str:
    # The FileScan renders as ONE line; slice out just the
    # "PartitionFilters: [...]" bracket so substring checks can't match
    # DataFilters/PushedFilters on the same line.
    i = plan.index("PartitionFilters: [")
    return plan[i : plan.index("]", i) + 1]


def test_spec_b_prunes_on_both_columns(spark):
    from python_btc_etl_spark.plans import partitioned as P

    m = P.materialize_spec_evolved_events(spark, SF_SMALL)
    sb = spark.read.parquet(m["spec_day_type"]).filter(
        (F.col("d") == P.PSE_DAY) & (F.col("event_type") == P.PSE_TYPE)
    )
    plan = _executed_plan(sb)
    pf = _partition_filters(plan)
    assert "d#" in pf and "event_type#" in pf, plan
    # No residual filter node: pruning answered the whole predicate.
    assert "+- Filter" not in plan, plan


def test_spec_a_keeps_residual_type_filter(spark):
    from python_btc_etl_spark.plans import partitioned as P

    m = P.materialize_spec_evolved_events(spark, SF_SMALL)
    sa = spark.read.parquet(m["spec_day"]).filter(
        (F.col("d") == P.PSE_DAY) & (F.col("event_type") == P.PSE_TYPE)
    )
    plan = _executed_plan(sa)
    pf = _partition_filters(plan)
    assert "d#" in pf, plan
    assert "event_type#" not in pf, plan  # type is NOT a partition col here
    assert "Filter" in plan, plan  # the residual data filter must survive


def test_winnow_fingerprints_shuffle_free(spark):
    from python_btc_etl_spark.plans import dedup as D
    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.functions import text as TX

    # The fingerprint projection itself (sans the catalog.spread
    # repartition that _winnow_fps inherits from the planting helper):
    # k-gram hashing + windowed min must stay a narrow per-row pipeline.
    d = load(spark, SF_SMALL, "documents").select("doc_id", F.lower("text").alias("text"))
    h = TX.shingle_hashes28(TX.grams_all(TX.words(F.col("text")), TX.WINNOW_K))
    fp = (
        d.select("doc_id", h.alias("h"))
        .filter(F.size("h") >= TX.WINNOW_W)
        .select("doc_id", TX.winnow_from_hashes(F.col("h")).alias("fps"))
    )
    assert "Exchange" not in _executed_plan(fp)
