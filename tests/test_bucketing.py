"""Bucketed-join tests: the write-time co-location path.

The claim under test is physical, not semantic: joining two tables
bucketed into the same number of buckets on the join key must produce a
SortMergeJoin with NO Exchange on either side — the shuffle is paid once
at write time, then amortized over every subsequent join. At 100 TB this
is the difference between re-shuffling the fact table per query and
never shuffling it again.
"""

from __future__ import annotations

import re

import pytest

from python_btc_etl_spark.catalog import load
from python_btc_etl_spark.sources.formats import write_bucketed

from .conftest import SF_SMALL

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load(spark, SF_SMALL, "lineitem")
    o = load(spark, SF_SMALL, "orders")
    write_bucketed(li, "li_bucketed", "l_orderkey", N_BUCKETS, str(base / "li"))
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_bucketed",
        "l_orderkey",
        N_BUCKETS,
        str(base / "o"),
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def no_broadcast(spark):
    """At sf0.001 both sides fit the broadcast threshold, so the planner
    would pick BroadcastHashJoin and skip the bucketed scan entirely. A
    100 TB fact-fact join is far past any broadcast threshold; disabling
    broadcast reproduces that regime at test scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    li_t, o_t = bucketed_tables
    joined = spark.table(li_t).join(spark.table(o_t), "l_orderkey")
    plan = _physical_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert re.search(r"Bucketed: true", plan), plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = load(spark, SF_SMALL, "lineitem")
    o = load(spark, SF_SMALL, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    expected = li.join(o, "l_orderkey").count()
    got = spark.table(li_t).join(spark.table(o_t), "l_orderkey").count()
    assert got == expected > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables, no_broadcast):
    """Aggregation on the bucket key also rides the existing layout —
    no shuffle before the final aggregate."""
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").count()
    plan = _physical_plan(agg)
    assert "Exchange" not in plan, plan
