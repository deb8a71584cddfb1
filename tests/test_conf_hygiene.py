"""No registry query may leak planner-behavior conf onto the shared
session (round-5 verdict task #5 / ADVICE r5 #3): the bench and the
driver's correctness sweep run all queries on ONE session, so a query
that flips a SQLConf silently changes the planning mode of everything
after it.
"""

from __future__ import annotations

from python_btc_etl_spark import plans

from .conftest import SF_SMALL

PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"


def test_pyds_pushdown_audit_does_not_mutate_shared_session(spark):
    before = spark.conf.get(PUSHDOWN_CONF, None)
    df = plans.REGISTRY["pyds_filter_pushdown_audit"].fn(spark, SF_SMALL)
    rows = df.collect()
    # The audit itself must still gate pushdown through the data: the
    # days_planned column reads the PRUNED partition count.
    assert rows and all(r["days_planned"] < 10 for r in rows), rows
    assert spark.conf.get(PUSHDOWN_CONF, None) == before
    # ...and the child session it runs on is NOT this session.
    assert df.sparkSession is not spark
