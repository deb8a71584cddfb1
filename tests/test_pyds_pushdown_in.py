"""Gapped-In pushdown residual (round-5 verdict task #6): the one
subtle `pushFilters` branch — `In` is absorbed as a range COVER only
(min..max prunes partitions) while the filter itself is returned as a
residual so Spark's post-filter removes the gap members.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import In

from python_btc_etl_spark.sources.pyds import PushdownBarsReader, register


def test_pushfilters_in_returns_residual_and_prunes_cover():
    r = PushdownBarsReader({"days": "4"})
    filt = In(attribute=("day",), value=(1, 3))
    rest = r.pushFilters([filt])
    # Residual: the In filter must come back for Spark to re-apply.
    assert rest == [filt]
    # Cover range [1, 4): day 0 pruned at planning, days 1-3 planned.
    assert (r.lo, r.hi) == (1, 4)
    parts = r.partitions()
    assert sorted(p.day for p in parts) == [1, 2, 3]
    assert all(p.days_planned == 3 for p in parts)


def test_gapped_in_end_to_end_prune_and_postfilter(spark):
    # Child session, same isolation as the registered audit query.
    s = spark.newSession()
    register(s)
    s.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        s.read.format("synthetic_bars_pd")
        .option("days", "4")
        .load()
        .filter(F.col("day").isin(1, 3))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.max("days_planned").alias("dp"))
    )
    rows = {r["day"]: r for r in df.collect()}
    # Gap day 2 is INSIDE the pushed cover range -> planned and read by
    # the source, then removed by Spark's residual post-filter.
    assert sorted(rows) == [1, 3], sorted(rows)
    # Pruning happened: 3 partitions planned (day 0 never generated),
    # observed through the data, not the plan.
    assert all(r["dp"] == 3 for r in rows.values()), rows
    assert all(r["n"] == 1440 for r in rows.values()), rows
