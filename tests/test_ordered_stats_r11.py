"""decile_stats_approx value invariants: conservation, dense bucket
ids, and the histogram-sketch error bound (per-bucket deviation from
perfect equi-depth is bounded by the cut bins' mass — boundaries snap
to bin edges, so no bucket can drift further than the bins it snapped
at)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_decile_approx_conservation_and_error_bound(spark):
    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.plans.ordered_stats import (
        DSA_STEP,
        N_DECILES,
        decile_stats_approx,
    )

    rows = {r["bucket"]: r for r in decile_stats_approx(spark, SF_SMALL).collect()}
    o = load(spark, SF_SMALL, "orders")
    n = o.count()
    # conservation + dense bucket ids 1..10
    assert set(rows) == set(range(1, N_DECILES + 1))
    assert sum(r["n"] for r in rows.values()) == n
    # buckets are ordered, non-overlapping price ranges
    for b in range(1, N_DECILES):
        assert rows[b]["hi"] <= rows[b + 1]["lo"] or (
            # bins snap at bin granularity: allow equality inside a bin
            int(rows[b]["hi"] // DSA_STEP) <= int(rows[b + 1]["lo"] // DSA_STEP)
        )
    # error bound: |n_k - N/10| <= 2 * (largest single bin's mass)
    max_bin = (
        o.groupBy(
            F.floor(F.col("o_totalprice") / DSA_STEP).cast("bigint").alias("q")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    for r in rows.values():
        assert abs(r["n"] * N_DECILES - n) <= 2 * N_DECILES * max_bin, (
            r["bucket"],
            r["n"],
            n,
            max_bin,
        )
    # and the reported ppm column is consistent with n
    for r in rows.values():
        assert r["abs_dev_ppm"] == (abs(r["n"] * N_DECILES - n) * 1000000) // n
