"""Relative hot-bucket guard on the hyperplane-LSH self-join (round-5
verdict task #1).

A pile of identical (or co-directional) embeddings shares every
hyperplane sign, so without a guard it lands in ONE of the 2^LSH_PLANES
buckets and the bucket equi-join pays |pile|^2/2 candidate pairs — the
exact pathology the MinHash band join was guarded against in round 5.
Unlike the band key space (huge), the hyperplane bucket space is only
2^planes wide, so legitimate occupancy grows linearly with N and an
absolute cap would misfire at larger scale factors; the guard is
therefore RELATIVE: a bucket is excluded when its occupancy exceeds
EMB_BUCKET_SKEW x the uniform expectation ceil(N / 2^planes). An
identical pile sits at ~2^planes x expectation (64x here, vs the 16x
bound); measured legitimate skew on the test corpus stays under 5x at
every SF, which test_corpus_occupancy_below_guard locks in so the
DuckDB differential is unchanged by the guard.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from python_btc_etl_spark import plans
from python_btc_etl_spark.functions import vectors as VX
from python_btc_etl_spark.plans import dedup

from .conftest import SF_MEDIUM, SF_SMALL

NBUCKETS = 2 ** VX.LSH_PLANES


def _bucketed_df(spark, rows):
    """(vec_id, bucket) rows — the guard only looks at the bucket column."""
    return spark.createDataFrame(rows, "vec_id long, bucket int")


def test_identical_pile_is_excluded_but_sane_bucket_survives(spark):
    # 1000 co-directional vectors -> one bucket; plus a sane 2-member
    # bucket. N=1002, expectation ceil(1002/64)=16, bound 16*16=256:
    # the pile (1000) is excluded, the pair (2) survives.
    rows = [(i, 0) for i in range(1000)] + [(5000, 1), (5001, 1)]
    ok = dedup._emb_guarded(_bucketed_df(spark, rows))
    got = sorted(r["vec_id"] for r in ok.collect())
    assert got == [5000, 5001], got[:5]


def test_guard_bound_inclusive_and_exclusive(spark):
    # 64 rows total -> expectation ceil(64/64)=1, bound = SKEW = 16.
    # A 16-member bucket is exactly at the bound: admitted.
    rows = [(i, 0) for i in range(16)] + [(100 + i, 1 + i) for i in range(48)]
    ok = dedup._emb_guarded(_bucketed_df(spark, rows))
    assert ok.filter(F.col("bucket") == 0).count() == 16
    # One more member (keeping N=64 by dropping a singleton): excluded.
    rows = [(i, 0) for i in range(17)] + [(100 + i, 1 + i) for i in range(47)]
    ok = dedup._emb_guarded(_bucketed_df(spark, rows))
    assert ok.filter(F.col("bucket") == 0).count() == 0


def test_corpus_occupancy_below_guard(spark):
    """The guard must be invisible on the driver's corpus at both the
    unit-test SF and the correctness-gate SF: max bucket occupancy stays
    under EMB_BUCKET_SKEW x ceil(N/2^planes), so the oracle differential
    is byte-identical with or without the guard."""
    for sf in (SF_SMALL, SF_MEDIUM):
        aug = dedup.vecs_with_scaled_copies(spark, sf).withColumn(
            "bucket", VX.lsh_bucket(F.col("v"))
        )
        occ = aug.groupBy("bucket").agg(F.count(F.lit(1)).alias("bkt_n"))
        r = occ.agg(
            F.max("bkt_n").alias("mx"), F.sum("bkt_n").alias("n")
        ).collect()[0]
        bound = dedup.EMB_BUCKET_SKEW * math.ceil(r["n"] / NBUCKETS)
        assert r["mx"] <= bound, (sf, r["mx"], bound)


def test_cosine_query_still_registered_and_finds_planted_dups(spark):
    df = plans.REGISTRY["dedup_embedding_cosine"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) >= 1
    # The planted scaled copies are cosine ~1.0 pairs (vec_id, vec_id+OFFSET).
    planted = [
        r
        for r in rows
        if r["vec_b"] == r["vec_a"] + dedup.VEC_OFFSET and r["cosine"] > 0.999
    ]
    assert planted, rows[:5]
