"""Hot-bucket guard on the LSH band join (round-4 verdict task #4).

Without the guard, N byte-identical documents share every one of their
16 band keys, so candidate generation pays N²/2 pairs PER BAND — the one
input shape that made the otherwise sub-quadratic MinHash-LSH path
quadratic. With LSH_BUCKET_CAP, any (band, key) bucket larger than the
cap is excluded from the pair join (byte-identical piles belong to
dedup_exact, which collapses them in one hash aggregate), so candidate
counts stay bounded while genuinely-near-dup pairs in sane buckets are
untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_btc_etl_spark import plans
from python_btc_etl_spark.functions import text as TX
from python_btc_etl_spark.plans import dedup

from .conftest import SF_SMALL


def _sig_df(spark, ids, seed_expr):
    """(doc_id, sig) rows whose signature is a shared 64-slot array —
    every doc with the same seed lands in the same bucket in all bands."""
    return spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
        "sig",
        F.expr(
            f"transform(sequence(1, {TX.MINHASH_PERMS}),"
            f" x -> CAST(x * {seed_expr} AS BIGINT))"
        ),
    )


def test_identical_pile_is_excluded_but_sane_pairs_survive(spark):
    # 1000 byte-identical docs: ungated, ~499,500 pairs x 16 bands.
    pile = _sig_df(spark, range(1000), 7)
    # Two docs sharing a DIFFERENT signature: a sane 2-member bucket.
    pair = _sig_df(spark, [5000, 5001], 11)
    cand = dedup._lsh_band_candidates(pile.unionByName(pair))
    rows = cand.collect()
    assert len(rows) == 1, rows
    assert (rows[0]["doc_a"], rows[0]["doc_b"]) == (5000, 5001)


def test_cap_boundary_inclusive(spark):
    # Exactly CAP members: still admitted (cap is a <= bound).
    at_cap = _sig_df(spark, range(dedup.LSH_BUCKET_CAP), 7)
    n = dedup._lsh_band_candidates(at_cap).count()
    expect = dedup.LSH_BUCKET_CAP * (dedup.LSH_BUCKET_CAP - 1) // 2
    assert n == expect, (n, expect)


def test_corpus_bucket_occupancy_below_cap(spark):
    """The guard must be invisible on the test corpus: its largest
    (band, key) bucket stays below LSH_BUCKET_CAP, so the oracle
    differential is byte-identical with or without the guard."""
    h = dedup._hashed_shingles(spark, SF_SMALL)
    sig = h.select("doc_id", TX.minhash_from_hashes(F.col("hs")).alias("sig"))
    bands = sig.select(
        "doc_id", F.posexplode(TX.lsh_band_keys(F.col("sig"))).alias("band", "key")
    )
    top = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert top <= dedup.LSH_BUCKET_CAP, top


def test_minhash_queries_still_registered_and_run(spark):
    for name in ("dedup_minhash_lsh", "minhash_calibration"):
        df = plans.REGISTRY[name].fn(spark, SF_SMALL)
        assert df.count() >= 1
