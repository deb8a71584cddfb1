"""Word-entropy quality score (plans/pipeline): closed-form anchors the
oracle comparison can't distinguish from a consistently-wrong L —
checked against math.log2 directly."""

from __future__ import annotations

import math

from python_btc_etl_spark.plans.pipeline import LM_B, word_entropy_quality


def test_entropy_closed_forms(spark, tmp_path):
    docs = [
        (1, "a a a a a a a a", "en", "s", 1),  # single token: H = 0
        (2, "a b c d e f g h", "en", "s", 1),  # all distinct: H = log2(8) = 3
        (3, "a a b b c c d d", "en", "s", 1),  # uniform pairs: H = 2
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(p)
    rows = {r["doc_id"]: r for r in word_entropy_quality(spark, str(tmp_path)).collect()}
    assert rows[1]["nh_fp"] == 0 and rows[1]["h_rate_q"] == 0
    # exact at powers of two: L(2^k) = k << LM_B, so nh_fp = n*H << LM_B
    assert rows[2]["nh_fp"] == 8 * 3 * (1 << LM_B)
    assert rows[3]["nh_fp"] == 8 * 2 * (1 << LM_B)
    for doc_id, (n, h) in {1: (8, 0.0), 2: (8, 3.0), 3: (8, 2.0)}.items():
        approx = rows[doc_id]["nh_fp"] / (n * (1 << LM_B))
        assert abs(approx - h) < 1e-4, (doc_id, approx)
        assert rows[doc_id]["n_tokens"] == n
    assert [rows[i]["n_distinct"] for i in (1, 2, 3)] == [1, 8, 4]
    # entropy is maximal for the all-distinct doc
    assert rows[2]["h_rate_q"] > rows[3]["h_rate_q"] > rows[1]["h_rate_q"]


def test_entropy_sanity_checks(spark, tmp_path):
    """math.log2 cross-check on a non-uniform distribution."""
    text = "x " * 5 + "y " * 3 + "z " * 2  # counts 5,3,2; n=10
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, text.strip(), "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(p)
    row = word_entropy_quality(spark, str(tmp_path)).collect()[0]
    n = 10
    h_true = -sum(c / n * math.log2(c / n) for c in (5, 3, 2))
    approx = row["nh_fp"] / (n * (1 << LM_B))
    assert abs(approx - h_true) < 1e-3
    assert row["nh_fp"] >= 0
