"""DSIR importance resampling (plans/pipeline): invariants and the
plan-shape facts the SQL oracle cannot see.

1. Semantics: a synthetic pool where one candidate doc is written in
   the target's vocabulary must out-weigh candidates that are not —
   the distribution-shift property DSIR exists for.
2. Weight identity: w_fp decomposes exactly as Σ c·(L(t+1)-L(r+1)) +
   n·(L(R+B)-L(T+B)) on a hand-checked toy model.
3. Plan shape: dsir_topk_selection selects via TakeOrderedAndProject
   (distributed top-K heaps), NEVER a single-partition global sort or
   ranking window; the bucket-model join is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_target_like_candidate_outweighs(spark, tmp_path):
    """Candidates phrased in the target language's n-grams must get a
    strictly higher importance weight than alien-vocabulary ones."""
    from python_btc_etl_spark.plans import pipeline as P

    target_text = "the quick brown fox jumps over the lazy dog " * 4
    docs = [
        # target slice (defines p)
        (1, target_text, P.DSIR_TARGET_LANG, "s", 1),
        (2, "the quick brown fox sleeps near the lazy dog", P.DSIR_TARGET_LANG, "s", 1),
        # candidates (define q; scored)
        (10, "the quick brown fox jumps over the lazy dog", "xx", "s", 1),
        (11, "zzz qqq www eee rrr ttt yyy uuu iii ooo", "xx", "s", 1),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(p)
    # _dsir_weights loads <sf_dir>/documents.parquet
    w = {r["doc_id"]: r["w_fp"] for r in P._dsir_weights(spark, str(tmp_path)).collect()}
    assert set(w) == {10, 11}
    assert w[10] > w[11]


def test_weight_decomposition_identity(spark):
    """w_fp recomputed from the raw model tables equals the query's."""
    from python_btc_etl_spark.plans import pipeline as P
    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.functions import text as TX

    d = load(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", TX.words(F.col("text")).alias("w")
    )
    tfe = P._dsir_feats(d.filter(F.col("lang") == P.DSIR_TARGET_LANG))
    cfe = P._dsir_feats(d.filter(F.col("lang") != P.DSIR_TARGET_LANG))
    t = {r["bucket"]: r["c"] for r in tfe.groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()}
    r_ = {r["bucket"]: r["c"] for r in cfe.groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()}
    T, R = sum(t.values()), sum(r_.values())
    xs = sorted({v + 1 for v in t.values()} | {v + 1 for v in r_.values()} | {1, T + P.DSIR_B, R + P.DSIR_B})
    lg = {
        row["x"]: row["lgv"]
        for row in P._fp_log2_dict(
            spark.createDataFrame([(x,) for x in xs], "x bigint")
        ).collect()
    }
    adj = lg[R + P.DSIR_B] - lg[T + P.DSIR_B]
    per_doc: dict[int, dict[int, int]] = {}
    for row in cfe.collect():
        per_doc.setdefault(row["doc_id"], {}).setdefault(row["bucket"], 0)
        per_doc[row["doc_id"]][row["bucket"]] += 1
    expect = {}
    for doc, counts in per_doc.items():
        n = sum(counts.values())
        expect[doc] = (
            sum(c * (lg[t.get(b, 0) + 1] - lg[r_[b] + 1]) for b, c in counts.items())
            + n * adj
        )
    got = {row["doc_id"]: row["w_fp"] for row in P._dsir_weights(spark, SF_SMALL).collect()}
    assert got == expect


def test_topk_plan_uses_take_ordered_not_global_window(spark):
    from python_btc_etl_spark.plans.pipeline import dsir_topk_selection

    df = dsir_topk_selection(spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    # no global (empty-partition-spec) ranking window anywhere
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    from python_btc_etl_spark.plans.pipeline import DSIR_K

    # candidate pool at SF_SMALL exceeds K, so top-K must fill exactly
    assert sum(r["n_selected"] for r in rows) == DSIR_K
    assert all(r["n_selected"] > 0 for r in rows)
