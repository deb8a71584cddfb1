"""Round-9 plan-shape pins.

1. Iterative BPE trainer (plans/pipeline.py): the loop's contract is
   "corpus scanned once, dictionary per round" — every per-round pair
   count must read the CACHED dictionary (InMemoryTableScan), never the
   documents parquet again, and the encode's dictionary join back to
   the corpus must be broadcast.
2. Non-degeneracy: the iterative table must genuinely diverge from the
   one-shot first-round ranking (a multi-char merge exists), and the
   recount must pay off on the corpus totals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_iter_round_reads_cached_dictionary(spark):
    from python_btc_etl_spark.catalog import load, managed_cache, spread
    from python_btc_etl_spark.functions import text as TX
    from python_btc_etl_spark.plans.pipeline import _bpe_iter_pairs

    d = spread(load(spark, SF_SMALL, "documents"))
    dic = managed_cache(
        d.select(F.explode(TX.words(F.col("text"))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dic.count()  # populate the cache, as the trainer's first round does
    from python_btc_etl_spark.plans.pipeline import _bpe_encode_col

    round_plan = _executed_plan(
        dic.select(
            F.col("cnt"),
            F.explode(_bpe_iter_pairs(_bpe_encode_col(F.col("word")))).alias("p"),
        )
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), "s1", "s2")
        .limit(1)
    )
    assert "InMemoryTableScan" in round_plan, round_plan
    # The argmax is a TakeOrderedAndProject over the tiny pair keyspace,
    # and the pair count partially aggregates map-side.
    assert "TakeOrderedAndProject" in round_plan, round_plan


def test_bpe_iter_encode_joins_broadcast(spark):
    from python_btc_etl_spark.plans.pipeline import bpe_iterative_encode_counts

    plan = _executed_plan(bpe_iterative_encode_counts(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bpe_iter_merges_diverge_from_first_round(spark):
    from python_btc_etl_spark.plans.pipeline import (
        BPE_ITER_ROUNDS,
        _bpe_iter_merges,
        _bpe_merges,
    )

    it = _bpe_iter_merges(spark, SF_SMALL)
    first = _bpe_merges(spark, SF_SMALL)
    assert len(it) == BPE_ITER_ROUNDS
    # Round 1 of the loop IS the first-round argmax.
    assert (it[0][0], it[0][1]) == first[0]
    # From rank 2 on, the recount sees post-merge statistics: at least
    # one winning pair involves a multi-char (already-merged) symbol,
    # which the one-shot character-pair ranking can never contain.
    assert any(len(s1) > 1 or len(s2) > 1 for s1, s2, _ in it), it
    # Counts are the argmax of their round: non-increasing is NOT
    # guaranteed in general BPE, but every count must be positive.
    assert all(n > 0 for _, _, n in it)


def test_bpe_iter_gain_invariants(spark):
    from python_btc_etl_spark.plans.pipeline import bpe_iterative_vs_first_gain

    row = bpe_iterative_vs_first_gain(spark, SF_SMALL).collect()[0]
    # Every merge only shrinks symbol counts: words <= tokens <= chars.
    assert row["n_words"] <= row["n_bpe_iter"] <= row["n_chars"]
    assert row["n_words"] <= row["n_bpe_first"] <= row["n_chars"]
    # The recount must pay off on this corpus (equal-size tables, the
    # iterative one spends rank-2+ slots on measured post-merge wins).
    assert row["n_bpe_iter"] < row["n_bpe_first"], dict(row.asDict())


def test_audio_fingerprint_blocked_join(spark):
    """audio_fingerprint_neardup: candidates come from the band
    equi-join — never an all-pairs comparison — and the fingerprint
    Arrow pass is cached so the self-join's two sides both read the
    InMemoryTableScan instead of decoding twice."""
    from python_btc_etl_spark.plans.multimodal import audio_fingerprint_neardup

    plan = _executed_plan(audio_fingerprint_neardup(spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_audio_apply_matches_group_structure(spark):
    """The planted corpus: clusters are EXACTLY the 4-doc groups (the
    xor-fold mix keeps cross-group Hamming >= 11), so the apply face
    drops exactly 3 docs per group to the group's min doc_id."""
    from python_btc_etl_spark.plans.multimodal import audio_dedup_apply

    rows = audio_dedup_apply(spark, SF_SMALL).collect()
    assert all(r["n_members"] == 4 for r in rows)
    assert all(r["canonical_doc"] == (r["dropped_doc"] // 4) * 4 for r in rows)
    n_docs = 500  # sf0.001 documents rows
    assert len(rows) == 3 * (n_docs // 4)


def test_quality_train_normal_equation_invariants(spark):
    """The learned weights are EXACT least squares: det(XᵀX) > 0, the
    residual is orthogonal to every feature column (Σ res·x = 0 — the
    normal equations themselves, exactly, in integers), and the learned
    rationals sit near the planted rule y = 3x1 - 2x2 + 7."""
    from fractions import Fraction

    from python_btc_etl_spark.plans.pipeline import (
        _qct_features,
        quality_train_normal_equations,
    )

    w = quality_train_normal_equations(spark, SF_SMALL).collect()[0]
    det = int(w["det"])
    assert det > 0
    w1, w2, b = (Fraction(int(w[k]), det) for k in ("w1_num", "w2_num", "b_num"))
    assert abs(w1 - 3) < Fraction(1, 10), w1
    assert abs(w2 + 2) < Fraction(1, 10), w2
    assert abs(b - 7) < 3, b  # the ±2 planted noise folds into the bias
    feats = _qct_features(spark, SF_SMALL).collect()
    r_dot_x1 = sum((r["y"] * det - (r["x1"] * int(w["w1_num"]) + r["x2"] * int(w["w2_num"]) + int(w["b_num"]))) * r["x1"] for r in feats)
    r_dot_x2 = sum((r["y"] * det - (r["x1"] * int(w["w1_num"]) + r["x2"] * int(w["w2_num"]) + int(w["b_num"]))) * r["x2"] for r in feats)
    r_dot_1 = sum(r["y"] * det - (r["x1"] * int(w["w1_num"]) + r["x2"] * int(w["w2_num"]) + int(w["b_num"])) for r in feats)
    assert r_dot_x1 == 0 and r_dot_x2 == 0 and r_dot_1 == 0


def test_quality_train_serve_gate_nondegenerate(spark):
    from python_btc_etl_spark.plans.pipeline import quality_train_serve_scores

    rows = quality_train_serve_scores(spark, SF_SMALL).collect()
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows), kept


def test_quality_train_overflow_guard_raises(spark):
    """decimal(38,0) overflow in non-ANSI mode yields silent NULLs; the
    guard must convert that into a LOUD error (the ADVICE-flagged silent
    cross-engine divergence: DuckDB HUGEINT raises, Spark must too)."""
    import pytest
    from pyspark.sql import functions as F

    from python_btc_etl_spark.plans.pipeline import _qct_overflow_guard

    one = spark.range(1)
    # Non-null value passes through untouched.
    ok = one.select(
        _qct_overflow_guard(F.lit(7).cast("decimal(38,0)"), "det").alias("d")
    ).collect()
    assert int(ok[0]["d"]) == 7
    # A null determinant (what a >38-digit overflow produces) raises.
    with pytest.raises(Exception, match="overflowed decimal"):
        one.select(
            _qct_overflow_guard(
                F.lit(None).cast("decimal(38,0)"), "det"
            ).alias("d")
        ).collect()


def test_semdedup_skew_guard(spark):
    """The hot-cell abort: passes on the real corpus (skew <= 1.43x
    measured), raises loudly on a degenerate single-cell assignment."""
    import pytest

    from python_btc_etl_spark.plans.dedup import (
        SD_CELL_SKEW,
        _sd_skew_guard,
        semdedup_cluster_prune,
    )

    # Real corpus: guard silent, query still returns its SD_CELLS rows.
    assert semdedup_cluster_prune(spark, SF_SMALL).count() > 0
    # Degenerate codebook: everything in one cell -> ValueError.
    bad = spark.range(200).selectExpr("id AS vec_id", "0 AS cell_id")
    with pytest.raises(ValueError, match="degenerate codebook"):
        _sd_skew_guard(bad)
    # Uniform assignment at the same N: silent.
    ok = spark.range(200).selectExpr("id AS vec_id", "id % 16 AS cell_id")
    _sd_skew_guard(ok)


def test_curriculum_bins_monotone_difficulty(spark):
    """Curriculum packing: bucket (difficulty) must be non-decreasing
    across bins, and within a bin last >= first."""
    from python_btc_etl_spark.plans.pipeline import curriculum_pack_order

    rows = curriculum_pack_order(spark, SF_SMALL).collect()
    assert len(rows) > 2
    prev_last = None
    for r in rows:
        assert r["first_bucket"] <= r["last_bucket"]
        # The global order is (bucket, doc_id), so every doc of bin i+1
        # follows every doc of bin i: buckets can never step back.
        if prev_last is not None:
            assert r["first_bucket"] >= prev_last, rows
        prev_last = r["last_bucket"]
    # The curriculum genuinely spans multiple difficulty levels.
    assert rows[0]["first_bucket"] < rows[-1]["last_bucket"]
