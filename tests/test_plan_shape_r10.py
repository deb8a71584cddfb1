"""Round-10 invariants and plan-shape pins.

1. Fixed-point log2 (plans/pipeline._fp_log2_dict): exact-deterministic
   integer shift-and-square — accuracy within 2^-LM_B of math.log2,
   monotone, and int64-safe at large inputs (the oracle mirrors it
   round-for-round, so this pins the SHARED algorithm).
2. LM scoring invariants: nll_fp >= 0 (L monotone + c12+1 <= c1+V),
   n_bigrams = len(words)-1 per doc, tercile gate nondegenerate.
3. Plan shape: the unigram/model broadcast into the scoring join, and
   the bigram pass is cached (InMemoryTableScan), not re-scanned.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fp_log2_exactness_and_monotonicity(spark):
    from python_btc_etl_spark.plans.pipeline import LM_B, _fp_log2_dict

    xs = (
        list(range(1, 600))
        + [2**k for k in range(1, 55)]
        + [2**k - 1 for k in range(2, 55)]
        + [123_456_789_012_345]
    )
    rows = _fp_log2_dict(
        spark.createDataFrame([(x,) for x in xs], "x bigint")
    ).collect()
    got = {r["x"]: r["lgv"] for r in rows}
    prev = None
    for x in sorted(xs):
        approx = got[x] / (1 << LM_B)
        assert abs(approx - math.log2(x)) < 2.0 / (1 << LM_B), (x, approx)
        if prev is not None:
            assert got[x] >= prev  # monotone
        prev = got[x]
    assert got[1] == 0 and got[2] == (1 << LM_B)  # exact at powers of two


def test_lm_score_invariants(spark):
    from python_btc_etl_spark.functions import text as TX
    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.plans.pipeline import lm_perplexity_score

    rows = lm_perplexity_score(spark, SF_SMALL).collect()
    assert all(r["nll_fp"] >= 0 for r in rows)
    assert all(r["nll_rate_q"] >= 0 for r in rows)
    n_words = {
        r["doc_id"]: r["n"]
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", F.size(TX.words(F.col("text"))).alias("n"))
        .collect()
    }
    for r in rows[:50]:
        assert r["n_bigrams"] == n_words[r["doc_id"]] - 1


def test_lm_gate_terciles_nondegenerate(spark):
    from python_btc_etl_spark.plans.pipeline import lm_perplexity_gate

    rows = lm_perplexity_gate(spark, SF_SMALL).collect()
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], []).append(r)
    assert set(by_band) == {"head", "middle", "tail"}
    n = len(rows)
    # each tercile within a loose band of N/3 (ties can shift mass)
    for b, rs in by_band.items():
        assert n / 10 <= len(rs) <= 2 * n / 3, (b, len(rs))
    # keep = head + middle; tail rejected
    assert all(r["keep"] == (r["band"] != "tail") for r in rows)
    # band boundaries respect the rate ordering
    assert max(r["nll_rate_q"] for r in by_band["head"]) <= min(
        r["nll_rate_q"] for r in by_band["middle"]
    )
    assert max(r["nll_rate_q"] for r in by_band["middle"]) <= min(
        r["nll_rate_q"] for r in by_band["tail"]
    )


def test_lm_scoring_plan_broadcasts_model(spark):
    from python_btc_etl_spark.plans.pipeline import _lm_scores

    plan = _executed_plan(_lm_scores(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan  # unigram/log-dictionary side
    assert "InMemoryTableScan" in plan  # cached bigram pass, not a rescan


def test_skew_mitigation_audit_values(spark):
    from python_btc_etl_spark.plans.scale import skew_join_salted_mitigation

    rows = {
        r["strategy"]: r
        for r in skew_join_salted_mitigation(spark, SF_SMALL).collect()
    }
    u, s = rows["unsalted"], rows["salted"]
    # result equality: both strategies' executed joins agree
    assert (u["n_rows"], u["checksum"]) == (s["n_rows"], s["checksum"])
    # the planted hot key concentrates >= 75% of rows on one reducer...
    assert u["max_share_bp"] >= 7000, u
    # ...and the salt demonstrably rebalances (>= 2x drop, ~4x measured)
    assert s["max_share_bp"] * 2 < u["max_share_bp"], (s, u)


def test_skew_mitigation_real_partition_balance(spark):
    """The REAL physical evidence the SQL oracle cannot see: actual
    spark_partition_id() row counts after hash-repartitioning on the
    plain vs salted key — the salted max partition must shrink."""
    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.functions import text as TX
    from python_btc_etl_spark.plans.scale import N_SALT

    e = load(spark, SF_SMALL, "events")
    fact = e.select(
        "event_id",
        F.when(F.col("user_id") % 4 != 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("k"),
    ).withColumn("salt", TX.hash28(F.col("event_id").cast("string")) % N_SALT)

    def max_part(df, *cols):
        counts = (
            df.repartition(32, *cols)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return max(r["c"] for r in counts)

    unsalted = max_part(fact, "k")
    salted = max_part(fact, "k", "salt")
    total = fact.count()
    # hot key (~72-75% of rows: user_id % 4 != 0) -> ONE real partition
    assert unsalted >= total * 7 // 10
    assert salted * 2 < unsalted, (salted, unsalted)


def test_skew_mitigation_single_fact_scan(spark):
    """Both strategies and both partition models must read the ONE
    cached fact pass — no events.parquet scan outside the cached
    relation. Every InMemoryTableScan re-prints its cached child plan
    (one FileScan each), so a plan with an EXTRA direct scan would show
    strictly more events.parquet mentions than InMemoryTableScans."""
    from python_btc_etl_spark.plans.scale import skew_join_salted_mitigation

    df = skew_join_salted_mitigation(spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "InMemoryTableScan" in plan
    assert plan.count("events.parquet") <= plan.count("InMemoryTableScan"), (
        plan.count("events.parquet"),
        plan.count("InMemoryTableScan"),
    )


def test_unigram_segmentation_tiles_words(spark):
    """The Viterbi E-step's hardest invariant: every word's chosen
    pieces concatenate back to EXACTLY the word (positions/lengths from
    the DP backtrace are a perfect tiling, pieces in order after the
    backward fold is reversed — here order-insensitively via rebuild)."""
    from python_btc_etl_spark.plans.pipeline import UNIG_MAXP, _unig_em

    segs, _ = _unig_em(spark, SF_SMALL)
    for seg in segs:
        bad = seg.filter(
            F.concat_ws("", F.reverse(F.col("ps"))) != F.col("word")
        ).count()
        assert bad == 0
        # piece lengths respect the cap
        too_long = seg.filter(
            F.exists("ps", lambda p: F.length(p) > UNIG_MAXP)
        ).count()
        assert too_long == 0


def test_unigram_em_stats_sane(spark):
    from python_btc_etl_spark.plans.pipeline import (
        UNIG_ROUNDS,
        unigram_lm_em_stats,
        unigram_lm_vocab,
    )

    rows = unigram_lm_em_stats(spark, SF_SMALL).collect()
    assert [r["round"] for r in rows] == list(range(1, UNIG_ROUNDS + 1))
    for r in rows:
        assert r["n_tokens"] > 0 and r["n_pieces"] > 0
        assert r["objective_fp"] < 0  # log-likelihoods, scaled integers
    vocab = unigram_lm_vocab(spark, SF_SMALL).collect()
    assert len(vocab) > 0
    # the trainer must actually discover multi-char pieces
    assert any(r["piece_len"] > 1 for r in vocab)


def test_unigram_segment_plan_is_udf_free_and_cached(spark):
    """The DP must live inside JVM projections (array folds), not a
    Python UDF, and the EM rounds must read the cached piece table."""
    from python_btc_etl_spark.plans.pipeline import (
        _unig_dic,
        _unig_pieces,
        _unig_seed_counts,
        _unig_segment,
        _unig_vflat,
    )
    from python_btc_etl_spark.catalog import managed_cache

    pieces = managed_cache(_unig_pieces(_unig_dic(spark, SF_SMALL)))
    seg = _unig_segment(_unig_vflat(pieces, _unig_seed_counts(pieces)))
    plan = _executed_plan(seg)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan  # counts + log dictionary sides


def test_trigram_backoff_fires_and_is_nonnegative(spark):
    from python_btc_etl_spark.plans.pipeline import (
        TGB_SPLIT,
        lm_trigram_backoff_score,
    )

    rows = lm_trigram_backoff_score(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(r["doc_id"] % TGB_SPLIT == 0 for r in rows)  # held-out only
    assert all(r["nll_fp"] >= 0 for r in rows)
    assert all(
        r["n_backoff2"] + r["n_backoff1"] <= r["n_trigrams"] for r in rows
    )
    # the held-out split must make the backoff path REAL
    assert sum(r["n_backoff2"] + r["n_backoff1"] for r in rows) > 0
