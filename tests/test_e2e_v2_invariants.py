"""Non-degeneracy invariants for the round-8 composed pipeline.

The cross-engine differential proves Spark == DuckDB; these pins prove
the pipeline is doing REAL work on the current corpus — if a future
testdata regeneration makes a gate or the span detector degenerate
(everything kept, nothing removed, merges never firing), this fails
loudly instead of the composition silently becoming a no-op.
"""

from __future__ import annotations

from tests.conftest import SF_MEDIUM


def test_v2_pipeline_is_non_degenerate(spark):
    from python_btc_etl_spark.plans.pipeline import e2e_corpus_build_v2

    rows = {r["split"]: r for r in e2e_corpus_build_v2(spark, SF_MEDIUM).collect()}
    assert set(rows) == {"train", "val", "test"}
    total_docs = sum(r["n_docs"] for r in rows.values())
    total_tokens = sum(r["n_tokens"] for r in rows.values())
    total_removed = sum(r["tokens_removed"] for r in rows.values())
    total_bpe = sum(r["n_bpe_tokens"] for r in rows.values())
    # Gates kept a real subset (not everything, not nothing).
    assert 0 < total_docs < 500, total_docs
    # Span removal actually removed spans somewhere.
    assert total_removed > 0, rows
    # BPE merges actually fired: real tokens strictly fewer than the
    # character count they started from, but at least one per word.
    assert total_bpe >= total_tokens > 0, rows
    for r in rows.values():
        assert r["n_ctx_windows"] == r["n_bpe_tokens"] // 512, r
        assert 1 <= r["n_langs"] <= 4, r
