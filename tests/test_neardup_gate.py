"""Streaming near-dup gate (plans/stream.neardup_gate_batch): the
high-water-mark replay guard and the order semantics, unit-tested
outside the stream exactly like tests/test_merge_upsert.py does for
merge_upsert_batch."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_btc_etl_spark.plans.stream import NDG_BATCHES, neardup_gate_batch


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _state_snapshot(spark, state):
    dec = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(state, "decisions")).collect()
    }
    idx = {
        (r["doc_id"], tuple(r["hs"]))
        for r in spark.read.parquet(os.path.join(state, "index")).collect()
    }
    return dec, idx


def test_gate_rejects_against_index_and_replay_noops(spark):
    base = tempfile.mkdtemp(prefix="ndg_test_")
    state = os.path.join(base, "state")
    try:
        text = "alpha beta gamma delta epsilon zeta eta theta"
        near = "alpha beta gamma delta epsilon zeta"  # prefix: jaccard >= 0.3
        far = "one two three four five six seven eight nine ten"
        b0 = _mk_docs(spark, [(0, text), (3 * NDG_BATCHES, far)])
        b1 = _mk_docs(spark, [(1, near), (NDG_BATCHES + 1, "unrelated words entirely here now")])
        assert all(r["doc_id"] % NDG_BATCHES == 0 for r in b0.collect())
        assert all(r["doc_id"] % NDG_BATCHES == 1 for r in b1.collect())
        neardup_gate_batch(spark, state, b0, 0)
        neardup_gate_batch(spark, state, b1, 1)
        dec, idx = _state_snapshot(spark, state)
        by_doc = {d: (a, fm) for d, _, a, fm in dec}
        # Batch 0: empty index, everything accepted.
        assert by_doc[0] == (True, -1)
        # Batch 1: doc 1 near-duplicates indexed doc 0 -> rejected.
        assert by_doc[1] == (False, 0)
        assert by_doc[NDG_BATCHES + 1][0] is True
        # Rejected docs never enter the index.
        assert 1 not in {d for d, _ in idx}
        # REPLAY: re-applying batch 1 (any engine batch_id) is a no-op.
        neardup_gate_batch(spark, state, b1, 7)
        assert _state_snapshot(spark, state) == (dec, idx)
        # A doc arriving later that matches the rejected-but-unindexed
        # doc's ORIGINAL still gates against the original.
        b2 = _mk_docs(spark, [(2, near)])
        neardup_gate_batch(spark, state, b2, 2)
        dec2, _ = _state_snapshot(spark, state)
        by_doc2 = {d: (a, fm) for d, _, a, fm in dec2}
        assert by_doc2[2] == (False, 0)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_gate_stream_rejects_planted_copies(spark):
    """End-to-end: every planted truncated copy (or its original, for
    wrap-around batches) must be rejected — the corpus is built so no
    planted pair is within-batch-exempt."""
    from python_btc_etl_spark.plans.dedup import TRUNC_EVERY, TRUNC_OFFSET
    from python_btc_etl_spark.plans.stream import stream_neardup_gate
    from tests.conftest import SF_SMALL

    rows = stream_neardup_gate(spark, SF_SMALL).collect()
    verdict = {r["doc_id"]: r["accepted"] for r in rows}
    n_docs = 500
    for orig in range(0, n_docs, TRUNC_EVERY):
        copy = orig + TRUNC_OFFSET
        assert not (verdict[orig] and verdict[copy]), (orig, copy)
