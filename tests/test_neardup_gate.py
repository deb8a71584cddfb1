"""Streaming near-dup gate (plans/stream.neardup_gate_batch): the
high-water-mark replay guard and the order semantics, unit-tested
outside the stream exactly like tests/test_merge_upsert.py does for
merge_upsert_batch."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from python_btc_etl_spark.plans.stream import (
    NDG_BATCHES,
    _ndg_committed,
    neardup_gate_batch,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _state_snapshot(spark, state):
    done = _ndg_committed(state)
    dec = {
        tuple(r)
        for r in spark.read.parquet(
            *[os.path.join(state, "decisions", f"b{b}") for b in done]
        ).collect()
    }
    idx = {
        (r["doc_id"], tuple(r["hs"]))
        for r in spark.read.parquet(
            *[os.path.join(state, "index", f"b{b}") for b in done]
        ).collect()
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


def test_gate_replay_after_partial_crash_is_idempotent(spark):
    """The ADVICE-flagged crash window: an attempt that wrote its
    decisions unit but died before the index unit committed must be
    invisible (uncommitted) and a replay must converge to exactly the
    clean-run state — no duplicate decision/index rows, and the as-of
    index the replay gates against excludes the partial attempt."""
    base = tempfile.mkdtemp(prefix="ndg_crash_")
    state = os.path.join(base, "state")
    clean_state = os.path.join(base, "clean")
    try:
        text = "alpha beta gamma delta epsilon zeta eta theta"
        near = "alpha beta gamma delta epsilon zeta"
        b0 = _mk_docs(spark, [(0, text)])
        b1 = _mk_docs(spark, [(1, near)])
        for st in (state, clean_state):
            neardup_gate_batch(spark, st, b0, 0)
            neardup_gate_batch(spark, st, b1, 1)
        # Crash simulation 1: batch 1's index unit never committed
        # (decisions written, _SUCCESS missing) -> batch 1 is NOT done.
        os.remove(os.path.join(state, "index", "b1", "_SUCCESS"))
        assert _ndg_committed(state) == [0]
        neardup_gate_batch(spark, state, b1, 9)  # replay, renumbered
        assert _ndg_committed(state) == [0, 1]
        assert _state_snapshot(spark, state) == _state_snapshot(spark, clean_state)
        # Crash simulation 2: decisions unit half-written (stray part
        # files, no commit) -> replay overwrites, identical end state.
        shutil.rmtree(os.path.join(state, "index", "b1"))
        os.remove(os.path.join(state, "decisions", "b1", "_SUCCESS"))
        neardup_gate_batch(spark, state, b1, 11)
        assert _state_snapshot(spark, state) == _state_snapshot(spark, clean_state)
        # Committed replays still no-op.
        snap = _state_snapshot(spark, state)
        neardup_gate_batch(spark, state, b1, 13)
        assert _state_snapshot(spark, state) == snap
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


def test_gdpr_wave_crash_replay_and_stop_matching(spark):
    """Round-12 mid-stream GDPR deletes on the signature gate: a
    crashed wave is invisible (gate behaves as if no deletes exist),
    replay is idempotent, erased signatures stop matching (a copy
    whose erased near-dup would have rejected it is accepted), the
    serving leak counter is 0, and index units are never rewritten."""
    from python_btc_etl_spark.plans.stream import (
        NDG_DV_MOD,
        NDG_DV_WAVES,
        _ndg_committed_waves,
        _ndg_land_wave,
        _ndg_tombstones,
    )

    # synthetic corpus: near-identical pairs (a, a+1000) arriving one
    # batch apart; ids chosen so the batch-0 member of the first pair
    # is erased by wave 0 (id % 7 == NDG_DV_WAVES[0]) and the second
    # pair's batch-0 member is NOT.
    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    tb = "red orange yellow green blue indigo violet cyan magenta teal " * 3
    # id 45: 45%3=0 (batch 0), 45%7=3 (erased by wave 0)
    # id 1045: 1045%3=1 (batch 1, near-copy of 45)
    # id 9: 9%3=0, 9%7=2 (survives wave 0)
    # id 1009: 1009%3=1 (batch 1, near-copy of 9; vocabulary disjoint
    # from pair A so erasing 45 cannot free 1009)
    rows = [
        (45, ta),
        (1045, ta + "omega"),
        (9, tb),
        (1009, tb + "omega"),
    ]
    docs = _mk_docs(spark, rows)
    b0 = docs.filter(F.col("doc_id") % NDG_BATCHES == 0)
    b1 = docs.filter(F.col("doc_id") % NDG_BATCHES == 1)
    base = tempfile.mkdtemp(prefix="ndg_gdpr_test_")
    state = os.path.join(base, "state")
    try:
        neardup_gate_batch(spark, state, b0, 0)
        inv0 = {
            p: os.stat(p).st_mtime_ns
            for p in [
                os.path.join(state, "index", "b0", f)
                for f in os.listdir(os.path.join(state, "index", "b0"))
            ]
        }
        # wave 0 lands... and crashes before its _SUCCESS
        _ndg_land_wave(spark, state, 0, _ndg_committed(state), NDG_DV_WAVES[0])
        os.remove(os.path.join(state, "dv", "w0", "_SUCCESS"))
        assert _ndg_committed_waves(state) == []
        # batch 1 under the crashed wave: BOTH copies rejected (the
        # plain-gate behavior — the orphan wave is invisible)
        neardup_gate_batch(spark, state, b1, 1)
        dec1 = {
            r["doc_id"]: r["accepted"]
            for r in spark.read.parquet(
                os.path.join(state, "decisions", "b1")
            ).collect()
        }
        assert dec1 == {1045: False, 1009: False}
        # replay the wave to completion, un-commit batch 1, replay it:
        # the erased original (45) stops matching -> its copy 1045 is
        # now ACCEPTED; 9 survives the wave so 1009 stays rejected
        shutil.rmtree(os.path.join(state, "index", "b1"))
        shutil.rmtree(os.path.join(state, "decisions", "b1"))
        _ndg_land_wave(spark, state, 0, [0], NDG_DV_WAVES[0])
        assert _ndg_committed_waves(state) == [0]
        tomb = {r["doc_id"] for r in _ndg_tombstones(spark, state).collect()}
        assert tomb == {45}
        neardup_gate_batch(spark, state, b1, 1)
        dec1 = {
            r["doc_id"]: r["accepted"]
            for r in spark.read.parquet(
                os.path.join(state, "decisions", "b1")
            ).collect()
        }
        assert dec1 == {1045: True, 1009: False}
        # wave replay is a no-op on the committed marker
        _ndg_land_wave(spark, state, 0, [0], NDG_DV_WAVES[0])
        assert _ndg_committed_waves(state) == [0]
        # serving leak: live index (committed units anti waves) holds
        # no tombstoned doc; the raw units still do (never rewritten)
        raw = spark.read.parquet(
            *[os.path.join(state, "index", f"b{i}") for i in _ndg_committed(state)]
        )
        tomb_df = _ndg_tombstones(spark, state)
        assert raw.join(tomb_df, "doc_id", "left_anti").join(
            tomb_df, "doc_id", "semi"
        ).count() == 0
        assert raw.join(tomb_df, "doc_id", "semi").count() == 1
        # batch-0 index unit untouched through the whole matrix
        assert inv0 == {
            p: os.stat(p).st_mtime_ns
            for p in [
                os.path.join(state, "index", "b0", f)
                for f in os.listdir(os.path.join(state, "index", "b0"))
            ]
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
