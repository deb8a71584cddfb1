"""Streaming LM quality gate (plans/stream.quality_gate_batch): the
commit-marker replay guard, crash-point recovery, and the frozen-model
independence property — unit-tested outside the stream like
tests/test_neardup_gate.py does for the near-dup gate."""

from __future__ import annotations

import os
import shutil
import tempfile

from tests.conftest import SF_SMALL

from python_btc_etl_spark.plans.stream import (
    SQG_BASE_MOD,
    SQG_BATCHES,
    _sqg_committed,
    _sqg_model,
    quality_gate_batch,
)


def _slices(spark):
    from pyspark.sql import functions as F

    from python_btc_etl_spark.catalog import load

    d = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    strm = d.filter(F.col("doc_id") % SQG_BASE_MOD != 0)
    return [
        strm.filter(F.col("doc_id") % SQG_BATCHES == b).localCheckpoint()
        for b in range(SQG_BATCHES)
    ]


def _decisions(spark, state):
    done = _sqg_committed(state)
    return {
        tuple(r)
        for r in spark.read.parquet(
            *[os.path.join(state, "decisions", f"b{b}") for b in done]
        ).collect()
    }


def test_replay_noops_and_crash_recovery(spark):
    model = _sqg_model(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sqg_test_")
    state = os.path.join(base, "state")
    try:
        quality_gate_batch(spark, state, model, slices[0])
        quality_gate_batch(spark, state, model, slices[1])
        snap = _decisions(spark, state)
        assert _sqg_committed(state) == [0, 1]
        # replay of a COMMITTED batch is a no-op (identical state)
        quality_gate_batch(spark, state, model, slices[1])
        assert _decisions(spark, state) == snap
        # crash point: b1's attempt died before its _SUCCESS landed —
        # the batch is uncommitted, invisible, and the replay recomputes
        os.remove(os.path.join(state, "decisions", "b1", "_SUCCESS"))
        assert _sqg_committed(state) == [0]
        quality_gate_batch(spark, state, model, slices[1])
        assert _sqg_committed(state) == [0, 1]
        assert _decisions(spark, state) == snap  # byte-identical verdicts
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_frozen_model_makes_batches_independent(spark):
    """A batch's verdicts must not depend on which batches ran before
    it — the property that lets the gate scale horizontally."""
    model = _sqg_model(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sqg_ind_test_")
    try:
        s_alone = os.path.join(base, "alone")
        quality_gate_batch(spark, s_alone, model, slices[2])
        alone = _decisions(spark, s_alone)
        s_after = os.path.join(base, "after")
        for b in range(SQG_BATCHES):
            quality_gate_batch(spark, s_after, model, slices[b])
        after = {
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(s_after, "decisions", "b2")
            ).collect()
        }
        assert alone == after
        # verdicts are non-degenerate: both classes occur somewhere
        every = _decisions(spark, s_after)
        accepted = {r[-1] for r in every}
        assert accepted == {True, False}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_backoff_fires_only_on_unseen_bigrams(spark):
    """A batch written entirely in base-slice bigrams scores with zero
    backoff; alien vocabulary backs off on every bigram."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.catalog import load
    from python_btc_etl_spark.functions import text as TX

    model = _sqg_model(spark, SF_SMALL)
    d = load(spark, SF_SMALL, "documents")
    # take a real base doc's text: all its bigrams are in the model
    seen_text = (
        d.filter(F.col("doc_id") % SQG_BASE_MOD == 0)
        .filter(F.size(TX.words(F.col("text"))) >= 2)
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]["text"]
    )
    rows = [
        (SQG_BATCHES, seen_text),  # batch 0, fully seen
        (2 * SQG_BATCHES, "qqq www zzz rrr ttt yyy"),  # batch 0, fully alien
    ]
    batch = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = tempfile.mkdtemp(prefix="sqg_bo_test_")
    try:
        quality_gate_batch(spark, os.path.join(base, "s"), model, batch)
        got = {
            r["doc_id"]: r
            for r in spark.read.parquet(
                os.path.join(base, "s", "decisions", "b0")
            ).collect()
        }
        assert got[SQG_BATCHES]["n_backoff"] == 0
        alien = got[2 * SQG_BATCHES]
        assert alien["n_backoff"] == alien["n_bigrams"]
        assert not alien["accepted"]  # alien text lands past the cut
    finally:
        shutil.rmtree(base, ignore_errors=True)
