"""Round-13 LM-gate GDPR interleave: the model-version-bump semantics
— scoring is UNAFFECTED by data-table deletes until the model
retrains (v0 batches equal the frozen gate bit-for-bit), and after a
version bump the model has genuinely forgotten the erased training
docs (every post-bump rate moves)."""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb

from tests.conftest import SF_SMALL


def _con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    return con


def test_v0_equals_frozen_gate_and_bumps_move_scores():
    from python_btc_etl_spark.plans.stream import (
        _sqg_oracle_sql,
        _sqgd_oracle_sql,
    )

    con = _con()
    rows = con.execute(
        f"""
        SELECT b.model_v,
               count(*) AS n,
               count(*) FILTER (WHERE a.accepted <> b.accepted
                                OR a.nll_rate_q <> b.nll_rate_q) AS moved
        FROM ({_sqg_oracle_sql()}) a
        JOIN ({_sqgd_oracle_sql()}) b USING (doc_id)
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    by_v = {v: (n, moved) for v, n, moved in rows}
    # every stream doc is covered exactly once per side
    assert sum(n for n, _ in by_v.values()) == con.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 5 <> 0"
    ).fetchone()[0]
    # v0 (pre-wave): deleting data-table rows alone changes NOTHING —
    # the frozen-model retention boundary, pinned
    assert by_v[0][1] == 0
    # post-bump versions exist and the retrain genuinely moved scores
    assert set(by_v) == {0, 1, 2}
    for v in (1, 2):
        assert by_v[v][1] > 0, by_v


def test_versioned_batch_replay_noop(spark):
    """A committed batch replays as a no-op regardless of the model
    version the replayer holds — the content-derived commit guard."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.catalog import load, spread
    from python_btc_etl_spark.plans.stream import (
        SQG_BASE_MOD,
        SQG_BATCHES,
        _sqg_committed,
        _sqg_model_from,
        quality_gate_batch_versioned,
    )

    d = spread(load(spark, SF_SMALL, "documents")).select("doc_id", "text")
    base_slice = d.filter(F.col("doc_id") % SQG_BASE_MOD == 0)
    b0 = d.filter(
        (F.col("doc_id") % SQG_BASE_MOD != 0) & (F.col("doc_id") % SQG_BATCHES == 0)
    )
    m0 = _sqg_model_from(spark, base_slice)
    root = tempfile.mkdtemp(prefix="sqgd_replay_")
    state = os.path.join(root, "state")
    try:
        quality_gate_batch_versioned(spark, state, m0, 0, b0)
        assert _sqg_committed(state) == [0]
        unit = os.path.join(state, "decisions", "b0")
        inv = {f: os.stat(os.path.join(unit, f)).st_mtime_ns for f in os.listdir(unit)}
        # replay with a DIFFERENT (bumped) model: the commit guard wins
        m1 = _sqg_model_from(spark, base_slice.filter(F.col("doc_id") % 7 != 3))
        quality_gate_batch_versioned(spark, state, m1, 1, b0)
        assert {
            f: os.stat(os.path.join(unit, f)).st_mtime_ns for f in os.listdir(unit)
        } == inv
    finally:
        shutil.rmtree(root, ignore_errors=True)
