"""Round-12 plan-shape pins: the DV-aware streaming ANN gate keeps the
100 TB asymmetry (tombstones broadcast, heavy index scan never), and
the video shingle detector is cached + blocked (no cartesian product,
one Arrow pass)."""

from __future__ import annotations

import os
import shutil
import tempfile

from tests.conftest import SF_SMALL


def _depth(ln: str) -> int:
    for m in ("+- ", ":- "):
        if m in ln:
            return ln.index(m)
    return -1


def _no_heavy_scan_under_broadcast(plan: str, heavy) -> None:
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = _depth(ln)
        for sub in lines[i + 1 :]:
            sd = _depth(sub)
            if sd >= 0 and sd <= d:
                break  # left the broadcast subtree
            assert not heavy(sub), f"heavy scan inside broadcast:\n{plan}"


def test_gdpr_gate_tombstones_broadcast_index_streams(spark):
    """With committed tombstone waves present, the gate's live-index
    read anti-joins the waves via a BROADCAST (GDPR-sized side) while
    the vector-carrying index scan still never sits inside any
    BroadcastExchange subtree — the round-11 asymmetry survives the
    round-12 DV face."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.functions import vectors as VX
    from python_btc_etl_spark.plans.annstream import (
        ANN_SG_WAVES,
        ANN_SI_TAU,
        _sai_cents,
        _sai_committed,
        _sai_index_read,
        _sgd_land_wave,
        _sgd_tombstones,
        ann_ingest_batch,
    )
    from python_btc_etl_spark.plans.similarity import _ivf_assign
    from tests.test_stream_ann_ingest import _slices

    cents = _sai_cents(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sai_dv_bcast_")
    state = os.path.join(base, "state")
    try:
        ann_ingest_batch(spark, state, cents, slices[0])
        _sgd_land_wave(spark, state, 0, _sai_committed(state), ANN_SG_WAVES[0])
        # reproduce the gate's batch-1 near-dup join exactly
        asg = _ivf_assign(slices[1].select("vec_id", "v"), cents)
        idx = _sai_index_read(spark, state, _sai_committed(state))
        tomb = _sgd_tombstones(spark, state)
        assert tomb is not None
        idx = idx.join(F.broadcast(tomb), "vec_id", "left_anti")
        alive = asg.join(F.broadcast(tomb), "vec_id", "left_anti")
        fresh = alive.join(idx.select("vec_id"), "vec_id", "left_anti")
        hits = (
            F.broadcast(fresh.select("vec_id", "v", "cell_id"))
            .join(
                idx.select(
                    F.col("vec_id").alias("ivec_id"),
                    F.col("v").alias("iv"),
                    "cell_id",
                ),
                "cell_id",
            )
            .filter(VX.cosine(F.col("v"), F.col("iv")) >= F.lit(ANN_SI_TAU))
            .groupBy("vec_id")
            .agg(F.min("ivec_id").alias("first_match"))
        )
        hits.collect()
        plan = hits._jdf.queryExecution().executedPlan().toString()
        # tombstone anti-join is a broadcast (the wave is GDPR-sized)
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

        def heavy(ln: str) -> bool:
            return (
                "FileScan parquet" in ln
                and "/state/index/" in ln
                and "v:array" in ln.replace(" ", "")
            )

        assert any(heavy(ln) for ln in plan.splitlines()), plan
        _no_heavy_scan_under_broadcast(plan, heavy)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_video_pairs_cached_and_blocked(spark):
    """video_seq_neardup: the shingle Arrow pass is pinned behind an
    InMemoryTableScan (the inverted-index self-join would otherwise
    run the GIF encode/decode twice), and the plan contains no
    cartesian product — pairs only meet on the (h1, h2) bucket key."""
    from python_btc_etl_spark.plans.multimodal import _vseq_pairs

    df = _vseq_pairs(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
