"""Round-13 plan-shape pins: the streaming multimodal fingerprint
gate keeps the 100 TB asymmetry — the batch's banded probe is
broadcast, the standing phash index (masked by broadcast GDPR
tombstones) streams through the band equi-join and never sits inside
a BroadcastExchange subtree."""

from __future__ import annotations

import os
import shutil
import tempfile

from tests.test_plan_shape_r12 import _no_heavy_scan_under_broadcast


def test_phash_gate_batch_broadcast_index_streams(spark):
    from pyspark.sql import functions as F

    from python_btc_etl_spark.plans.mmstream import (
        _PH_IDX_SCHEMA,
        _mpg_land_wave,
        _ph_bands,
        phash_gate_batch,
    )
    from python_btc_etl_spark.plans.multimodal import PH_HD_MAX, _phash_batches
    from python_btc_etl_spark.plans.stream import _ndg_committed, _ndg_tombstones

    base = tempfile.mkdtemp(prefix="mpg_plan_")
    state = os.path.join(base, "state")
    try:
        b0 = spark.createDataFrame([(i,) for i in range(0, 60, 3)], "doc_id bigint")
        phash_gate_batch(spark, state, b0, 0)
        _mpg_land_wave(spark, state, 0, _ndg_committed(state), 0)
        # reproduce the gate's batch-1 probe join exactly
        b1 = spark.createDataFrame([(i,) for i in range(1, 60, 3)], "doc_id bigint")
        ph = b1.mapInPandas(_phash_batches, schema=_PH_IDX_SCHEMA).localCheckpoint()
        idx = spark.read.schema(_PH_IDX_SCHEMA).parquet(
            os.path.join(state, "index", "b0")
        )
        tomb = _ndg_tombstones(spark, state)
        assert tomb is not None
        idx = idx.join(F.broadcast(tomb), "doc_id", "left_anti")
        hamming = F.bit_count(F.col("ph_b").bitwiseXOR(F.col("ph_c"))).cast("int")
        hits = (
            F.broadcast(_ph_bands(ph, "batch_id", "ph_b"))
            .join(_ph_bands(idx, "corpus_id", "ph_c"), ["j", "band"])
            .filter(hamming <= PH_HD_MAX)
            .groupBy("batch_id")
            .agg(F.min("corpus_id").alias("first_match"))
        )
        hits.collect()
        plan = hits._jdf.queryExecution().executedPlan().toString()
        # tombstone anti-join AND the batch probe are broadcasts
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

        def heavy(ln: str) -> bool:
            return "FileScan parquet" in ln and "/state/index/" in ln

        assert any(heavy(ln) for ln in plan.splitlines()), plan
        _no_heavy_scan_under_broadcast(plan, heavy)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_vseq_gate_batch_broadcast_index_streams(spark):
    """The video containment gate keeps the same asymmetry: batch
    shingles broadcast into the (h1, h2) equi-join; the standing
    shingle index (masked by broadcast GDPR tombstones) streams
    through it and never sits inside a BroadcastExchange subtree."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.plans.mmstream import (
        _VSG_IDX_SCHEMA,
        _vsg_land_wave,
        vseq_gate_batch,
    )
    from python_btc_etl_spark.plans.multimodal import (
        VSEQ_DEN,
        VSEQ_NUM,
        _vseq_batches,
    )
    from python_btc_etl_spark.plans.stream import _ndg_committed, _ndg_tombstones

    base = tempfile.mkdtemp(prefix="vsg_plan_")
    state = os.path.join(base, "state")
    try:
        b0 = spark.createDataFrame([(i,) for i in range(0, 60, 3)], "doc_id bigint")
        vseq_gate_batch(spark, state, b0, 0)
        _vsg_land_wave(spark, state, 0, _ndg_committed(state), 0)
        # reproduce the gate's batch-1 probe join exactly
        b1 = spark.createDataFrame([(i,) for i in range(1, 60, 3)], "doc_id bigint")
        sh = b1.mapInPandas(
            _vseq_batches, schema="doc_id bigint, h1 bigint, h2 bigint"
        )
        ns = sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sh")
        )
        shn = sh.join(F.broadcast(ns), "doc_id").localCheckpoint()
        idx = spark.read.schema(_VSG_IDX_SCHEMA).parquet(
            os.path.join(state, "index", "b0")
        )
        tomb = _ndg_tombstones(spark, state)
        assert tomb is not None
        idx = idx.join(F.broadcast(tomb), "doc_id", "left_anti")
        probe = shn.select(
            F.col("doc_id").alias("batch_id"), "h1", "h2",
            F.col("n_sh").alias("n_b"),
        )
        cand = (
            F.broadcast(probe)
            .join(
                idx.select(
                    F.col("doc_id").alias("corpus_id"), "h1", "h2",
                    F.col("n_sh").alias("n_c"),
                ),
                ["h1", "h2"],
            )
            .groupBy("batch_id", "corpus_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("shared"),
                F.first("n_b").alias("n_b"),
                F.first("n_c").alias("n_c"),
            )
        )
        hits = (
            cand.filter(
                F.col("shared") * VSEQ_DEN
                >= F.least(F.col("n_b"), F.col("n_c")) * VSEQ_NUM
            )
            .groupBy("batch_id")
            .agg(F.min("corpus_id").alias("first_match"))
        )
        hits.collect()
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

        def heavy(ln: str) -> bool:
            return "FileScan parquet" in ln and "/state/index/" in ln

        assert any(heavy(ln) for ln in plan.splitlines()), plan
        _no_heavy_scan_under_broadcast(plan, heavy)
    finally:
        shutil.rmtree(base, ignore_errors=True)
