"""Streaming ANN ingestion gate (plans/annstream.ann_ingest_batch):
commit-marker replay guard, crash-point recovery at both write
boundaries, and cell-keyed partition pruning of the committed units —
the same matrix tests/test_stream_quality_gate.py pins for the LM gate
and tests/test_neardup_gate.py for the signature gate."""

from __future__ import annotations

import os
import shutil
import tempfile

from tests.conftest import SF_SMALL

from python_btc_etl_spark.plans.annstream import (
    ANN_SI_BATCHES,
    ANN_SI_RED_MOD,
    _sai_aug,
    _sai_cents,
    _sai_committed,
    _sai_index_read,
    ann_ingest_batch,
)


def _slices(spark):
    from pyspark.sql import functions as F

    aug = _sai_aug(spark, SF_SMALL)
    home = F.col("vec_id") % ANN_SI_BATCHES
    out = []
    for b in range(ANN_SI_BATCHES):
        cond = home == b
        if b >= 1:
            cond = cond | (
                (home == b - 1) & (F.col("vec_id") % ANN_SI_RED_MOD == 0)
            )
        out.append(
            aug.filter(cond)
            .withColumn("arrival", F.lit(b).cast("int"))
            .localCheckpoint()
        )
    return out


def _decisions(spark, state):
    done = _sai_committed(state)
    return {
        tuple(r)
        for r in spark.read.parquet(
            *[os.path.join(state, "decisions", f"b{b}") for b in done]
        ).collect()
    }


def test_replay_noops_and_crash_recovery(spark):
    cents = _sai_cents(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sai_test_")
    state = os.path.join(base, "state")
    try:
        ann_ingest_batch(spark, state, cents, slices[0])
        ann_ingest_batch(spark, state, cents, slices[1])
        snap = _decisions(spark, state)
        assert _sai_committed(state) == [0, 1]
        # replay of a COMMITTED batch is a no-op (identical state)
        ann_ingest_batch(spark, state, cents, slices[1])
        assert _decisions(spark, state) == snap
        # crash point A: b1's INDEX unit lost its _SUCCESS — the batch
        # is uncommitted, invisible, and the replay recomputes against
        # the SAME as-of index (only b0 committed) => identical verdicts
        os.remove(os.path.join(state, "index", "b1", "_SUCCESS"))
        assert _sai_committed(state) == [0]
        ann_ingest_batch(spark, state, cents, slices[1])
        assert _sai_committed(state) == [0, 1]
        assert _decisions(spark, state) == snap
        # crash point B: decisions landed but the index write died
        # entirely — commit marker absent, replay overwrites both units
        shutil.rmtree(os.path.join(state, "index", "b1"))
        assert _sai_committed(state) == [0]
        ann_ingest_batch(spark, state, cents, slices[1])
        assert _sai_committed(state) == [0, 1]
        assert _decisions(spark, state) == snap
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_verdicts_nondegenerate_and_order_driven(spark):
    """All three verdict classes occur, and the wrap-around planted
    copies (original home = last batch => copy arrives FIRST) reject
    the ORIGINAL — the gate is order-, not identity-, driven."""
    from python_btc_etl_spark.plans.annstream import (
        ANN_SI_COPY_MOD,
        ANN_SI_COPY_REM,
        ANN_SI_OFFSET,
    )

    cents = _sai_cents(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sai_nd_test_")
    state = os.path.join(base, "state")
    try:
        for b in range(ANN_SI_BATCHES):
            ann_ingest_batch(spark, state, cents, slices[b])
        by_reason: dict[str, set[int]] = {}
        for r in _decisions(spark, state):
            by_reason.setdefault(r[4], set()).add(r[0])
        assert set(by_reason) == {"accept", "neardup", "redelivery"}
        # wrap-around case: original with home == ANN_SI_BATCHES-1 whose
        # copy (home 0) was indexed first => the ORIGINAL is rejected
        wrapped = [
            v
            for v in by_reason["neardup"]
            if v < ANN_SI_OFFSET
            and v % ANN_SI_COPY_MOD == ANN_SI_COPY_REM
            and v % ANN_SI_BATCHES == ANN_SI_BATCHES - 1
        ]
        assert wrapped, "no wrap-around original was rejected"
        # and the forward case: copies rejected against their original
        forward = [v for v in by_reason["neardup"] if v >= ANN_SI_OFFSET]
        assert forward, "no planted copy was rejected"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cell_keyed_units_partition_prune(spark):
    """The committed units are cell-keyed parquet: a cell-equality
    filter must prune at the partition-directory level (the IVF probe
    read path's layout contract)."""
    from pyspark.sql import functions as F

    cents = _sai_cents(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sai_prune_test_")
    state = os.path.join(base, "state")
    try:
        ann_ingest_batch(spark, state, cents, slices[0])
        idx = _sai_index_read(spark, state, _sai_committed(state))
        cell = idx.select("cell_id").limit(1).collect()[0][0]
        pruned = idx.filter(F.col("cell_id") == int(cell))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell_id" in plan
        # pruned read touches strictly fewer files than the full unit
        n_all = idx.select(F.input_file_name()).distinct().count()
        n_pruned = pruned.select(F.input_file_name()).distinct().count()
        assert 0 < n_pruned < n_all
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_batch_side_broadcasts_index_never(spark):
    """The 100 TB asymmetry, pinned at the plan level: in a batch's
    near-dup join the BATCH side rides a BroadcastExchange while the
    committed-index side streams through the cell equi-join with no
    broadcast and no shuffle exchange of its own."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.plans.annstream import (
        ANN_SI_TAU,
        _sai_index_read,
    )
    from python_btc_etl_spark.functions import vectors as VX

    cents = _sai_cents(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sai_bcast_test_")
    state = os.path.join(base, "state")
    try:
        ann_ingest_batch(spark, state, cents, slices[0])
        from python_btc_etl_spark.plans.similarity import _ivf_assign

        asg = _ivf_assign(slices[1].select("vec_id", "v"), cents)
        idx = _sai_index_read(spark, state, _sai_committed(state))
        fresh = asg.join(idx.select("vec_id"), "vec_id", "left_anti")
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
        assert "BroadcastExchange" in plan
        # two index scans exist: the ids-only projection broadcast into
        # the replay-guard anti-join (metadata-sized — fine), and the
        # VECTOR-CARRYING scan that feeds the cell join. The heavy scan
        # must never sit INSIDE a BroadcastExchange subtree (the batch
        # side broadcasts; the index side streams). Subtrees are parsed
        # by the tree print's marker depth.
        lines = plan.splitlines()

        def depth(ln: str) -> int:
            for m in ("+- ", ":- "):
                if m in ln:
                    return ln.index(m)
            return -1  # root / non-tree line

        def is_heavy_index_scan(ln: str) -> bool:
            return (
                "FileScan parquet" in ln
                and "/state/index/" in ln
                and "v:array" in ln.replace(" ", "")
            )

        assert any(is_heavy_index_scan(ln) for ln in lines), plan
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            d = depth(ln)
            for sub in lines[i + 1 :]:
                sd = depth(sub)
                if sd >= 0 and sd <= d:
                    break  # left the broadcast subtree
                assert not is_heavy_index_scan(sub), (
                    "vector-carrying index scan inside a broadcast:\n" + plan
                )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_gdpr_wave_interleave_crash_replay_and_leak(spark):
    """Round-12 mid-stream GDPR deletes: a tombstone wave lands between
    micro-batches; a crashed wave is invisible (gate behaves as if no
    deletes exist), its replay is idempotent, deleted vectors stop
    matching and stop being served (leak counters 0), and re-delivered
    erased ids take the 'deleted' suppression verdict."""
    from pyspark.sql import functions as F

    from python_btc_etl_spark.plans.annstream import (
        ANN_SG_MOD,
        ANN_SG_WAVES,
        ANN_SI_OFFSET,
        _sgd_committed_waves,
        _sgd_land_wave,
        _sgd_tombstones,
    )

    cents = _sai_cents(spark, SF_SMALL)
    slices = _slices(spark)
    base = tempfile.mkdtemp(prefix="sai_gdpr_test_")
    state = os.path.join(base, "state")
    try:
        ann_ingest_batch(spark, state, cents, slices[0])
        # wave 0 lands... and crashes before its _SUCCESS
        _sgd_land_wave(spark, state, 0, _sai_committed(state), ANN_SG_WAVES[0])
        os.remove(os.path.join(state, "dv", "w0", "_SUCCESS"))
        assert _sgd_committed_waves(state) == []
        # batch 1 against the crashed wave: identical to the no-DV gate
        ann_ingest_batch(spark, state, cents, slices[1])
        snap_nodv = _decisions(spark, state)
        assert not any(r[4] == "deleted" for r in snap_nodv)
        # replay the wave (idempotent recompute from batches [0]) and
        # REPLAY batch 1 after un-committing it: now the wave is
        # visible and the verdicts change accordingly
        shutil.rmtree(os.path.join(state, "index", "b1"))
        shutil.rmtree(os.path.join(state, "decisions", "b1"))
        _sgd_land_wave(spark, state, 0, [0], ANN_SG_WAVES[0])
        assert _sgd_committed_waves(state) == [0]
        ann_ingest_batch(spark, state, cents, slices[1])
        dec = _decisions(spark, state)
        by_reason: dict[str, set[int]] = {}
        for r in dec:
            if r[1] == 1:  # batch-1 verdicts only
                by_reason.setdefault(r[4], set()).add(r[0])
        # suppression verdicts exist, and every one is a tombstoned id
        tomb = {
            r["vec_id"] for r in _sgd_tombstones(spark, state).collect()
        }
        assert by_reason.get("deleted"), "no suppression verdict fired"
        assert by_reason["deleted"] <= tomb
        # deleted vectors stop matching: some planted copy whose erased
        # original would have rejected it is now ACCEPTED
        flipped = [
            v
            for v in by_reason.get("accept", set())
            if v >= ANN_SI_OFFSET
            and (v - ANN_SI_OFFSET) % ANN_SG_MOD == ANN_SG_WAVES[0]
        ]
        assert flipped, "no copy was accepted after its original's erasure"
        # wave replay after more batches committed: recompute from the
        # SAME batch set is byte-stable (committed marker, no-op read)
        _sgd_land_wave(spark, state, 0, [0], ANN_SG_WAVES[0])
        assert _sgd_committed_waves(state) == [0]
        # leak: the serving read (committed units anti committed waves)
        # contains no tombstoned vector
        raw = _sai_index_read(spark, state, _sai_committed(state))
        tomb_df = _sgd_tombstones(spark, state)
        served = raw.join(tomb_df, "vec_id", "left_anti")
        assert served.join(tomb_df, "vec_id", "semi").count() == 0
        # ... and the raw units DO still hold them (erasure never
        # rewrote a committed index unit — DV-at-read contract)
        assert raw.join(tomb_df, "vec_id", "semi").count() == len(tomb)
    finally:
        shutil.rmtree(base, ignore_errors=True)
