"""Incremental IVF index lifecycle (plans/similarity): the file-level
facts the SQL oracle cannot see — vacuum deletes superseded units,
replays are idempotent at the unit level, and the cell-keyed v3 layout
actually prunes (a probe's answer needs only its cells' units)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_lifecycle_units_and_replay_idempotency(spark):
    from python_btc_etl_spark.plans.similarity import (
        ANN_INC_MOD,
        ANN_INC_REM,
        ANN_REPLAY_MOD,
        _ann_index_lifecycle,
    )

    base = tempfile.mkdtemp(prefix="ann_life_test_")
    try:
        life = _ann_index_lifecycle(spark, SF_SMALL, base)
        # vacuum removed every superseded unit from disk; v3 survives
        assert len(life["removed"]) == len(life["v1"]) + 1
        for unit in life["v1"] + [life["v2"][-1]]:
            assert not os.path.exists(unit), unit
        for unit in life["v3"]:
            assert os.path.exists(os.path.join(unit, "_SUCCESS")), unit
        # replay idempotency: re-delivered vectors (vec_id % REPLAY == 0,
        # already in v1) appear exactly ONCE in the live index
        idx = spark.read.parquet(*life["v3"])
        dup = (
            idx.groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .count()
        )
        assert dup == 0
        # and the batch vectors DID land
        n_batch = idx.filter(
            F.col("vec_id") % ANN_INC_MOD == ANN_INC_REM
        ).count()
        assert n_batch > 0
        assert ANN_REPLAY_MOD  # constants exist / documented
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_v3_cell_layout_prunes_probes(spark):
    """Partition-pruning evidence: one query's IVF answer computed from
    ONLY the v3 units covering its probed cells equals the answer from
    the full index — the append-broke/compaction-restored layout is
    real, not cosmetic."""
    from python_btc_etl_spark.plans.similarity import (
        ANN_UNITS_V3,
        _ann_index_lifecycle,
        _ivf_cents,
        _ivf_probes,
        _ivf_topk,
        _vecs,
    )

    base = tempfile.mkdtemp(prefix="ann_prune_test_")
    try:
        life = _ann_index_lifecycle(spark, SF_SMALL, base)
        e = _vecs(spark, SF_SMALL)
        cents = _ivf_cents(e)
        q = e.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        probes = _ivf_probes(q, cents)
        probed_cells = [r["pcell"] for r in probes.collect()]
        needed = sorted({c % ANN_UNITS_V3 for c in probed_cells})
        # the probe does NOT need every unit for this to be a pruning test
        full = [
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in _ivf_topk(spark.read.parquet(*life["v3"]), probes).collect()
        ]
        pruned_units = [life["v3"][k] for k in needed]
        pruned = [
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in _ivf_topk(spark.read.parquet(*pruned_units), probes).collect()
        ]
        assert sorted(full) == sorted(pruned)
        assert len(full) > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_recall_parity_holds(spark):
    from python_btc_etl_spark.plans.similarity import ann_recall_incremental

    rows = ann_recall_incremental(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(r["same_topk"] for r in rows)
    assert all(r["hits_incremental"] == r["hits_rebuild"] for r in rows)
