"""ann_dv_compaction file-level pins: the rewrite set equals the exact
threshold decision, pre-compaction files stay byte-identical (time
travel), no erased vector leaks from any post-delete read, compaction
preserves content, and the compacted+masked index serves IVF top-k
exactly like a fresh rebuild over the filtered corpus."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _inventory(paths):
    inv = {}
    for p in paths:
        for name in sorted(os.listdir(p)):
            fp = os.path.join(p, name)
            st = os.stat(fp)
            inv[fp] = (st.st_mtime_ns, st.st_size)
    return inv


def test_compaction_inventory_leaks_and_recall_parity(spark):
    from python_btc_etl_spark.plans.similarity import (
        ANNC_MOD_B,
        ANNC_REM_B,
        N_QUERIES,
        _annc_a_col,
        _annc_lifecycle,
        _annc_masked,
        _ivf_assign,
        _ivf_cents,
        _ivf_probes,
        _ivf_topk,
        _vecs,
    )

    base = tempfile.mkdtemp(prefix="annc_test_")
    try:
        life = _annc_lifecycle(spark, SF_SMALL, base)
        inv_before = _inventory(life["units"] + [life["wave_a"]])
        # exactly the over-threshold units rewrote, and the split is real
        for u, dec in life["decisions"].items():
            assert os.path.isdir(os.path.join(base, f"files/c_u{u}")) == dec
        assert set(life["decisions"].values()) == {True, False}
        # content preservation: v3 read == v2 read
        v2 = _annc_masked(spark, life["units"], [life["wave_a"]])
        v3 = _annc_masked(spark, life["manifest3"], [life["retained"]])
        agg = lambda df: tuple(  # noqa: E731
            df.agg(F.count(F.lit(1)), F.sum("vec_id")).collect()[0]
        )
        assert agg(v3) == agg(v2)
        # zero leaks: no wave-A vector in v3/v4, no wave-B vector in v4
        v4 = _annc_masked(
            spark, life["manifest3"], [life["retained"], life["wave_b"]]
        )
        assert v3.filter(_annc_a_col()).count() == 0
        assert v4.filter(_annc_a_col()).count() == 0
        assert v4.filter(F.col("vec_id") % ANNC_MOD_B == ANNC_REM_B).count() == 0
        # pre-compaction files byte-identical after the whole lifecycle
        assert _inventory(life["units"] + [life["wave_a"]]) == inv_before
        # recall parity: IVF top-k served from the compacted+masked v4
        # equals a fresh rebuild over the same filtered corpus
        e = _vecs(spark, SF_SMALL)
        cents = _ivf_cents(e)
        q = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        probes = _ivf_probes(q, cents)
        served = _ivf_topk(v4, probes)
        rebuild = _ivf_topk(
            _ivf_assign(e.join(v4.select("vec_id"), "vec_id", "semi"), cents),
            probes,
        )
        s = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in served.collect()}
        r = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in rebuild.collect()}
        assert s == r
    finally:
        shutil.rmtree(base, ignore_errors=True)
