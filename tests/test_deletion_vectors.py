"""Deletion-vector read path (plans/partitioned): the file-level facts
the SQL oracle cannot see — a delete wave NEVER rewrites a base unit
(mtime + size pinned across both GDPR waves), the read is a positional
anti-join, and old versions keep reading deleted rows."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _file_inventory(units):
    inv = {}
    for unit in units:
        for name in sorted(os.listdir(unit)):
            p = os.path.join(unit, name)
            st = os.stat(p)
            inv[p] = (st.st_mtime_ns, st.st_size)
    return inv


def test_delete_waves_never_rewrite_base_units(spark):
    from python_btc_etl_spark.plans.partitioned import (
        DV_DEL_MOD,
        DV_DEL_REMS,
        _dv_lifecycle,
        _dv_read,
    )

    base = tempfile.mkdtemp(prefix="dv_test_")
    try:
        life = _dv_lifecycle(spark, SF_SMALL, base)
        # _dv_lifecycle already ran both waves; the invariant to pin is
        # that the DV units exist AND the base units were written before
        # every DV unit (append-only: no base byte postdates a delete).
        inv = _file_inventory(life["data"] + life["idx"])
        base_latest = max(m for m, _ in inv.values())
        for v in (2, 3):
            for dvp in life["dv"][v]:
                assert os.path.exists(os.path.join(dvp, "_SUCCESS"))
        # re-running a read at every version must not alter any base file
        for version in (1, 2, 3):
            dvs = [p for v in (2, 3) if v <= version for p in life["dv"][v]]
            _dv_read(spark, life["data"], dvs, "data").count()
            _dv_read(spark, life["idx"], dvs, "idx").count()
        assert _file_inventory(life["data"] + life["idx"]) == inv
        assert base_latest  # base files committed (sanity)

        # old snapshots still see deleted rows; new ones don't
        gone = DV_DEL_REMS[0]
        v1 = _dv_read(spark, life["data"], [], "data")
        v2 = _dv_read(spark, life["data"], life["dv"][2], "data")
        n_v1 = v1.filter(F.col("doc_id") % DV_DEL_MOD == gone).count()
        n_v2 = v2.filter(F.col("doc_id") % DV_DEL_MOD == gone).count()
        assert n_v1 > 0 and n_v2 == 0

        # the GDPR cascade: the dedup index's signatures vanish too
        i2 = _dv_read(spark, life["idx"], life["dv"][2], "idx")
        assert i2.filter(F.col("doc_id") % DV_DEL_MOD == gone).count() == 0

        # the read is a positional LEFT-ANTI join (plan-shape pin)
        plan = v2._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_dv_key_is_positional_not_logical(spark):
    """Deleting by (unit, pos) — a DV entry pointing at a position must
    remove exactly that physical row even if another unit holds a row
    with the same doc_id-derived attributes. Construct a DV touching one
    (unit, pos) and assert only that unit's row count drops."""
    from python_btc_etl_spark.plans.partitioned import _dv_lifecycle, _dv_read

    base = tempfile.mkdtemp(prefix="dv_pos_test_")
    try:
        life = _dv_lifecycle(spark, SF_SMALL, base)
        full = spark.read.parquet(*life["data"])
        per_unit_before = {
            r["unit"]: r["c"]
            for r in full.groupBy("unit").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        one = os.path.join(base, "files/dv_surgical")
        spark.createDataFrame(
            [("data", 0, 1)], "tbl string, unit int, pos int"
        ).write.mode("overwrite").parquet(one)
        after = _dv_read(spark, life["data"], [one], "data")
        per_unit_after = {
            r["unit"]: r["c"]
            for r in after.groupBy("unit").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        for u, c in per_unit_before.items():
            expect = c - 1 if u == 0 else c
            assert per_unit_after[u] == expect, (u, c, per_unit_after[u])
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compaction_rewrites_exactly_over_threshold_units(spark):
    """Round-11 merge-on-read maintenance: the rewrite set equals the
    exact-threshold decision, base units and the wave-A DV file survive
    untouched (time travel), positions re-ordinalize in rewritten
    units, and no GDPR-deleted row leaks from any post-delete read."""
    from python_btc_etl_spark.plans.partitioned import (
        DV_DEL_MOD,
        DVC_DEN,
        DVC_NUM,
        DVC_WAVE_A,
        DVC_WAVE_B,
        _dv_read,
        _dvc_lifecycle,
    )

    base = tempfile.mkdtemp(prefix="dvc_test_")
    try:
        life = _dvc_lifecycle(spark, SF_SMALL, base)
        inv_before = _file_inventory(
            life["data"] + life["idx"] + life["wave_a"]
        )
        # the rewrite decision is reproducible from the files, and the
        # c_{tag}_u{k} inventory matches it exactly
        for (tag, u), dec in life["decisions"].items():
            cpath = os.path.join(base, f"files/c_{tag}_u{u}")
            assert os.path.isdir(cpath) == dec, (tag, u, dec)
        # some units rewrote, some did not (the threshold splits)
        decs = set(life["decisions"].values())
        assert decs == {True, False}
        # rewritten units re-ordinalized: pos is dense 1..n per unit
        for tag in ("data", "idx"):
            for p in life["manifest3"][tag]:
                if "/c_" not in p:
                    continue
                got = spark.read.parquet(p)
                n = got.count()
                assert (
                    got.agg(
                        F.min("pos"), F.max("pos"), F.count_distinct("pos")
                    ).collect()[0]
                    == (1, n, n)
                )
        # leak counter stays 0: wave-A docs invisible at v3 and v4,
        # wave-B docs invisible at v4
        v3d = _dv_read(spark, life["manifest3"]["data"], life["retained"], "data")
        v4dvs = life["retained"] + life["wave_b"]
        v4d = _dv_read(spark, life["manifest3"]["data"], v4dvs, "data")
        v4i = _dv_read(spark, life["manifest3"]["idx"], v4dvs, "idx")
        rem = F.col("doc_id") % DV_DEL_MOD
        assert v3d.filter(rem.isin(list(DVC_WAVE_A))).count() == 0
        assert v4d.filter(rem.isin(list(DVC_WAVE_A + DVC_WAVE_B))).count() == 0
        assert v4i.filter(rem.isin(list(DVC_WAVE_A + DVC_WAVE_B))).count() == 0
        # compaction is content-preserving: v3 read == v2 read
        v2d = _dv_read(spark, life["data"], life["wave_a"], "data")
        agg = lambda df: tuple(  # noqa: E731
            df.agg(F.count(F.lit(1)), F.sum("doc_id")).collect()[0]
        )
        assert agg(v3d) == agg(v2d)
        # every pre-compaction file byte-identical after the whole
        # lifecycle: old versions remain exactly readable
        assert _file_inventory(
            life["data"] + life["idx"] + life["wave_a"]
        ) == inv_before
        # the threshold itself is what the decision used (recompute)
        dv_a = spark.read.parquet(*life["wave_a"])
        for tag, units in (("data", life["data"]), ("idx", life["idx"])):
            src = spark.read.parquet(*units)
            rows = {
                r["unit"]: r["c"]
                for r in src.groupBy("unit").agg(F.count(F.lit(1)).alias("c")).collect()
            }
            dels = {
                r["unit"]: r["c"]
                for r in dv_a.filter(F.col("tbl") == tag)
                .groupBy("unit")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            for u, c in rows.items():
                assert life["decisions"][(tag, u)] == (
                    dels.get(u, 0) * DVC_DEN >= c * DVC_NUM
                )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_gdpr_txn_crash_matrix(spark):
    """Round-12 cross-table atomic commit: kill the erasure cascade at
    each dangerous point -> committed readers see the erasure in BOTH
    tables or in NEITHER (half_applied pinned 0 at every stage), the
    naive directory-listing reader demonstrates the hazard the txn
    closes, replay completes idempotently, and base units are never
    rewritten by staging, crashing, or replaying."""
    from python_btc_etl_spark.plans.partitioned import (
        DV_DEL_MOD,
        DVTX_WAVE_1,
        _dv_read,
        _dvtx_base,
        _dvtx_committed_dvs,
        _dvtx_half_applied,
        _dvtx_on_disk_dvs,
        _dvtx_stage,
    )

    rem = F.col("doc_id") % DV_DEL_MOD

    for crash in ("after_data", "after_dvs"):
        base = tempfile.mkdtemp(prefix=f"dvtx_{crash}_")
        try:
            data_units, idx_units = _dvtx_base(spark, SF_SMALL, base)
            base_d = spark.read.parquet(*data_units)
            base_i = spark.read.parquet(*idx_units)
            n_d, n_i = base_d.count(), base_i.count()
            inv0 = _file_inventory(data_units + idx_units)

            # crash mid-transaction
            _dvtx_stage(
                spark, base, data_units, idx_units, 1, DVTX_WAVE_1,
                crash=crash,
            )
            assert _dvtx_committed_dvs(base) == []  # nothing committed
            dvs = _dvtx_committed_dvs(base)
            dat = _dv_read(spark, data_units, dvs, "data")
            idx = _dv_read(spark, idx_units, dvs, "idx")
            # NEITHER table changed for committed readers
            assert dat.count() == n_d and idx.count() == n_i
            assert _dvtx_half_applied(base_d, base_i, dat, idx) == 0
            # ... while the staged orphan(s) genuinely exist on disk,
            # and would half-apply under the naive pre-txn reader when
            # only the data-side DV landed
            on_disk = _dvtx_on_disk_dvs(base)
            assert len(on_disk) == (1 if crash == "after_data" else 2)
            if crash == "after_data":
                datn = _dv_read(spark, data_units, on_disk, "data")
                idxn = _dv_read(spark, idx_units, on_disk, "idx")
                assert _dvtx_half_applied(base_d, base_i, datn, idxn) > 0

            # replay to completion: idempotent overwrite + commit
            _dvtx_stage(spark, base, data_units, idx_units, 1, DVTX_WAVE_1)
            dvs = _dvtx_committed_dvs(base)
            assert len(dvs) == 2  # one manifest covering BOTH tables
            dat = _dv_read(spark, data_units, dvs, "data")
            idx = _dv_read(spark, idx_units, dvs, "idx")
            assert dat.filter(rem.isin(list(DVTX_WAVE_1))).count() == 0
            assert idx.filter(rem.isin(list(DVTX_WAVE_1))).count() == 0
            assert _dvtx_half_applied(base_d, base_i, dat, idx) == 0

            # double replay is a no-op: the manifest file is untouched
            mpath = os.path.join(base, "manifests/txn_1.json")
            m0 = os.stat(mpath).st_mtime_ns
            _dvtx_stage(spark, base, data_units, idx_units, 1, DVTX_WAVE_1)
            assert os.stat(mpath).st_mtime_ns == m0
            assert len(_dvtx_committed_dvs(base)) == 2

            # base units never rewritten through the whole matrix
            assert _file_inventory(data_units + idx_units) == inv0
        finally:
            shutil.rmtree(base, ignore_errors=True)


def test_gdpr_txn3_crash_matrix(spark):
    """Round-13 three-table atomic commit: kill the erasure cascade
    after EACH of the three DV writes (data / sig-index / vector-index)
    -> committed readers see the erasure in ALL tables or in NONE
    (every pairwise half_applied pinned 0 at every stage), the naive
    directory-listing reader leaks exactly the pairs the kill point
    half-applies, replay completes idempotently, and base units are
    never rewritten."""
    from python_btc_etl_spark.plans.partitioned import (
        DV_DEL_MOD,
        DVTX_WAVE_1,
        _dv_read,
        _dvt3_vec_units,
        _dvtx_base,
        _dvtx_committed_dvs,
        _dvtx_half_applied,
        _dvtx_on_disk_dvs,
        _dvtx_stage_tables,
    )

    rem = F.col("doc_id") % DV_DEL_MOD

    for crash_after in (1, 2, 3):
        base = tempfile.mkdtemp(prefix=f"dvt3_c{crash_after}_")
        try:
            data_units, idx_units = _dvtx_base(spark, SF_SMALL, base)
            vec_units = _dvt3_vec_units(spark, SF_SMALL, base)
            tables = [
                ("data", data_units),
                ("idx", idx_units),
                ("vec", vec_units),
            ]
            bases = {
                tag: spark.read.parquet(*units) for tag, units in tables
            }
            counts = {tag: df.count() for tag, df in bases.items()}
            inv0 = _file_inventory(data_units + idx_units + vec_units)

            # crash mid-transaction after the crash_after-th write
            _dvtx_stage_tables(
                spark, base, tables, 1, DVTX_WAVE_1, crash_after=crash_after
            )
            assert _dvtx_committed_dvs(base) == []  # nothing committed
            reads = {
                tag: _dv_read(spark, units, [], tag)
                for tag, units in tables
            }
            for tag, df in reads.items():  # NO table changed (committed)
                assert df.count() == counts[tag]
            # the staged orphans exist on disk...
            on_disk = _dvtx_on_disk_dvs(base)
            assert len(on_disk) == crash_after
            # ...and the naive reader half-applies exactly the pairs
            # that straddle the kill point (committed never does)
            naive = {
                tag: _dv_read(spark, units, on_disk, tag)
                for tag, units in tables
            }
            staged = {"data", "idx", "vec"}
            done = [t for t, _ in tables][:crash_after]
            for a, b in (("data", "idx"), ("data", "vec"), ("idx", "vec")):
                assert (
                    _dvtx_half_applied(
                        bases[a], bases[b], reads[a], reads[b]
                    )
                    == 0
                )
                leak = _dvtx_half_applied(
                    bases[a], bases[b], naive[a], naive[b]
                )
                if (a in done) != (b in done):  # straddles the kill
                    assert leak > 0, (crash_after, a, b)
                else:
                    assert leak == 0, (crash_after, a, b)
            assert staged >= set(done)

            # replay to completion: idempotent overwrite + ONE commit
            _dvtx_stage_tables(spark, base, tables, 1, DVTX_WAVE_1)
            dvs = _dvtx_committed_dvs(base)
            assert len(dvs) == 3  # one manifest covering all THREE
            reads = {
                tag: _dv_read(spark, units, dvs, tag)
                for tag, units in tables
            }
            for df in reads.values():
                assert df.filter(rem.isin(list(DVTX_WAVE_1))).count() == 0
            for a, b in (("data", "idx"), ("data", "vec"), ("idx", "vec")):
                assert (
                    _dvtx_half_applied(
                        bases[a], bases[b], reads[a], reads[b]
                    )
                    == 0
                )

            # double replay is a no-op: the manifest file is untouched
            mpath = os.path.join(base, "manifests/txn_1.json")
            m0 = os.stat(mpath).st_mtime_ns
            _dvtx_stage_tables(spark, base, tables, 1, DVTX_WAVE_1)
            assert os.stat(mpath).st_mtime_ns == m0
            assert len(_dvtx_committed_dvs(base)) == 3

            # base units never rewritten through the whole matrix
            assert (
                _file_inventory(data_units + idx_units + vec_units) == inv0
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)


def test_gdpr_txn4_crash_matrix(spark):
    """Round-13 FOUR-table atomic commit (documents / sig index / ANN
    embedding index / multimodal phash index): kill the erasure cascade
    after EACH of the four DV writes -> committed readers see the
    erasure in ALL tables or in NONE (the N-table non-uniformity
    counter ha_all pinned 0 at every stage), the naive
    directory-listing reader leaks exactly when the kill point
    half-applies, replay completes idempotently under ONE manifest, and
    base units are never rewritten."""
    from python_btc_etl_spark.plans.partitioned import (
        DV_DEL_MOD,
        DVTX_WAVE_1,
        _dv_read,
        _dvt3_vec_units,
        _dvt4_ha_any,
        _dvt4_ph_units,
        _dvtx_base,
        _dvtx_committed_dvs,
        _dvtx_on_disk_dvs,
        _dvtx_stage_tables,
    )

    rem = F.col("doc_id") % DV_DEL_MOD

    for crash_after in (1, 2, 3, 4):
        base = tempfile.mkdtemp(prefix=f"dvt4_c{crash_after}_")
        try:
            data_units, idx_units = _dvtx_base(spark, SF_SMALL, base)
            vec_units = _dvt3_vec_units(spark, SF_SMALL, base)
            ph_units = _dvt4_ph_units(spark, SF_SMALL, base)
            tables = [
                ("data", data_units),
                ("idx", idx_units),
                ("vec", vec_units),
                ("ph", ph_units),
            ]
            all_units = data_units + idx_units + vec_units + ph_units
            bases = {tag: spark.read.parquet(*us) for tag, us in tables}
            counts = {tag: df.count() for tag, df in bases.items()}
            inter = (
                bases["data"]
                .select("doc_id")
                .join(bases["idx"].select("doc_id"), "doc_id")
                .join(bases["vec"].select("doc_id"), "doc_id")
            )
            inv0 = _file_inventory(all_units)

            # crash mid-transaction after the crash_after-th write
            _dvtx_stage_tables(
                spark, base, tables, 1, DVTX_WAVE_1, crash_after=crash_after
            )
            assert _dvtx_committed_dvs(base) == []  # nothing committed
            reads = {
                tag: _dv_read(spark, us, [], tag) for tag, us in tables
            }
            for tag, df in reads.items():  # NO table changed (committed)
                assert df.count() == counts[tag]
            assert _dvt4_ha_any(inter, bases, reads) == 0
            on_disk = _dvtx_on_disk_dvs(base)
            assert len(on_disk) == crash_after
            naive = {
                tag: _dv_read(spark, us, on_disk, tag) for tag, us in tables
            }
            leak = _dvt4_ha_any(inter, bases, naive)
            if crash_after < 4:  # some table straddles the kill point
                assert leak > 0, crash_after
            else:  # all four staged, only the manifest missing:
                assert leak == 0  # naive is uniform (but premature)

            # replay to completion: idempotent overwrite + ONE commit
            _dvtx_stage_tables(spark, base, tables, 1, DVTX_WAVE_1)
            dvs = _dvtx_committed_dvs(base)
            assert len(dvs) == 4  # one manifest covering all FOUR
            reads = {
                tag: _dv_read(spark, us, dvs, tag) for tag, us in tables
            }
            for df in reads.values():
                assert df.filter(rem.isin(list(DVTX_WAVE_1))).count() == 0
            assert _dvt4_ha_any(inter, bases, reads) == 0

            # double replay is a no-op: the manifest file is untouched
            mpath = os.path.join(base, "manifests/txn_1.json")
            m0 = os.stat(mpath).st_mtime_ns
            _dvtx_stage_tables(spark, base, tables, 1, DVTX_WAVE_1)
            assert os.stat(mpath).st_mtime_ns == m0
            assert len(_dvtx_committed_dvs(base)) == 4

            # base units never rewritten through the whole matrix
            assert _file_inventory(all_units) == inv0
        finally:
            shutil.rmtree(base, ignore_errors=True)
