"""GDPR deletion-vector cascade over the IVF index (plans/similarity):
the file-level facts the SQL oracle cannot see — registering a delete
NEVER rewrites a base index unit (same files, same sizes, same mtimes),
the tombstone unit is the only new data, and the masked read drops
exactly the tombstoned vec_ids."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _file_inventory(path: str) -> dict[str, tuple[int, float]]:
    inv = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            inv[p] = (st.st_size, st.st_mtime)
    return inv


def test_delete_never_rewrites_base_units(spark):
    from python_btc_etl_spark.plans.similarity import (
        ANN_DEL_MOD,
        ANN_DEL_REM,
        _ann_dv_read,
        _ann_dv_setup,
        _ivf_assign,
        _ivf_cents,
        _vecs,
    )

    base = tempfile.mkdtemp(prefix="ann_dv_test_")
    try:
        units, dv = _ann_dv_setup(spark, SF_SMALL, base)
        # the setup writes the DV AFTER the base units; assert the base
        # inventory is exactly the pre-delete inventory (no rewrite)
        pre = {u: _file_inventory(u) for u in units}
        # a second erasure request overwrites the DV unit only
        spark.read.parquet(*units).filter(
            F.col("vec_id") % ANN_DEL_MOD == ANN_DEL_REM
        ).select("vec_id").write.mode("overwrite").parquet(dv)
        post = {u: _file_inventory(u) for u in units}
        assert pre == post  # byte-identical base inventory
        assert os.path.exists(os.path.join(dv, "_SUCCESS"))

        # the masked read drops exactly the tombstoned rows
        full = spark.read.parquet(*units)
        masked = _ann_dv_read(spark, units, dv)
        n_del = full.filter(F.col("vec_id") % ANN_DEL_MOD == ANN_DEL_REM).count()
        assert n_del > 0  # the delete set is non-trivial at this SF
        assert masked.count() == full.count() - n_del
        assert (
            masked.filter(F.col("vec_id") % ANN_DEL_MOD == ANN_DEL_REM).count() == 0
        )

        # masked content == a rebuild from the filtered corpus (the
        # recall-parity premise, checked at the content level here)
        e = _vecs(spark, SF_SMALL)
        reb = _ivf_assign(
            e.filter(F.col("vec_id") % ANN_DEL_MOD != ANN_DEL_REM), _ivf_cents(e)
        )
        diff = (
            masked.select("vec_id", "cell_id")
            .exceptAll(reb.select("vec_id", "cell_id"))
            .unionAll(
                reb.select("vec_id", "cell_id").exceptAll(
                    masked.select("vec_id", "cell_id")
                )
            )
            .count()
        )
        assert diff == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
