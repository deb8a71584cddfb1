"""Dedup-index maintenance (plans/partitioned.dedup_index_lifecycle):
the file-level facts the SQL oracle cannot see — vacuum physically
deletes superseded units, the live snapshot survives and shrinks to
fewer units, and the append unit holds exactly the accepted batch."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from python_btc_etl_spark.plans.partitioned import (
    DIM_UNITS_V1,
    DIM_UNITS_V3,
    dedup_index_lifecycle,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def life(spark):
    base = tempfile.mkdtemp(prefix="dim_test_")
    try:
        yield dedup_index_lifecycle(spark, SF_SMALL, base), base, spark
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_vacuum_deletes_only_superseded_units(life):
    res, base, spark = life
    # Every superseded unit (all of v1 + the append unit) is gone...
    assert sorted(res["removed"]) == sorted(
        [f"c1_u{k}" for k in range(DIM_UNITS_V1)] + ["c2_batch"]
    )
    for unit in res["v1"] + [res["v2"][-1]]:
        assert not os.path.exists(unit), unit
    # ...and the live manifest's units all survive.
    for unit in res["v3"]:
        assert os.path.isdir(unit), unit
    assert len(res["v3"]) == DIM_UNITS_V3 < len(res["v2"])


def test_live_snapshot_reads_after_vacuum(life):
    res, base, spark = life
    v3 = spark.read.parquet(*res["v3"])
    (n_docs, n_sigs) = (
        v3.count(),
        v3.selectExpr("sum(size(hs))").collect()[0][0],
    )
    pre = {r[0]: r for r in res["pre_rows"]}
    # Compaction preserved the data: v3 == v2's pre-vacuum audit.
    assert n_docs == pre[2][1] and n_sigs == pre[2][2]
    # The append admitted at least one doc and rejected the planted
    # near-dups: v1 < v2 strictly, and by fewer docs than the batch.
    assert pre[1][1] < pre[2][1]


def test_vacuumed_snapshot_is_unreadable(life):
    res, base, spark = life
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        spark.read.parquet(*res["v1"]).count()
