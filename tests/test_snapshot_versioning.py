"""Round-7 pins for the manifest-versioned snapshot table.

ADVICE r6 #3: the manifests.json cache was keyed only on the sf_dir
basename — regenerated testdata (or two parent dirs sharing a basename)
silently served stale snapshot files. The cache now stores a source
fingerprint (sf_dir + events.parquet mtime/size) and rebuilds on
mismatch.
"""

from __future__ import annotations

import json
import os

from tests.conftest import SF_SMALL


def test_manifest_fingerprint_invalidation(spark):
    from python_btc_etl_spark.plans.partitioned import (
        materialize_versioned_events,
        tt_table_path,
    )

    m1 = materialize_versioned_events(spark, SF_SMALL)
    fp = m1["_fingerprint"]
    assert fp.startswith(SF_SMALL + "|")

    # Cached call returns the same manifests without rebuilding.
    path = os.path.join(tt_table_path(SF_SMALL), "manifests.json")
    mtime_before = os.stat(path).st_mtime_ns
    assert materialize_versioned_events(spark, SF_SMALL) == m1
    assert os.stat(path).st_mtime_ns == mtime_before

    # A stale fingerprint (simulating regenerated testdata) forces a
    # rebuild that re-stamps the current source fingerprint.
    stale = dict(m1, _fingerprint="stale|0|0")
    with open(path, "w") as fh:
        json.dump(stale, fh)
    m2 = materialize_versioned_events(spark, SF_SMALL)
    assert m2["_fingerprint"] == fp
    with open(path) as fh:
        assert json.load(fh)["_fingerprint"] == fp


def test_incremental_scan_units_are_minimal(spark):
    """The CDC read must involve only the changed units: the one append
    unit for inserts and the swapped-out + rewritten pair for deletes."""
    from python_btc_etl_spark.plans.partitioned import (
        materialize_versioned_events,
    )

    m = materialize_versioned_events(spark, SF_SMALL)
    v1, v2, v3 = (set(m[v]) for v in ("1", "2", "3"))
    assert len(v2 - v1) == 1  # pure append commit
    assert len(v2 - v3) == 1  # copy-on-write swapped exactly one unit out
    assert len(v3 - v2) == 1  # ...for exactly one rewritten unit
    # Every other unit is shared byte-for-byte across snapshots.
    assert v1 <= v2 and len(v2 & v3) == len(v2) - 1
