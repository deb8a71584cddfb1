"""Streaming multimodal fingerprint gate (plans/mmstream): replay
guard, order semantics, crash idempotence, and the GDPR tombstone
face, unit-tested outside the stream exactly like
tests/test_neardup_gate.py does for the signature gate."""

from __future__ import annotations

import os
import shutil
import tempfile

from python_btc_etl_spark.plans.mmstream import (
    MPG_BATCHES,
    MPG_DV_MOD,
    _mpg_land_wave,
    phash_gate_batch,
)
from python_btc_etl_spark.plans.multimodal import PH_BITS, PH_HD_MAX
from python_btc_etl_spark.plans.stream import _ndg_committed


def _phash(doc_id: int) -> int:
    """The closed-form 60-bit aHash of the deterministic raster corpus
    (the same function the oracle computes in SQL and the engine
    reproduces through the real decode → resize → threshold path)."""
    g, t = doc_id // 4, doc_id % 4
    h = 0
    for i in range(PH_BITS):
        base = (g * 37 + i * 11 + (g % 13) * (i % 7) * 5) % 256
        v = 255 - base if i < t else base
        if v >= 128:
            h |= 1 << i
    return h


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _mk(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id bigint")


def _snapshot(spark, state):
    done = _ndg_committed(state)
    dec = {
        tuple(r)
        for r in spark.read.parquet(
            *[os.path.join(state, "decisions", f"b{b}") for b in done]
        ).collect()
    }
    idx = {
        tuple(r)
        for r in spark.read.parquet(
            *[os.path.join(state, "index", f"b{b}") for b in done]
        ).collect()
    }
    return dec, idx


def _far_id(anchor: int, batch: int) -> int:
    """First doc id in ``batch``'s residue class from a different
    raster group whose hash sits beyond the Hamming gate of
    ``anchor``'s (exists by the corpus's cross-group statistics)."""
    a = _phash(anchor)
    x = batch
    while True:
        if x // 4 != anchor // 4 and _hamming(_phash(x), a) > PH_HD_MAX:
            return x
        x += MPG_BATCHES


def test_phash_gate_verdicts_and_replay(spark):
    base = tempfile.mkdtemp(prefix="mpg_test_")
    state = os.path.join(base, "state")
    try:
        # group 0: docs 0..3 are near-identical (variant t flips bits
        # 0..t-1, so Hamming(0, 1) == 1 <= PH_HD_MAX)
        assert _hamming(_phash(0), _phash(1)) <= PH_HD_MAX
        far = _far_id(0, 1)
        b0 = _mk(spark, [0])
        b1 = _mk(spark, [1, far])
        phash_gate_batch(spark, state, b0, 0)
        phash_gate_batch(spark, state, b1, 1)
        dec, idx = _snapshot(spark, state)
        by_doc = {d: (a, fm) for d, _, a, fm in dec}
        assert by_doc[0] == (True, -1)  # empty index: accepted
        assert by_doc[1] == (False, 0)  # near-twin of indexed 0
        assert by_doc[far][0] is True  # distant group: accepted
        assert 1 not in {d for d, _ in idx}  # rejected never indexed
        # REPLAY of a committed batch (any engine batch_id) is a no-op.
        phash_gate_batch(spark, state, b1, 9)
        assert _snapshot(spark, state) == (dec, idx)
        # Doc 2 (group 0, batch 2) still gates against the ORIGINAL
        # even though the rejected near-twin never entered the index.
        phash_gate_batch(spark, state, _mk(spark, [2]), 2)
        dec2, _ = _snapshot(spark, state)
        assert {d: (a, fm) for d, _, a, fm in dec2}[2] == (False, 0)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_phash_gate_crash_replay_idempotent(spark):
    """An attempt that wrote decisions but died before the index unit
    committed is invisible; the replay converges to the clean-run
    state with no duplicate rows."""
    base = tempfile.mkdtemp(prefix="mpg_crash_")
    state = os.path.join(base, "state")
    clean = os.path.join(base, "clean")
    try:
        b0, b1 = _mk(spark, [0]), _mk(spark, [1])
        for st in (state, clean):
            phash_gate_batch(spark, st, b0, 0)
            phash_gate_batch(spark, st, b1, 1)
        os.remove(os.path.join(state, "index", "b1", "_SUCCESS"))
        assert _ndg_committed(state) == [0]
        phash_gate_batch(spark, state, b1, 7)  # replay, renumbered
        assert _ndg_committed(state) == [0, 1]
        assert _snapshot(spark, state) == _snapshot(spark, clean)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_phash_gate_gdpr_wave_stops_matching(spark):
    """After a committed tombstone wave erases the indexed original,
    a later-arriving group member is ACCEPTED instead of rejected —
    erased fingerprints stop matching. The wave write is idempotent
    and never rewrites an index unit."""
    base = tempfile.mkdtemp(prefix="mpg_dv_")
    state = os.path.join(base, "state")
    try:
        assert 0 % MPG_DV_MOD == 0  # doc 0 is in the rem=0 wave class
        phash_gate_batch(spark, state, _mk(spark, [0]), 0)
        inv = {
            p: os.stat(p).st_mtime_ns
            for p in [
                os.path.join(state, "index", "b0", f)
                for f in os.listdir(os.path.join(state, "index", "b0"))
            ]
        }
        _mpg_land_wave(spark, state, 0, _ndg_committed(state), 0)
        assert os.path.exists(os.path.join(state, "dv", "w0", "_SUCCESS"))
        # group-0 member arriving after the erasure: ACCEPTED
        phash_gate_batch(spark, state, _mk(spark, [1]), 1)
        dec, idx = _snapshot(spark, state)
        by_doc = {d: (a, fm) for d, _, a, fm in dec}
        assert by_doc[1] == (True, -1)
        assert 1 in {d for d, _ in idx}  # and it re-enters the index
        # index units untouched by the wave
        assert inv == {
            p: os.stat(p).st_mtime_ns
            for p in [
                os.path.join(state, "index", "b0", f)
                for f in os.listdir(os.path.join(state, "index", "b0"))
            ]
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
