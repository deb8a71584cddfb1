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


def _afp(doc_id: int) -> int:
    """The closed-form 60-bit frame-energy fingerprint of the
    deterministic PCM corpus (the same value the engine reproduces
    through synth -> RIFF/WAVE round-trip -> frame-energy threshold,
    and the oracle computes in SQL)."""
    from python_btc_etl_spark.plans.multimodal import AFP_BITS

    g, t = doc_id // 4, doc_id % 4
    h = 0
    for i in range(AFP_BITS):
        x = (g * 64 + i) % 4294967296
        v = (
            (x // 65536) * 2654435761 % 65536 * 65536
            + (x % 65536) * 2654435761
        ) % 4294967296
        v = v ^ (v // 65536)
        v = v * 40503 % 4294967296
        u = (v ^ (v // 65536)) % 256
        amp = 255 - u if i < t else u
        if amp >= 128:
            h |= 1 << i
    return h


def test_afp_gate_verdicts_replay_and_gdpr(spark):
    """The parameterized gate under the AUDIO config: engine
    fingerprints equal the closed form (codec round-trip included),
    verdicts follow the same protocol as the phash gate, committed
    replays are no-ops, and an erased fingerprint stops matching."""
    import pandas as pd

    from python_btc_etl_spark.plans.mmstream import _AFP_CFG
    from python_btc_etl_spark.plans.multimodal import AFP_HD_MAX, _afp_batches

    # engine hash == closed form, through the real WAV codec
    got = pd.concat(
        list(_afp_batches(iter([pd.DataFrame({"doc_id": [0, 1, 5, 42]})])))
    )
    assert {int(r.doc_id): int(r.afp) for r in got.itertuples()} == {
        i: _afp(i) for i in (0, 1, 5, 42)
    }
    assert _hamming(_afp(0), _afp(1)) <= AFP_HD_MAX  # group near-dup

    # far id: different group, beyond the Hamming gate, batch-1 class
    far = 1
    while True:
        far += MPG_BATCHES
        if far // 4 != 0 and _hamming(_afp(far), _afp(0)) > AFP_HD_MAX:
            break

    base = tempfile.mkdtemp(prefix="afp_test_")
    state = os.path.join(base, "state")
    try:
        b0, b1 = _mk(spark, [0]), _mk(spark, [1, far])
        phash_gate_batch(spark, state, b0, 0, _AFP_CFG)
        phash_gate_batch(spark, state, b1, 1, _AFP_CFG)
        dec, idx = _snapshot(spark, state)
        by_doc = {d: (a, fm) for d, _, a, fm in dec}
        assert by_doc[0] == (True, -1)
        assert by_doc[1] == (False, 0)  # near-twin of indexed 0
        assert by_doc[far][0] is True
        assert 1 not in {d for d, _ in idx}
        # replay guard holds under the audio config too
        phash_gate_batch(spark, state, b1, 9, _AFP_CFG)
        assert _snapshot(spark, state) == (dec, idx)
        # GDPR: erase doc 0 (rem 0), then doc 2 arrives -> ACCEPTED
        _mpg_land_wave(spark, state, 1, _ndg_committed(state), 0, _AFP_CFG)
        phash_gate_batch(spark, state, _mk(spark, [2]), 2, _AFP_CFG)
        dec2, _ = _snapshot(spark, state)
        assert {d: (a, fm) for d, _, a, fm in dec2}[2] == (True, -1)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _vshingles(doc_id: int) -> list:
    """Closed-form consecutive-frame shingle list of the deterministic
    clip corpus (the engine reproduces it through the real GIF LZW
    round-trip; the oracle computes it in SQL)."""
    from python_btc_etl_spark.plans.multimodal import VSEQ_BITS, VSEQ_F

    vg, vt = (doc_id + 2) // 4, (doc_id + 2) % 4

    def vmix32(x: int) -> int:
        x %= 4294967296
        v = (
            (x // 65536) * 2654435761 % 65536 * 65536
            + (x % 65536) * 2654435761
        ) % 4294967296
        v ^= v // 65536
        v = v * 40503 % 4294967296
        return (v ^ (v // 65536)) % 32

    chain = []
    for f in range(vt, VSEQ_F):
        h = 0
        for k in range(VSEQ_BITS):
            if vmix32(vg * 4096 + f * 64 + k) >= 16:
                h |= 1 << k
        chain.append(h)
    return list(zip(chain, chain[1:]))


def test_vseq_gate_containment_replay_and_gdpr(spark):
    """The video sequence gate: engine shingles equal the closed form
    (GIF codec round-trip included), a trimmed re-upload of an indexed
    clip is rejected by containment, committed replays are no-ops, and
    an erased clip's shingles stop matching."""
    import pandas as pd

    from python_btc_etl_spark.plans.mmstream import (
        _vsg_land_wave,
        vseq_gate_batch,
    )
    from python_btc_etl_spark.plans.multimodal import _vseq_batches

    got = pd.concat(
        list(_vseq_batches(iter([pd.DataFrame({"doc_id": [2, 3, 4]})])))
    )
    eng = {
        d: sorted(
            (int(r.h1), int(r.h2)) for r in got.itertuples() if r.doc_id == d
        )
        for d in (2, 3, 4)
    }
    assert eng == {d: sorted(_vshingles(d)) for d in (2, 3, 4)}
    # trims nest: doc 3 (vt=1) and doc 4 (vt=2) are subsets of doc 2
    assert set(_vshingles(4)) < set(_vshingles(3)) < set(_vshingles(2))

    base = tempfile.mkdtemp(prefix="vsg_test_")
    state = os.path.join(base, "state")
    try:
        vseq_gate_batch(spark, state, _mk(spark, [3]), 0)  # 3 % 3 == 0
        vseq_gate_batch(spark, state, _mk(spark, [4]), 1)  # 4 % 3 == 1
        dec, idx = _snapshot(spark, state)
        by_doc = {d: (a, fm) for d, _, a, fm in dec}
        assert by_doc[3] == (True, -1)  # empty index: accepted
        assert by_doc[4] == (False, 3)  # contained in indexed 3
        assert 4 not in {r[0] for r in idx}
        # replay guard
        vseq_gate_batch(spark, state, _mk(spark, [4]), 8)
        assert _snapshot(spark, state) == (dec, idx)
        # GDPR: erase doc 3 (3 % 7 == 3), then doc 2 arrives -> ACCEPTED
        _vsg_land_wave(spark, state, 1, _ndg_committed(state), 3)
        vseq_gate_batch(spark, state, _mk(spark, [2]), 2)  # 2 % 3 == 2
        dec2, _ = _snapshot(spark, state)
        assert {d: (a, fm) for d, _, a, fm in dec2}[2] == (True, -1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
