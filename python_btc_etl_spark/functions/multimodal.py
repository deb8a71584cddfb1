"""Multimodal column support (E-MM, SURVEY.md §2.B): opaque binary
payloads with typed metadata, and Arrow-batched feature extraction.

The container has no image/audio codecs, so the decode step is STUBBED:
:func:`decode_image` raises ``NotImplementedError`` (the real
integration point), and :func:`fake_decode_features` is the
deterministic stand-in used by the feature-extraction pipeline so the
Spark-side plumbing — BinaryType schema, ``mapInPandas`` batch shape,
Arrow transfer — is real and tested end-to-end.

Scale notes: feature extraction is ``mapInPandas`` (Arrow columnar
batches, not pickled rows); batch size follows
``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary payloads stay
opaque to the JVM: no shuffle touches the bytes unless a repartition is
explicitly requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

FEATURE_BANDS = 4
CHECKSUM_MOD = 9973


def decode_image(payload: bytes) -> object:
    """Decode an image payload to pixels. STUB — no codec libraries in
    this environment; wire Pillow/opencv here on a real cluster."""
    raise NotImplementedError(
        "image decoding requires a codec library (Pillow/opencv), not "
        "available in this environment; use fake_decode_features for the "
        "pipeline plumbing"
    )


def fake_decode_features(payload: bytes) -> dict[str, int]:
    """Deterministic stand-in for decode→feature-extract: byte length,
    modular checksum, and per-band (position mod 4) byte sums.

    Vectorized over the byte buffer — a per-byte Python loop costs ~1 s
    per 5 MB of payload; the numpy strided sums are memory-bandwidth
    bound, which is what a real decoder's inner loop should look like
    from Python."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    out = {"n_bytes": int(arr.size), "checksum": int(arr.sum() % CHECKSUM_MOD)}
    for k in range(FEATURE_BANDS):
        out[f"band{k}"] = int(arr[k::FEATURE_BANDS].sum())
    return out


def extract_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (doc_id, payload) Arrow batches → feature rows."""
    for pdf in batches:
        feats = [fake_decode_features(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


FRAME_BYTES = 32
FRAME_SAMPLE_EVERY = 4


def sample_frames_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (doc_id, payload) → every Nth fixed-size frame
    with its hash — the video frame-sampling slot. A real decoder would
    split on container keyframes; the chunking/batching/fan-out plumbing
    (one input row → many output rows, Arrow both ways) is identical.
    """
    import hashlib

    for pdf in batches:
        doc_ids: list[int] = []
        idxs: list[int] = []
        shas: list[str] = []
        sizes: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_SAMPLE_EVERY):
                frame = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                doc_ids.append(int(doc_id))
                idxs.append(i)
                shas.append(hashlib.sha256(frame).hexdigest())
                sizes.append(len(frame))
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_sha": shas, "frame_bytes": sizes}
        )
