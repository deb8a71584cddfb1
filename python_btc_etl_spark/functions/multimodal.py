"""Multimodal column support (E-MM, SURVEY.md §2.B): opaque binary
payloads with typed metadata, and Arrow-batched feature extraction.

The container has no codec libraries, so :func:`decode_image` is a
REAL pure-numpy decoder for the uncompressed netpbm family (P5/P6 —
no codec needed, just header parse + strided reshape) plus
zlib-deflated netpbm streams (stdlib inflate), and raises
``NotImplementedError`` for JPEG/full-PNG (need libjpeg / PNG
unfiltering — wire Pillow/opencv there on a real cluster).
:func:`fake_decode_features` remains the deterministic stand-in used
by the oracle-checked feature pipeline so the Spark-side plumbing —
BinaryType schema, ``mapInPandas`` batch shape, Arrow transfer — is
testable against closed-form SQL.

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


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to a pixel array.

    Real decoder for binary netpbm: P5 (grayscale → HxW uint8) and
    P6 (RGB → HxWx3 uint8), maxval ≤ 255 — pure header parse + numpy
    reshape, no codec library. A zlib-deflated payload (RFC 1950
    stream wrapping a netpbm raster — the PNG-IDAT-style storage leg)
    is inflated with the stdlib and decoded the same way. JPEG and
    full PNG raise ``NotImplementedError``: JPEG needs libjpeg, PNG
    needs chunk parsing + per-scanline unfiltering beyond the deflate
    step; wire Pillow/opencv here on a real cluster.
    """
    if payload[:3] in (b"\xff\xd8\xff",) or payload[:4] == b"\x89PNG":
        raise NotImplementedError(
            "JPEG/PNG require a codec library (Pillow/opencv), "
            "not available in this environment"
        )
    if (
        len(payload) >= 2
        and payload[0] == 0x78
        and (payload[0] * 256 + payload[1]) % 31 == 0
    ):
        # RFC 1950 zlib header: CMF 0x78 (deflate, 32k window) and the
        # FCHECK property (CMF*256+FLG divisible by 31) — cannot collide
        # with netpbm, whose first byte is 'P' (0x50).
        import zlib

        return decode_image(zlib.decompress(payload))
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported image payload (magic {magic!r})")
    # Netpbm header: magic, whitespace-separated width height maxval
    # (comments start with '#'), one whitespace byte, then raster.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 1 if magic == b"P5" else 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=width * height * channels, offset=pos)
    return raster.reshape((height, width) if channels == 1 else (height, width, channels))


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — two numpy gathers,
    no interpolation libs; the standard pre-embedding normalization step."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.intp)
    cols = (np.arange(out_w) * w // out_w).astype(np.intp)
    return img[rows][:, cols]


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
