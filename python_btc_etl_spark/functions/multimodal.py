"""Multimodal column support (E-MM, SURVEY.md §2.B): opaque binary
payloads with typed metadata, and Arrow-batched feature extraction.

The container has no codec libraries, so the decoders here are REAL
pure-numpy/stdlib implementations, one per modality:

- images — :func:`decode_image`: uncompressed netpbm (P5/P6),
  zlib-deflated netpbm streams, and non-interlaced 8-bit PNG
  (:func:`decode_png`: chunk parse + IDAT inflate + scanline
  unfilter, all five filter types);
- audio — :func:`decode_wav`: RIFF/WAVE chunk walk + 16-bit integer
  or 32-bit IEEE-float PCM frombuffer/channel reshape;
- video — :func:`decode_gif`: animated GIF87a/89a block walk with a
  real variable-width LZW decompressor (clear-code resets,
  dictionary growth to 12 bits), one palette-index frame per image
  descriptor.

Each has an encoder inverse so queries can prove full round-trips.
Entropy-coded formats (JPEG, MP3/AAC/FLAC) raise
``NotImplementedError`` — those genuinely need codec libraries; wire
Pillow/opencv/ffmpeg there on a real cluster.
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

    Real decoders, no codec library:

    - binary netpbm P5 (grayscale → HxW uint8) and P6 (RGB → HxWx3
      uint8), maxval ≤ 255 — header parse + numpy reshape;
    - a zlib-deflated payload (RFC 1950 stream wrapping a netpbm
      raster) is inflated with the stdlib and decoded the same way;
    - non-interlaced 8-bit PNG (:func:`decode_png`): chunk parse,
      stdlib inflate of the IDAT stream, per-scanline unfilter
      (None/Sub/Up/Average/Paeth) — gray / gray+alpha / RGB / RGBA.

    JPEG raises ``NotImplementedError``: a DCT entropy-coded format
    genuinely needs libjpeg; wire Pillow/opencv here on a real cluster.
    """
    if payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "JPEG requires a codec library (Pillow/opencv), "
            "not available in this environment"
        )
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample count per pixel (bit depth 8 only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy + stdlib decoder for non-interlaced 8-bit PNG.

    Chunk walk → IHDR parse → concatenated-IDAT ``zlib.decompress`` →
    per-scanline unfilter. Grayscale decodes to HxW; gray+alpha / RGB /
    RGBA to HxWxC uint8; palette-indexed (color type 3, depth 8)
    decodes to HxWx3 via PLTE lookup after reconstruction. Unsupported
    legs raise explicitly: 16-bit and sub-byte depths need bit
    unpacking, Adam7 needs the 7-pass deinterleave.

    Filter vectorization: None and Up are whole-row numpy ops; Sub is a
    per-channel cumulative sum (mod 256 distributes over the prefix
    sum); Average and Paeth carry a true left-neighbor dependency, so
    those rows fall back to a per-pixel loop — the standard trade-off
    every pure-Python PNG reader makes. Inside the engine this runs in
    ``mapInPandas`` workers over Arrow batches, one image per row, so
    the per-row cost parallelizes across executors.
    """
    import struct
    import zlib

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # header + data + CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color, comp, filt_method, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if color not in _PNG_CHANNELS and color != 3:
        raise NotImplementedError(f"PNG color type {color}")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if comp != 0 or filt_method != 0:
        raise ValueError("non-standard PNG compression/filter method")
    if color == 3:
        # Palette-indexed: one index sample per pixel; PLTE is an N×3
        # RGB table (tRNS alpha, if any, is out of scope — indexes map
        # to opaque RGB). The unfilter pass below runs on the index
        # raster; the palette lookup happens after reconstruction.
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            raise ValueError("palette PNG missing/invalid PLTE chunk")
        channels = 1
    else:
        channels = _PNG_CHANNELS[color]
    stride = width * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] → cumsum
            cur = np.cumsum(line.reshape(width, channels), axis=0).reshape(stride) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average (left dep → loop)
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (left dep → loop)
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(height, width)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return pal[idx]  # HxWx3 RGB via table lookup
    return out.reshape((height, width) if channels == 1 else (height, width, channels))


def encode_png(
    img: np.ndarray,
    row_filters: list[int] | None = None,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal non-interlaced 8-bit PNG encoder (the decode_png inverse).

    ``row_filters`` pins the filter type per scanline (cycled); default
    cycles 0→4 so a round-trip exercises every unfilter branch. The
    filtered bytes are computed with whole-row numpy shifts — the
    encoder side of each filter has no sequential dependency.

    With ``palette`` (an N×3 uint8 RGB table), ``img`` is an HxW index
    raster and the output is a color-type-3 PNG carrying a PLTE chunk.
    """
    import struct
    import zlib
    from binascii import crc32

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette PNG takes an HxW index raster")
        palette = np.ascontiguousarray(palette, dtype=np.uint8)
        # PLTE allows at most 256 entries and 8-bit index rasters can
        # never address past 255 — reject out-of-spec palettes rather
        # than silently emitting an invalid PNG.
        # Out-of-range index rasters are deliberately NOT rejected here:
        # decode_png owns that check (and the error-leg tests encode one
        # on purpose to exercise it).
        if palette.ndim != 2 or palette.shape[1] != 3 or palette.shape[0] > 256:
            raise ValueError("PNG palette must be N x 3 RGB with N <= 256")
        h, w, channels = img.shape[0], img.shape[1], 1
        px = img.reshape(h, w, 1).astype(np.int32)
        color = 3
    elif img.ndim == 2:
        h, w, channels = img.shape[0], img.shape[1], 1
        px = img.reshape(h, w, 1).astype(np.int32)
        color = 0
    else:
        h, w, channels = img.shape
        px = img.astype(np.int32)
        # 1: an (h, w, 1) array is grayscale, same as the 2-D spelling.
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    row_filters = row_filters or [0, 1, 2, 3, 4]
    left = np.zeros_like(px)
    left[:, 1:, :] = px[:, :-1, :]
    up = np.zeros_like(px)
    up[1:, :, :] = px[:-1, :, :]
    upleft = np.zeros_like(px)
    upleft[1:, 1:, :] = px[:-1, :-1, :]
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    paeth = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
    filtered_by_type = {
        0: px,
        1: px - left,
        2: px - up,
        3: px - ((left + up) >> 1),
        4: px - paeth,
    }
    lines = []
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        lines.append(bytes([f]) + (filtered_by_type[f][y] & 0xFF).astype(np.uint8).tobytes())
    raster = zlib.compress(b"".join(lines), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    plte = (
        chunk(b"PLTE", np.ascontiguousarray(palette, dtype=np.uint8).tobytes())
        if palette is not None
        else b""
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", raster)
        + chunk(b"IEND", b"")
    )


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


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure numpy + struct decoder for PCM WAV (RIFF/WAVE).

    Returns (samples, sample_rate); samples are int16 (format tag 1,
    16-bit integer PCM) or float32 (format tag 3, IEEE float), shaped
    (n,) for mono or (n, channels) otherwise. Chunk-walks the RIFF
    container (fmt / data; other chunks skipped). Compressed codecs
    (MP3/AAC/FLAC) genuinely need codec libraries and stay out of
    scope, like JPEG on the image side.
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + size > len(payload):
            # Declared chunk size runs past the buffer — the ValueError
            # contract decode_png follows, instead of a silent short read.
            raise ValueError("truncated stream: WAV chunk exceeds payload")
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated stream: WAV fmt chunk < 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 1:
        if bits != 16:
            raise NotImplementedError(f"{bits}-bit integer WAV (only 16-bit PCM)")
        dtype = "<i2"
    elif audio_format == 3:  # IEEE float PCM
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit float WAV (only 32-bit)")
        dtype = "<f4"
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_format} (PCM=1 and IEEE-float=3 only)"
        )
    # Frame-aligned, not just sample-aligned: a multi-channel data chunk
    # cut mid-frame is sample-aligned yet still truncated, and would
    # otherwise surface as a generic numpy reshape error below.
    if channels < 1 or len(data) % (channels * (bits // 8)) != 0:
        raise ValueError("truncated stream: WAV data not frame-aligned")
    samples = np.frombuffer(data, dtype=dtype)
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal PCM WAV writer (decode_wav's inverse): float32/float64
    input writes IEEE-float format tag 3; everything else 16-bit PCM."""
    import struct

    samples = np.asarray(samples)
    if samples.dtype.kind == "f":
        s, tag, width = samples.astype("<f4"), 3, 4
    else:
        s, tag, width = samples.astype("<i2"), 1, 2
    channels = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * channels * width
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, byte_rate, channels * width, width * 8
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (variable code width, clear/EOI codes)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    dict_init = {(i,): i for i in range(1 << min_code_size)}
    table = dict(dict_init)
    next_code, width = eoi + 1, min_code_size + 1
    out_bits: list[tuple[int, int]] = [(clear, width)]
    seq: tuple[int, ...] = ()
    for px in indices.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            out_bits.append((clear, width))
            table = dict(dict_init)
            next_code, width = eoi + 1, min_code_size + 1
        seq = (px,)
    if seq:
        out_bits.append((table[seq], width))
    out_bits.append((eoi, width))
    # LSB-first bit packing
    acc = n = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW decoder (the _lzw_compress inverse)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[tuple[int, ...]] = [(i,) for i in range(1 << min_code_size)] + [(), ()]
    width = min_code_size + 1
    acc = n = pos = 0
    prev: tuple[int, ...] | None = None
    while len(out) < n_pixels:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = [(i,) for i in range(1 << min_code_size)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt LZW code")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            # widen AFTER appending: the encoder widens when next_code
            # overflows the current width
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.array(out[:n_pixels], dtype=np.uint8)


GIF_PALETTE_BITS = 5  # 32-color global palette


def gif_palette() -> np.ndarray:
    """Deterministic 32-color palette: channel ramps (no codec tables)."""
    k = np.arange(1 << GIF_PALETTE_BITS)
    return np.stack([(k * 8) % 256, (k * 16 + 3) % 256, (k * 24 + 7) % 256], axis=1).astype(
        np.uint8
    )


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """Minimal animated GIF89a writer: global 32-color palette, one
    image descriptor per frame (no transparency/disposal), REAL LZW."""
    import struct

    h, w = frames[0].shape
    pal = gif_palette()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((GIF_PALETTE_BITS - 1) & 7), 0, 0)
    out += pal.tobytes()
    for fr in frames:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(GIF_PALETTE_BITS)  # LZW minimum code size
        data = _lzw_compress(fr.reshape(-1), GIF_PALETTE_BITS)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """Pure numpy + stdlib decoder for non-interlaced GIF87a/89a:
    header parse → block walk (extensions skipped) → per-frame LZW
    decompression → palette-indexed HxW uint8 frames. Returns the
    INDEX frames (palette lookup is a separate concern), so global and
    local color tables are both traversed, not applied; interlacing
    raises explicitly."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(payload) < 13:
        raise ValueError("truncated stream: GIF header")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if packed & 0x80:
        gct = 3 * (1 << ((packed & 7) + 1))  # global color table
        if pos + gct > len(payload):
            # Without this, pos overshoots the payload, the block walk
            # below never runs, and a truncated-in-GCT stream would
            # silently return [] instead of honoring the ValueError
            # contract.
            raise ValueError("truncated stream: GIF global color table")
        pos += gct

    # Every sub-block walk bounds-checks pos against the payload — a
    # truncated stream raises the same ValueError contract decode_png
    # follows instead of an opaque IndexError mid-walk.
    def _need(n: int) -> None:
        if pos + n > len(payload):
            raise ValueError("truncated stream: GIF block exceeds payload")

    frames: list[np.ndarray] = []
    saw_trailer = False
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            saw_trailer = True
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            _need(1)
            while payload[pos] != 0:
                pos += 1 + payload[pos]
                _need(1)
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _need(9)
            left, top, fw, fh, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            if ipacked & 0x80:
                # Local color table: this decoder returns INDEX frames
                # (palette lookup is a separate concern, same as the
                # global table), so the LCT only needs correct traversal
                # — bounds-checked like the GCT skip above.
                lct = 3 * (1 << ((ipacked & 7) + 1))
                _need(lct)
                pos += lct
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            _need(1)
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            _need(1)
            while payload[pos] != 0:
                ln = payload[pos]
                _need(1 + ln)
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
                _need(1)
            pos += 1
            frames.append(_lzw_decompress(bytes(data), min_code, fw * fh).reshape(fh, fw))
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not saw_trailer:
        # A stream that runs out before the 0x3B trailer is truncated even
        # when the cut lands on a clean block boundary — without this, such
        # cuts silently return partial (or zero) frames.
        raise ValueError("truncated stream: missing GIF trailer")
    return frames
