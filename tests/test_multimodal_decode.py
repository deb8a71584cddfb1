"""Unit tests for the pure-numpy image decode path (E-MM): real netpbm
decoding and nearest-neighbor resize — no codec libraries involved."""

from __future__ import annotations

import numpy as np
import pytest

from python_btc_etl_spark.functions.multimodal import (
    decode_image,
    decode_png,
    encode_png,
    resize_nearest,
)


def _ppm(pixels: np.ndarray, magic: bytes, comment: bool = False) -> bytes:
    h, w = pixels.shape[:2]
    header = magic + b"\n"
    if comment:
        header += b"# synthetic test image\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


def test_decode_p5_grayscale():
    img = (np.arange(12, dtype=np.uint8) * 7 % 251).reshape(3, 4)
    out = decode_image(_ppm(img, b"P5"))
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out, img)


def test_decode_p6_rgb_with_comment():
    img = (np.arange(2 * 5 * 3, dtype=np.uint8) * 11 % 256).reshape(2, 5, 3)
    out = decode_image(_ppm(img, b"P6", comment=True))
    assert out.shape == (2, 5, 3)
    np.testing.assert_array_equal(out, img)


def test_decode_rejects_unsupported_formats():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # JPEG SOI
    with pytest.raises(ValueError):  # PNG signature but no IHDR/IDAT
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 16)


@pytest.mark.parametrize("shape", [(7, 5), (12, 9, 2), (10, 13, 3), (9, 8, 4)])
@pytest.mark.parametrize(
    "filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]]
)
def test_png_round_trip_all_filters(shape, filters):
    """encode_png → decode_png must be the identity for every color type
    (gray / gray+alpha / RGB / RGBA) under every scanline filter type,
    including mixed cycles — this is what exercises each unfilter branch
    (Sub cumsum, Up vector add, Average/Paeth loops)."""
    rng = np.random.default_rng(int(np.prod(shape)) + sum(filters))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img, filters))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_png_dispatch_through_decode_image():
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_unsupported_legs_raise_explicitly():
    import struct
    from binascii import crc32

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", crc32(ctype + data) & 0xFFFFFFFF
        )

    def png_with_ihdr(depth=8, color=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", b"x\x9c\x03\x00\x00\x00\x00\x01")
            + chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError):  # 16-bit
        decode_png(png_with_ihdr(depth=16))
    with pytest.raises(ValueError):  # palette supported since r6 — but PLTE required
        decode_png(png_with_ihdr(color=3))
    with pytest.raises(NotImplementedError):  # Adam7
        decode_png(png_with_ihdr(interlace=1))


def test_resize_nearest_downscale_and_upscale():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(small, img[::2, ::2])
    big = resize_nearest(img, 8, 8)
    assert big.shape == (8, 8)
    # Every original pixel survives at its scaled position.
    np.testing.assert_array_equal(big[::2, ::2], img)


def test_resize_rgb_keeps_channels():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(img, 2, 3)
    assert out.shape == (2, 3, 3)
    np.testing.assert_array_equal(out, img[::2, ::2])


@pytest.mark.parametrize("shape,rate", [((100,), 8000), ((64, 2), 44100), ((33, 4), 22050)])
def test_wav_round_trip(shape, rate):
    from python_btc_etl_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(int(np.prod(shape)))
    s = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    back, got = decode_wav(encode_wav(s, rate))
    assert got == rate and back.shape == s.shape and np.array_equal(back, s)


def test_wav_unsupported_legs():
    import struct

    from python_btc_etl_spark.functions.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a riff stream")
    # float (tag 3) at a non-32-bit depth raises explicitly
    fmt_float = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt_float
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        decode_wav(wav)


def test_gif_round_trip_with_dict_growth_and_resets():
    from python_btc_etl_spark.functions.multimodal import (
        GIF_PALETTE_BITS,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 1 << GIF_PALETTE_BITS, size=(9, 13)).astype(np.uint8)
        for _ in range(3)
    ]
    back = decode_gif(encode_gif(frames))
    assert len(back) == 3 and all(np.array_equal(a, b) for a, b in zip(frames, back))
    # long runs force LZW dictionary growth past several width bumps
    big = np.zeros((64, 300), dtype=np.uint8)
    big[::2] = 7
    assert np.array_equal(decode_gif(encode_gif([big]))[0], big)


def test_gif_unsupported_legs():
    from python_btc_etl_spark.functions.multimodal import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"JIF89a" + b"\x00" * 16)


def test_truncated_wav_and_gif_raise_valueerror_not_indexerror():
    """ADVICE r4 #3: truncated payloads must follow decode_png's
    ValueError contract, never IndexError/short-read."""
    from python_btc_etl_spark.functions.multimodal import (
        decode_gif,
        decode_wav,
        encode_gif,
        encode_wav,
    )

    wav = encode_wav(np.arange(100, dtype=np.int16), 8000)
    gif = encode_gif([np.zeros((4, 4), dtype=np.uint8)])
    # cut mid-chunk / mid-sub-block at several depths
    for cut in (13, 20, len(wav) // 2, len(wav) - 3):
        with pytest.raises(ValueError):
            decode_wav(wav[:cut])
    # EVERY proper prefix is truncated (the trailer is the last byte), so
    # the contract is an unconditional ValueError — including cuts inside
    # the global color table (silently returned [] before the GCT bounds
    # check) and cuts on clean block boundaries (missing-trailer check).
    for cut in range(13, len(gif)):
        with pytest.raises(ValueError):
            decode_gif(gif[:cut])


def test_png_palette_round_trip():
    """Color type 3 (round 6): HxW index raster + PLTE -> HxWx3 RGB."""
    from python_btc_etl_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(9, 7), dtype=np.uint8)
    png = encode_png(idx, palette=palette)
    out = decode_png(png)
    assert out.shape == (9, 7, 3)
    assert np.array_equal(out, palette[idx])


def test_png_palette_error_legs():
    from python_btc_etl_spark.functions.multimodal import decode_png, encode_png

    palette = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    png = encode_png(idx, palette=palette)
    # Strip the PLTE chunk: palette PNG without PLTE must raise.
    plte_at = png.find(b"PLTE") - 4
    plte_len = 12 + 4 * 3
    with pytest.raises(ValueError):
        decode_png(png[:plte_at] + png[plte_at + plte_len:])
    # An index beyond the palette must raise, not wrap or crash.
    bad = encode_png(np.full((2, 2), 9, dtype=np.uint8), palette=palette)
    with pytest.raises(ValueError):
        decode_png(bad)


def test_wav_float32_round_trip():
    """Format tag 3 (round 6): IEEE float PCM decodes bit-exactly."""
    from python_btc_etl_spark.functions.multimodal import decode_wav, encode_wav

    x = (np.sin(np.linspace(0, 20, 500)) * 0.7).astype(np.float32)
    back, rate = decode_wav(encode_wav(x, 16000))
    assert rate == 16000 and back.dtype == np.float32
    assert np.array_equal(back, x)
    # Stereo float round-trips shaped (n, 2).
    st = np.stack([x, -x], axis=1)
    back2, _ = decode_wav(encode_wav(st, 8000))
    assert back2.shape == st.shape and np.array_equal(back2, st)


def test_gif_local_color_table_traversed():
    """LCT flag (round 6): index frames decode identically whether the
    descriptor carries a local color table or not; truncation inside
    the LCT still raises."""
    from python_btc_etl_spark.functions.multimodal import decode_gif, encode_gif

    frame = (np.arange(20, dtype=np.uint8) % 4).reshape(4, 5)
    gif = encode_gif([frame])
    # Inject an LCT: find the image descriptor, set the LCT flag with
    # size bits 000 (2 entries -> 6 bytes) and splice in the table.
    at = gif.find(b"\x2c")
    ipacked = gif[at + 9]
    assert ipacked & 0x80 == 0
    patched = (
        gif[: at + 9]
        + bytes([ipacked | 0x80])
        + b"\x01\x02\x03\x04\x05\x06"
        + gif[at + 10 :]
    )
    out = decode_gif(patched)
    assert len(out) == 1 and np.array_equal(out[0], frame)
    # Cut inside the spliced LCT -> ValueError, not a silent return.
    with pytest.raises(ValueError):
        decode_gif(patched[: at + 12])


def test_png_single_channel_3d_input_encodes_as_grayscale():
    """Regression (round-6 review): (h, w, 1) input must encode as
    grayscale like its 2-D spelling, not KeyError on the channel map."""
    from python_btc_etl_spark.functions.multimodal import decode_png, encode_png

    img = np.arange(20, dtype=np.uint8).reshape(4, 5, 1)
    back = decode_png(encode_png(img))
    assert back.shape == (4, 5)
    assert np.array_equal(back, img[:, :, 0])


def test_wav_multichannel_frame_alignment():
    """ADVICE r6 #1: a multi-channel data chunk that is sample-aligned
    but NOT frame-aligned must raise the explicit truncated-stream
    ValueError, not a generic numpy reshape error."""
    from python_btc_etl_spark.functions.multimodal import decode_wav, encode_wav

    stereo = np.arange(8, dtype=np.int16).reshape(4, 2)
    wav = bytearray(encode_wav(stereo, 8000))
    # Drop ONE 16-bit sample from the data chunk (keeps sample alignment,
    # breaks frame alignment) and patch the data-size + RIFF-size fields.
    at = bytes(wav).rfind(b"data")
    size = int.from_bytes(wav[at + 4 : at + 8], "little")
    wav[at + 4 : at + 8] = (size - 2).to_bytes(4, "little")
    wav[4:8] = (int.from_bytes(wav[4:8], "little") - 2).to_bytes(4, "little")
    clipped = bytes(wav[:-2])
    with pytest.raises(ValueError, match="frame-aligned"):
        decode_wav(clipped)


def test_png_palette_encoder_rejects_oversized_palette():
    """ADVICE r6 #2: PLTE allows max 256 entries; an oversized or
    mis-shaped palette must be rejected at encode time."""
    from python_btc_etl_spark.functions.multimodal import encode_png

    idx = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError, match="N <= 256"):
        encode_png(idx, palette=np.zeros((257, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="N <= 256"):
        encode_png(idx, palette=np.zeros((4, 4), dtype=np.uint8))
    # 256 entries exactly is in-spec.
    assert encode_png(idx, palette=np.zeros((256, 3), dtype=np.uint8))
