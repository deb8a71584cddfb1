"""Unit tests for the pure-numpy image decode path (E-MM): real netpbm
decoding and nearest-neighbor resize — no codec libraries involved."""

from __future__ import annotations

import numpy as np
import pytest

from python_btc_etl_spark.functions.multimodal import decode_image, resize_nearest


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


def test_decode_rejects_compressed_formats():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # JPEG SOI
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 16)


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
