"""Native IO library tests (parity with PIL, fallback correctness)."""

import numpy as np
import pytest
from PIL import Image

from unetdc_tpu.io.native import (decode_rgb, encode_png_gray,
                                  encode_png_rgb, native_available)


def test_png_decode_matches_pil(rng, tmp_path):
    img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(decode_rgb(p), img)


def test_png_gray_and_palette_decode(rng, tmp_path):
    gray = (rng.rand(40, 50) * 255).astype(np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(gray).save(p)
    ref = np.array(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(decode_rgb(p), ref)
    # palette PNG
    pal = Image.fromarray(gray).convert("P")
    p2 = tmp_path / "p.png"
    pal.save(p2)
    ref2 = np.array(Image.open(p2).convert("RGB"))
    np.testing.assert_array_equal(decode_rgb(p2), ref2)


def test_jpeg_decode_close_to_pil(rng, tmp_path):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    p = tmp_path / "t.jpg"
    Image.fromarray(img).save(p, quality=90)
    ref = np.array(Image.open(p).convert("RGB"))
    ours = decode_rgb(p)
    assert ours.shape == ref.shape
    # independent IDCT implementations may differ by a few LSBs
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_encode_roundtrip(rng, tmp_path):
    mask = ((rng.rand(64, 64) > 0.5) * 255).astype(np.uint8)
    p = tmp_path / "m.png"
    encode_png_gray(p, mask)
    np.testing.assert_array_equal(np.array(Image.open(p)), mask)
    rgb = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    p2 = tmp_path / "c.png"
    encode_png_rgb(p2, rgb)
    np.testing.assert_array_equal(np.array(Image.open(p2)), rgb)


def test_fallback_for_unknown_suffix(rng, tmp_path):
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    p = tmp_path / "t.tiff"
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(decode_rgb(p), img)


def test_png_16bit_decode_matches_cv2_high_byte(rng, tmp_path):
    """The reference decodes via cv2.imread, which reduces 16-bit PNGs by
    keeping the HIGH byte; the native path (png_set_strip_16) and the PIL
    fallback (explicit >>8 — PIL's own I->RGB convert clips to white) must
    both reproduce that."""
    import cv2
    from unetdc_tpu.io.native import _pil_decode

    a16 = (rng.rand(24, 31) * 65535).astype(np.uint16)
    p = tmp_path / "a16.png"
    Image.fromarray(a16).save(p)
    want = cv2.imread(str(p))[..., ::-1]  # cv2 default: 8-bit BGR
    assert np.array_equal(decode_rgb(p), want)
    assert np.array_equal(_pil_decode(str(p)), want)


def test_png_rgba_decode_strips_alpha(rng, tmp_path):
    rgba = (rng.rand(24, 31, 4) * 255).astype(np.uint8)
    p = tmp_path / "rgba.png"
    Image.fromarray(rgba).save(p)
    assert np.array_equal(decode_rgb(p), rgba[..., :3])
