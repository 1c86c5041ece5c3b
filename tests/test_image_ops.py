"""Image-op parity tests against cv2/scipy oracles (the libraries the
reference delegates to)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from scipy import ndimage as ndi  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from unetdc_tpu.ops.resize import (
    resize_linear, resize_linear_u8, resize_nearest, resize_area,
    resize_mask_linear_round,
)
from unetdc_tpu.ops.morphology import (
    ellipse_kernel, erode, dilate, morph_open, morph_close,
    binary_dilation3x3,
)
from unetdc_tpu.ops.rolling_ball import (
    rolling_ball_correction_rgb, normalize_minmax_u8,
)
from unetdc_tpu.ops.threshold import otsu_threshold, segmentation_two_thresholds
from unetdc_tpu.ops.filters import gaussian_blur, gaussian_filter_scipy


# ---------------------------------------------------------------- resize ----

@pytest.mark.parametrize("src,dst", [((37, 53), (512, 512)),
                                     ((512, 512), (300, 400)),
                                     ((100, 100), (100, 100))])
def test_resize_linear_matches_cv2(rng, src, dst):
    img = (rng.rand(*src, 3) * 255).astype(np.uint8)
    ref = cv2.resize(img, dst[::-1], interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(resize_linear_u8(jnp.asarray(img), dst))
    # cv2's uint8 path truncates intermediates in its SIMD kernel
    # ((b0*(r0>>4))>>16 ...), a build-dependent quirk; we compute the exact
    # interpolation, so allow ±1 everywhere but never more.
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_resize_reference_bug_is_linear(rng):
    """The reference's cv2.resize(im, size, cv2.INTER_AREA) actually runs
    INTER_LINEAR (flag lands in the dst slot) — pin that behavior."""
    img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    ref_buggy = cv2.resize(img, (512, 512), cv2.INTER_AREA)
    ref_linear = cv2.resize(img, (512, 512), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(ref_buggy, ref_linear)
    ours = np.asarray(resize_linear_u8(jnp.asarray(img), (512, 512)))
    assert np.abs(ours.astype(int) - ref_buggy.astype(int)).max() <= 1


def test_resize_mask_linear_round_matches_reference_mask_path(rng):
    """Mask upscale path (quantify_droplets_batch.py:57): uint8 0/1 mask
    through cv2 bilinear (the actual behavior) == our rounded linear."""
    mask = (rng.rand(512, 512) > 0.7).astype(np.uint8)
    ref = cv2.resize(mask, (700, 600), cv2.INTER_NEAREST)  # buggy call = linear
    ours = np.asarray(resize_mask_linear_round(jnp.asarray(mask), (600, 700)))
    np.testing.assert_array_equal(ours, ref)  # bit-exact on upscale


def test_resize_cv2exact_u8(rng):
    from unetdc_tpu.ops.resize import resize_linear_u8_cv2exact
    img = (rng.rand(64, 80) * 255).astype(np.uint8)
    ref = cv2.resize(img, (512, 512), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(resize_linear_u8_cv2exact(jnp.asarray(img), (512, 512)))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("src,dst", [((64, 64), (256, 256)),
                                     ((512, 512), (123, 217))])
def test_resize_nearest_matches_cv2(rng, src, dst):
    img = (rng.rand(*src) * 255).astype(np.uint8)
    ref = cv2.resize(img, dst[::-1], interpolation=cv2.INTER_NEAREST)
    ours = np.asarray(resize_nearest(jnp.asarray(img), dst))
    np.testing.assert_array_equal(ours, ref)


def test_resize_area_matches_cv2_integer_scale(rng):
    img = (rng.rand(128, 128) * 255).astype(np.uint8)
    ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_AREA)
    ours = np.asarray(resize_area(jnp.asarray(img), (32, 32)))
    assert np.abs(np.rint(ours) - ref.astype(float)).max() <= 1


# ------------------------------------------------------------ morphology ----

@pytest.mark.parametrize("ksize", [1, 2, 3, 5, 15, 50])
def test_ellipse_kernel_matches_cv2(ksize):
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    np.testing.assert_array_equal(ellipse_kernel(ksize), ref)


@pytest.mark.parametrize("ksize", [3, 15, 50])
def test_erode_dilate_open_close_match_cv2(rng, ksize):
    img = (rng.rand(96, 96) * 255).astype(np.uint8)
    kern = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    for ours_fn, cvflag in [(erode, cv2.MORPH_ERODE), (dilate, cv2.MORPH_DILATE),
                            (morph_open, cv2.MORPH_OPEN),
                            (morph_close, cv2.MORPH_CLOSE)]:
        ref = cv2.morphologyEx(img, cvflag, kern)
        ours = np.asarray(ours_fn(jnp.asarray(img), kern)).astype(np.uint8)
        np.testing.assert_array_equal(ours, ref, err_msg=f"{ours_fn.__name__} k={ksize}")


@pytest.mark.parametrize("ksize", [3, 15, 50])
def test_morph_chain_matches_reduce_window(rng, ksize):
    """The incremental shift-chain horizontal pass (r3 default for nested
    footprints) must be bit-identical to the per-width reduce_window
    fallback for both erosion and dilation."""
    from unetdc_tpu.ops.morphology import _morph_anchor

    img = (rng.rand(80, 80) * 255).astype(np.uint8)
    kern = ellipse_kernel(ksize)
    anchor = (ksize // 2, ksize // 2)
    for is_erode in (True, False):
        a = np.asarray(_morph_anchor(jnp.asarray(img), kern, anchor,
                                     is_erode, impl="chain"))
        b = np.asarray(_morph_anchor(jnp.asarray(img), kern, anchor,
                                     is_erode, impl="window"))
        np.testing.assert_array_equal(a, b)


def test_box_close_open_matches_cv2(rng):
    """quantify_pipline.py:48-50 uses np.ones((15,15)) kernels."""
    img = ((rng.rand(128, 128) > 0.5) * 255).astype(np.uint8)
    kern = np.ones((15, 15), np.uint8)
    ref = cv2.morphologyEx(cv2.morphologyEx(img, cv2.MORPH_CLOSE, kern),
                           cv2.MORPH_OPEN, kern)
    ours = np.asarray(morph_open(morph_close(jnp.asarray(img), kern), kern))
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_binary_dilation3x3_matches_scipy(rng):
    m = rng.rand(64, 64) > 0.8
    ref = ndi.binary_dilation(m, structure=np.ones((3, 3)))
    ours = np.asarray(binary_dilation3x3(jnp.asarray(m)))
    np.testing.assert_array_equal(ours, ref)


# ----------------------------------------------------------- rolling ball ----

def test_normalize_minmax_matches_cv2(rng):
    x = (rng.rand(50, 60) * 200).astype(np.uint8)
    ref = cv2.normalize(x, None, 0, 255, cv2.NORM_MINMAX)
    ours = np.asarray(normalize_minmax_u8(jnp.asarray(x)))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_rolling_ball_matches_reference_impl(rng):
    """Full parity with utils/data_loader.py:11-24 recomputed here via cv2."""
    img = (rng.rand(80, 90, 3) * 255).astype(np.uint8)
    radius = 20
    kern = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (radius, radius))
    ref_ch = []
    for c in cv2.split(img):
        bg = cv2.morphologyEx(c, cv2.MORPH_OPEN, kern)
        corr = cv2.subtract(c, bg)
        ref_ch.append(cv2.normalize(corr, None, 0, 255, cv2.NORM_MINMAX))
    ref = cv2.merge(ref_ch)
    ours = np.asarray(rolling_ball_correction_rgb(jnp.asarray(img), radius))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


# ---------------------------------------------------------------- otsu ----

def test_otsu_matches_cv2(rng):
    img = np.concatenate([
        (rng.rand(50, 100) * 80).astype(np.uint8),
        (rng.rand(50, 100) * 100 + 150).astype(np.uint8),
    ]).astype(np.uint8)
    t_ref, ref = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    t_ours = int(otsu_threshold(jnp.asarray(img)))
    assert t_ours == int(t_ref)


def test_segmentation_two_thresholds(rng):
    img = (rng.rand(64, 64) * 255).astype(np.uint8)
    t1, t2 = 200, 100
    ref = ndi.binary_dilation(img >= t1, structure=np.ones((3, 3))) & (img >= t2)
    ours = np.asarray(segmentation_two_thresholds(jnp.asarray(img), t1, t2))
    np.testing.assert_array_equal(ours, ref)


# ------------------------------------------------------------- gaussian ----

def test_gaussian_blur_matches_cv2(rng):
    img = (rng.rand(100, 120) * 255).astype(np.uint8)
    ref = cv2.GaussianBlur(img, (15, 15), 0)
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 15, 0.0))
    assert np.abs(np.rint(ours) - ref.astype(float)).max() <= 1


def test_gaussian_filter_matches_scipy(rng):
    img = rng.rand(64, 64).astype(np.float32)
    sigma = 21 / 6
    ref = ndi.gaussian_filter(img, sigma=sigma)
    ours = np.asarray(gaussian_filter_scipy(jnp.asarray(img), sigma))
    np.testing.assert_allclose(ours, ref, atol=1e-4)
