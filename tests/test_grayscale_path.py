"""Grayscale upload fast path (pipelines/engine.py::grayscale_view).

The reference's microscopy data is grayscale stored as RGB (measured on
its committed outputs: every non-annotation pixel of
/root/reference/outputs/overlays/*.png has all three channels equal), and
the host<->device link is the e2e bottleneck — so channel-equal batches
upload ONE channel and the engine broadcasts it back on device. The
contract tested here is BIT-identity with the RGB upload, plus the
pipeline's automatic detection.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unetdc_tpu.models.unet import UNetDC, init_params
from unetdc_tpu.pipelines.engine import QuantifyEngine, grayscale_view


def _blobby_gray(b, h, w, seed=0):
    """uint8 (B,H,W,3) with all channels equal and droplet-like content."""
    rng = np.random.RandomState(seed)
    g = (rng.rand(b, h, w) * 60).astype(np.uint8)
    yy, xx = np.mgrid[:h, :w]
    for i in range(b):
        for _ in range(6):
            cy, cx = rng.randint(4, h - 4), rng.randint(4, w - 4)
            r = rng.randint(2, 5)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            g[i][blob] = np.minimum(g[i][blob] + 180, 255)
    return np.repeat(g[..., None], 3, axis=-1)


def test_grayscale_view_detection():
    imgs = _blobby_gray(2, 16, 16)
    v = grayscale_view(imgs)
    assert v.shape == (2, 16, 16)
    np.testing.assert_array_equal(v, imgs[..., 0])

    rgb = imgs.copy()
    rgb[1, 3, 3, 2] ^= 1  # one differing pixel -> stays RGB
    assert grayscale_view(rgb) is rgb

    g3 = imgs[..., 0]
    assert grayscale_view(g3) is g3  # already single-channel: passthrough


@pytest.fixture(scope="module")
def engine():
    variables = init_params(UNetDC(), jax.random.PRNGKey(0),
                            input_shape=(1, 32, 32, 3))
    # saturate the head so thresholded masks have structure (bench recipe)
    oc = variables["params"]["out_conv"]
    oc["kernel"] = oc["kernel"] * 50.0
    return QuantifyEngine(variables, compute_dtype=jnp.float32,
                          img_size=64, max_labels=64)


def test_gray_upload_bit_identical_to_rgb(engine):
    imgs = _blobby_gray(2, 48, 40, seed=3)
    rgb = engine.run_batch(imgs, (48, 40), background_radius=8)
    gray = engine.run_batch(grayscale_view(imgs), (48, 40),
                            background_radius=8)
    assert sorted(rgb) == sorted(gray)
    for k in rgb:
        np.testing.assert_array_equal(rgb[k], gray[k], err_msg=k)


def test_gray_preprocess_bit_identical(engine):
    """The device half alone: _preprocess(gray) == _preprocess(rgb)."""
    imgs = _blobby_gray(2, 40, 40, seed=5)
    pre_rgb = np.asarray(jax.jit(
        lambda a: engine._preprocess(a, 8, True))(jnp.asarray(imgs)))
    pre_gray = np.asarray(jax.jit(
        lambda a: engine._preprocess(a, 8, True))(
            jnp.asarray(imgs[..., 0])))
    np.testing.assert_array_equal(pre_rgb, pre_gray)


def test_pipeline_autodetects_grayscale(engine, tmp_path, monkeypatch):
    """End-to-end: grayscale PNGs flow through the single-channel upload
    (witnessed via a dispatch spy) and produce the same artifacts as the
    forced-RGB path."""
    from unetdc_tpu.io.native import encode_png_rgb
    from unetdc_tpu.pipelines import quantify_batch as qb

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    imgs = _blobby_gray(3, 48, 40, seed=7)
    for i in range(3):
        encode_png_rgb(img_dir / f"g{i}.png", imgs[i])

    seen_ndims = []
    orig = engine.dispatch_batch

    def spy(arr, *a, **k):
        seen_ndims.append(arr.ndim)
        return orig(arr, *a, **k)

    monkeypatch.setattr(engine, "dispatch_batch", spy)
    pipe = qb.BatchQuantifyPipeline(engine, str(tmp_path / "out"), batch=2,
                                    background_radius=8)
    pipe.run(str(img_dir), progress=False)
    assert seen_ndims and all(n == 3 for n in seen_ndims)

    # forced-RGB reference run: disable the downcast
    monkeypatch.setattr(engine, "dispatch_batch", orig)
    import unetdc_tpu.pipelines.engine as eng_mod
    monkeypatch.setattr(eng_mod, "grayscale_view", lambda a: a)
    pipe2 = qb.BatchQuantifyPipeline(engine, str(tmp_path / "out_rgb"),
                                     batch=2, background_radius=8)
    pipe2.run(str(img_dir), progress=False)

    for i in range(3):
        a = (tmp_path / "out" / f"g{i}_droplets.csv").read_bytes()
        b = (tmp_path / "out_rgb" / f"g{i}_droplets.csv").read_bytes()
        assert a == b
        ma = (tmp_path / "out" / "predicted_masks" /
              f"g{i}_pred.png").read_bytes()
        mb = (tmp_path / "out_rgb" / "predicted_masks" /
              f"g{i}_pred.png").read_bytes()
        assert ma == mb
