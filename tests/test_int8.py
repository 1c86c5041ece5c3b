"""Int8 quantized inference path (models/unet_int8.py): quantizer math,
calibration-forward exactness, and mask agreement with the f32 parity path.

The int8 path is an opt-in speed mode (no bit-parity claim vs the torch
reference — that contract stays with the f32/bf16 paths); these tests pin
what IS guaranteed: per-channel weight quantization within half a step,
the calibration forward being numerically identical to
`unet_fast.forward_folded`, and end-to-end mask agreement at the
reference's 0.3 threshold on decisive checkpoints.
Reference architecture target: models/model_2.py:5-80."""

import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unetdc_tpu.models.unet import UNetDC, init_params, fold_batchnorm
from unetdc_tpu.models.unet_fast import build_fast_params, forward_folded
from unetdc_tpu.models import unet_int8 as qi

DIL = (1, 2, 4, 8, 16)


@pytest.fixture(scope="module")
def folded_random():
    m = UNetDC(use_bn=True, dtype=jnp.float32)
    v = init_params(m, jax.random.PRNGKey(3), (1, 32, 32, 3))
    return fold_batchnorm(v)


def test_quant_kernel_reconstruction():
    """Dequantized weights reproduce W * in_scale within half a quant step
    per output channel, and scales are per-output-channel maxima / 127."""
    rng = np.random.RandomState(0)
    W = rng.randn(3, 3, 8, 16).astype(np.float32)
    in_scales = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    Wq, sw = qi._quant_kernel(W, in_scales, in_axis=2)
    assert Wq.dtype == np.int8 and sw.shape == (16,)
    Wf = W * in_scales[None, None, :, None]
    err = np.abs(Wq.astype(np.float32) * sw - Wf)
    assert (err <= 0.5 * sw[None, None, None, :] + 1e-7).all()
    assert np.allclose(sw, np.abs(Wf).max(axis=(0, 1, 2)) / 127.0)
    # matmul layout (in_axis=0) agrees with an explicit fold
    K = rng.randn(8, 16).astype(np.float32)
    Kq, sk = qi._quant_kernel(K, in_scales, in_axis=0)
    assert (np.abs(Kq.astype(np.float32) * sk - K * in_scales[:, None])
            <= 0.5 * sk[None, :] + 1e-7).all()


def test_requant_formula_matches_explicit():
    """clip(round(R*m + c), lo, 127) == quantize(relu(dequant(R) + bias))."""
    rng = np.random.RandomState(1)
    R = jnp.asarray(rng.randint(-200000, 200000, (64, 8)), jnp.int32)
    sw = rng.uniform(1e-4, 1e-2, 8).astype(np.float32)
    bias = rng.randn(8).astype(np.float32) * 0.1
    s_next = 0.037
    got = qi._requant(R, jnp.asarray(sw / s_next), jnp.asarray(bias / s_next),
                      0.0)
    y = np.asarray(R, np.float32) * sw + bias          # dequant + bias
    want = np.clip(np.round(np.maximum(y, 0.0) / s_next), 0, 127)
    assert (np.asarray(got) == want.astype(np.int8)).all()


def test_forward_calib_matches_folded(folded_random):
    """The calibration forward is the SAME program as forward_folded (its
    probs must match exactly) and its maxima vector covers every tag."""
    fp32 = build_fast_params(folded_random["params"], dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    p_ref = forward_folded(fp32, x, DIL)
    p_cal, maxima = jax.jit(lambda f, a: qi.forward_calib(f, a, DIL))(fp32, x)
    np.testing.assert_allclose(np.asarray(p_cal), np.asarray(p_ref),
                               atol=1e-6)
    mx = np.asarray(maxima)
    assert mx.shape == (len(qi.TAGS),) and (mx > 0).all()
    assert float(mx[qi.TAGS.index("in")]) == pytest.approx(
        float(jnp.max(x)), rel=1e-6)


def test_int8_agreement_random_init(folded_random):
    """Random-init model (probs clustered near 0.5 — the hardest regime for
    threshold agreement): int8 probs within 1e-2 of f32 everywhere."""
    fp32 = build_fast_params(folded_random["params"], dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    p_ref = np.asarray(forward_folded(fp32, x, DIL))
    _, maxima = jax.jit(lambda f, a: qi.forward_calib(f, a, DIL))(fp32, x)
    qp = jax.tree_util.tree_map(
        jnp.asarray,
        qi.build_int8_params(folded_random["params"], np.asarray(maxima)))
    p_q = np.asarray(jax.jit(lambda q, a: qi.forward_int8(q, a, DIL))(qp, x))
    assert np.abs(p_ref - p_q).max() < 1e-2
    assert np.abs(p_ref - p_q).mean() < 2e-3


@pytest.mark.skipif(importlib.util.find_spec("torch") is None,
                    reason="torch oracle")
def test_engine_int8_end_to_end(tmp_path):
    """QuantifyEngine(quantize='int8') vs the f32 parity engine on a
    decisive checkpoint: >=99.5% mask-pixel agreement at thresh 0.3 and
    droplet counts within 2%. Also pins lazy calibration + packed fetch."""
    from PIL import Image  # noqa: F401 (env sanity)
    from tests.torch_reference import make_decisive_checkpoint
    from unetdc_tpu.pipelines.engine import load_engine

    ckpt = str(tmp_path / "dec.pth")
    make_decisive_checkpoint(ckpt, seed=0)

    rng = np.random.RandomState(7)
    imgs = (rng.rand(2, 96, 112, 3) * 60).astype(np.uint8)
    yy, xx = np.mgrid[:96, :112]
    for b in range(2):
        for _ in range(6):
            cy, cx = rng.randint(10, 86), rng.randint(10, 102)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= rng.randint(3, 9) ** 2
            imgs[b][blob] = np.minimum(imgs[b][blob] + 180, 255)

    eng_f32 = load_engine(ckpt, fast=False)
    eng_int8 = load_engine(ckpt, quantize="int8")
    eng_f32.img_size = eng_int8.img_size = 128
    assert eng_int8.params is None  # calibration is lazy
    out_hw = (96, 112)
    ref = eng_f32.run_batch(imgs, out_hw)
    got = eng_int8.run_batch(imgs, out_hw)
    assert eng_int8.params is not None
    agree = (ref["mask"] == got["mask"]).mean()
    assert agree >= 0.995, f"mask agreement {agree:.4f}"
    assert np.abs(ref["count"].astype(int) - got["count"].astype(int)).max() \
        <= max(1, int(0.02 * max(1, int(ref["count"].max()))))
    # second batch reuses the calibrated params (no recalibration)
    params_id = id(eng_int8.params)
    eng_int8.run_batch(imgs, out_hw)
    assert id(eng_int8.params) == params_id


def test_engine_int8_rejects_odd_img_size(folded_random):
    from unetdc_tpu.pipelines.engine import QuantifyEngine
    from unetdc_tpu.models.unet import UNetDC as M

    with pytest.raises(ValueError):
        QuantifyEngine({"params": folded_random["params"],
                        "batch_stats": {}}, model_cls=M, img_size=127,
                       quantize="int8")
    with pytest.raises(ValueError):
        QuantifyEngine({"params": folded_random["params"],
                        "batch_stats": {}}, model_cls=M, img_size=128,
                       quantize="fp4")
