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
@pytest.mark.slow
def test_engine_int8_end_to_end(tmp_path):
    """QuantifyEngine(quantize='int8') vs the f32 parity engine on a
    decisive checkpoint. Also pins lazy calibration + packed fetch.

    The agreement contract is the MEASURED envelope, not a wish: the
    random decisive checkpoint puts ~40% of output probabilities within
    0.1 of the 0.3 threshold (a trained, saturated model has almost no
    mass there), so int8's ~0.03 median probability error flips
    threshold-band pixels no quantization scheme can hold — per-channel
    activation scales were built and measured in r4 (probdiff p99
    0.125->0.082) and moved mask agreement NOT AT ALL (0.9339->0.9330;
    negative result recorded in ROUND4.md). Measured on this fixture:
    seed 0 agree=0.9412 / fg-dice=0.9673 / counts (23,19)->(22,16);
    other seeds range 0.845-0.996 with count fragmentation possible at
    the low end. Seed 0 is pinned with margin below."""
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
    assert agree >= 0.92, f"mask agreement {agree:.4f} (measured 0.9412)"
    inter = ((ref["mask"] > 0) & (got["mask"] > 0)).sum()
    dice = 2 * inter / max(1, (ref["mask"] > 0).sum()
                           + (got["mask"] > 0).sum())
    assert dice >= 0.95, f"fg dice {dice:.4f} (measured 0.9673)"
    rc, gc = ref["count"].astype(int), got["count"].astype(int)
    assert (np.abs(rc - gc) <= np.maximum(2, 0.25 * rc)).all(), (rc, gc)
    # second batch reuses the calibrated params (no recalibration)
    params_id = id(eng_int8.params)
    eng_int8.run_batch(imgs, out_hw)
    assert id(eng_int8.params) == params_id


def test_calibration_sidecar_roundtrip(tmp_path):
    """save_calibration / load_calibration: exact roundtrip + corruption
    and layout-mismatch rejection."""
    p = tmp_path / "c.npz"
    m = np.linspace(0.1, 9.0, len(qi.TAGS)).astype(np.float32)
    qi.save_calibration(p, m)
    np.testing.assert_array_equal(qi.load_calibration(p), m)
    with pytest.raises(ValueError, match="expected"):
        qi.save_calibration(p, m[:-1])
    np.savez(p, maxima=m, tags=np.array(qi.TAGS[:-1] + ("bogus",)))
    with pytest.raises(ValueError, match="different"):
        qi.load_calibration(p)
    np.savez(p, maxima=m * np.float32(-1), tags=np.array(qi.TAGS))
    with pytest.raises(ValueError, match="corrupt"):
        qi.load_calibration(p)


def test_calibrate_multi_batch_accumulates(folded_random, tmp_path):
    """calibrate_int8 over K batches freezes the ELEMENTWISE MAX of the
    per-batch maxima (ADVICE r3: one dark batch must not set the scales),
    and persists them to the engine's calib_path sidecar."""
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    sidecar = tmp_path / "scales.npz"
    eng = QuantifyEngine(
        {"params": folded_random["params"], "batch_stats": {}},
        img_size=32, quantize="int8", calib_path=str(sidecar))
    assert eng.params is None  # no sidecar yet -> lazy
    r = np.random.RandomState(0)
    dark = jnp.asarray(r.rand(1, 32, 32, 3) * 0.05, jnp.float32)
    bright = jnp.asarray(r.rand(1, 32, 32, 3), jnp.float32)
    fp32 = build_fast_params(folded_random["params"], dtype=jnp.float32)
    mx_each = [np.asarray(jax.jit(
        lambda f, a: qi.forward_calib(f, a, DIL)[1])(fp32, b))
        for b in (dark, bright)]
    eng.calibrate_int8([dark, bright], preprocessed=True)
    np.testing.assert_allclose(eng.calib_maxima,
                               np.maximum(*mx_each), rtol=1e-6)
    assert sidecar.exists()
    np.testing.assert_array_equal(qi.load_calibration(sidecar),
                                  eng.calib_maxima)
    # a fresh engine with the sidecar is calibrated at construction
    eng2 = QuantifyEngine(
        {"params": folded_random["params"], "batch_stats": {}},
        img_size=32, quantize="int8", calib_path=str(sidecar))
    assert eng2.params is not None
    np.testing.assert_array_equal(eng2.calib_maxima, eng.calib_maxima)


@pytest.mark.skipif(importlib.util.find_spec("torch") is None,
                    reason="torch oracle")
@pytest.mark.slow
def test_int8_sidecar_pins_masks_across_input_orders(tmp_path):
    """VERDICT r3 item 4 'done' criterion: with a calibration sidecar, two
    runs that see the dataset in DIFFERENT orders produce byte-identical
    masks (reference determinism contract: same input -> same CSV)."""
    from tests.torch_reference import make_decisive_checkpoint
    from unetdc_tpu.pipelines.engine import load_engine

    ckpt = str(tmp_path / "dec.pth")
    make_decisive_checkpoint(ckpt, seed=0)
    sidecar = str(tmp_path / "dec.pth.int8calib.npz")

    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[:96, :112]
    batches = []
    for scale in (30, 255):  # one dark batch, one bright batch
        b = (rng.rand(1, 96, 112, 3) * scale).astype(np.uint8)
        for _ in range(6):
            cy, cx = rng.randint(10, 86), rng.randint(10, 102)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= rng.randint(3, 9) ** 2
            b[0][blob] = np.minimum(b[0][blob] + 160, 255)
        batches.append(b)
    out_hw = (96, 112)

    eng_a = load_engine(ckpt, quantize="int8", calib_path=sidecar)
    eng_a.img_size = 128
    masks_a = [eng_a.run_batch(b, out_hw)["mask"] for b in batches]

    # run 2: REVERSED order; sidecar pins the scales from run 1
    eng_b = load_engine(ckpt, quantize="int8", calib_path=sidecar)
    eng_b.img_size = 128
    assert eng_b.params is not None  # loaded, not lazily calibrated
    masks_b = [eng_b.run_batch(b, out_hw)["mask"]
               for b in reversed(batches)][::-1]
    for a, b in zip(masks_a, masks_b):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(importlib.util.find_spec("torch") is None,
                    reason="torch oracle")
@pytest.mark.slow
def test_pipeline_calibrates_on_canonical_sorted_subset(tmp_path):
    """BatchQuantifyPipeline calibrates int8 scales from the first images
    in SORTED filename order (not dispatch order), accumulating maxima
    over up to `batch` images."""
    from PIL import Image
    from tests.torch_reference import make_decisive_checkpoint
    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.pipelines.quantify_batch import (BatchQuantifyPipeline,
                                                     list_images)

    ckpt = str(tmp_path / "dec.pth")
    make_decisive_checkpoint(ckpt, seed=0)
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(3)
    raw = (rng.rand(3, 64, 64, 3) * 200).astype(np.uint8)
    for i in range(3):
        Image.fromarray(raw[i]).save(d / f"img{i}.png")

    eng = load_engine(ckpt, quantize="int8")
    eng.img_size = 128
    pipe = BatchQuantifyPipeline(eng, str(tmp_path / "out"), batch=2,
                                 background_radius=20)
    pipe._maybe_calibrate(list_images(str(d)))
    assert eng.params is not None
    # oracle: explicit calibration on the first `batch`=2 sorted images
    eng2 = load_engine(ckpt, quantize="int8")
    eng2.img_size = 128
    eng2.calibrate_int8(raw[:2], background_radius=20)
    np.testing.assert_array_equal(eng.calib_maxima, eng2.calib_maxima)


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
