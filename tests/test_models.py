"""Model parity tests: JAX UNet/UNetDC vs the reference PyTorch semantics.

Strategy (SURVEY.md §4.3): build a randomly-initialized torch model with the
exact reference architecture, save/convert its state dict, and require the
JAX forward to match torch within float tolerance. This pins conv layouts,
dilation/padding, BN statistics, transposed-conv semantics, and the
sigmoid-in-forward behavior.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unetdc_tpu.models.unet import UNet, UNetDC, fold_batchnorm, init_params
from unetdc_tpu.checkpoint.convert import (
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)


def _torch_unetdc(dilations):
    """Reference-architecture torch model (models/model_2.py:5-54 semantics),
    built independently here as the parity oracle."""

    def double_conv(cin, cout, dilation):
        return tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=dilation, dilation=dilation),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(cout, cout, 3, padding=dilation, dilation=dilation),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(inplace=True),
        )

    class Ref(tnn.Module):
        def __init__(self):
            super().__init__()
            d = dilations
            self.enc1 = double_conv(3, 64, d[0])
            self.enc2 = double_conv(64, 128, d[1])
            self.enc3 = double_conv(128, 256, d[2])
            self.enc4 = double_conv(256, 512, d[3])
            self.bottleneck = double_conv(512, 1024, d[4])
            self.upconv4 = tnn.ConvTranspose2d(1024, 512, 2, 2)
            self.dec4 = double_conv(1024, 512, 1)
            self.upconv3 = tnn.ConvTranspose2d(512, 256, 2, 2)
            self.dec3 = double_conv(512, 256, 1)
            self.upconv2 = tnn.ConvTranspose2d(256, 128, 2, 2)
            self.dec2 = double_conv(256, 128, 1)
            self.upconv1 = tnn.ConvTranspose2d(128, 64, 2, 2)
            self.dec1 = double_conv(128, 64, 1)
            self.out_conv = tnn.Conv2d(64, 1, 1)

        def forward(self, x):
            e1 = self.enc1(x)
            e2 = self.enc2(tF.max_pool2d(e1, 2))
            e3 = self.enc3(tF.max_pool2d(e2, 2))
            e4 = self.enc4(tF.max_pool2d(e3, 2))
            b = self.bottleneck(tF.max_pool2d(e4, 2))
            d4 = self.dec4(torch.cat([self.upconv4(b), e4], 1))
            d3 = self.dec3(torch.cat([self.upconv3(d4), e3], 1))
            d2 = self.dec2(torch.cat([self.upconv2(d3), e2], 1))
            d1 = self.dec1(torch.cat([self.upconv1(d2), e1], 1))
            return torch.sigmoid(self.out_conv(d1))

    return Ref()


@pytest.mark.parametrize("dilations,jax_cls", [
    ((1, 1, 1, 1, 1), UNet),
    ((1, 2, 4, 8, 16), UNetDC),
])
def test_forward_parity_with_torch(dilations, jax_cls, tmp_path):
    torch.manual_seed(0)
    tm = _torch_unetdc(dilations).eval()
    # randomize BN stats so folding/eval parity is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    pth = tmp_path / "ref.pth"
    torch.save(tm.state_dict(), str(pth))

    # load via our torch-free reader and convert
    from unetdc_tpu.checkpoint.pth import load_pth_state_dict

    sd = load_pth_state_dict(str(pth))
    # cross-check reader against torch.load
    tl = torch.load(str(pth), map_location="cpu")
    for k, v in tl.items():
        np.testing.assert_array_equal(sd[k], v.numpy(), err_msg=k)

    variables = torch_state_dict_to_variables(sd)

    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)  # NCHW -> NHWC

    model = jax_cls()
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    # tolerance: pure f32 accumulation-order noise through 23 convs measures
    # ~3e-4 max on sigmoid outputs; semantic/layout bugs produce O(1) errors.
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-2)

    # BN-folded inference path must match too
    folded = fold_batchnorm(variables)
    model_nf = jax_cls(use_bn=False)
    out2 = model_nf.apply(folded, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out2), ref, atol=2e-3, rtol=1e-2)


def test_roundtrip_state_dict():
    model = UNetDC()
    variables = init_params(model, jax.random.PRNGKey(3))
    sd = variables_to_torch_state_dict(variables)
    back = torch_state_dict_to_variables(sd)
    flat1 = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat2 = jax.tree_util.tree_leaves_with_path(back["params"])
    assert len(flat1) == len(flat2)
    for (p1, a1), (p2, a2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=0)


def test_pth_reader_noncontiguous_and_dtypes(tmp_path):
    """The torch-free reader must respect storage strides (non-contiguous
    tensors) and non-f32 dtypes."""
    from unetdc_tpu.checkpoint.pth import load_pth_state_dict

    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {
        "transposed": base.t(),                       # stride (1, 6)
        "sliced": base[:, 1:5],                       # offset + stride
        "long": torch.arange(5, dtype=torch.int64),
        "half": torch.rand(3, 3).half(),
        "bf16": torch.rand(3, 3).bfloat16(),
        "bool": torch.tensor([True, False, True]),
    }
    p = tmp_path / "w.pth"
    torch.save(sd, str(p))
    out = load_pth_state_dict(str(p))
    for k, v in sd.items():
        expect = v.float().numpy() if k == "bf16" else v.numpy()
        got = out[k].astype(np.float32) if k == "bf16" else out[k]
        np.testing.assert_array_equal(got, expect, err_msg=k)


def test_train_mode_batchnorm_updates():
    model = UNetDC()
    variables = init_params(model, input_shape=(1, 32, 32, 3))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 1)
    before = variables["batch_stats"]["enc1"]["bn0"]["mean"]
    after = mutated["batch_stats"]["enc1"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("jax_cls", [UNet, UNetDC])
def test_fast_forward_matches_module(jax_cls):
    """models/unet_fast.py (pair-packed layout + conv_transpose upconvs)
    computes the same MACs as the flax module — agreement up to f32
    summation-order noise, on a non-square even-width input."""
    from unetdc_tpu.models.unet_fast import build_fast_params, forward_folded

    variables = init_params(jax_cls(), jax.random.PRNGKey(3),
                            input_shape=(1, 64, 64, 3))
    folded = fold_batchnorm(variables)
    model = jax_cls(use_bn=False, dtype=jnp.float32)
    fp = build_fast_params(folded["params"], dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(7).rand(2, 64, 96, 3), jnp.float32)
    ref = model.apply(folded, x, train=False)
    out = forward_folded(fp, x, dilations=jax_cls.dilations)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.fixture(scope="module")
def _torch_oracles():
    """One torch reference model + converted JAX variables per
    (weights_seed, dilations) — built once for the whole breadth matrix
    (31M params each; rebuilding per case would dominate the suite)."""
    cache = {}

    def get(seed, dilations):
        if (seed, dilations) not in cache:
            torch.manual_seed(seed)
            tm = _torch_unetdc(dilations).eval()
            with torch.no_grad():
                for m in tm.modules():
                    if isinstance(m, tnn.BatchNorm2d):
                        m.running_mean.uniform_(-0.5, 0.5)
                        m.running_var.uniform_(0.5, 2.0)
            sd = {k: v.numpy() for k, v in tm.state_dict().items()}
            variables = torch_state_dict_to_variables(sd)
            cache[(seed, dilations)] = (tm, variables)
        return cache[(seed, dilations)]

    return get


@pytest.mark.parametrize("jax_cls,seed,shape", [
    # breadth matrix (VERDICT r2 item 10): multiple weight seeds and
    # non-square input sizes. Valid sizes are multiples of 16 — the
    # reference's own topology (4 pools + 4 stride-2 upconvs with skip
    # concat, models/model_2.py:56-80) hard-crashes on anything else, so
    # "odd" sizes have no reference behavior to match.
    (UNetDC, 0, (48, 80)),
    (UNetDC, 1, (96, 48)),
    (UNetDC, 1, (32, 112)),
    (UNet, 1, (48, 80)),
    (UNet, 0, (80, 32)),
])
def test_forward_parity_matrix(_torch_oracles, jax_cls, seed, shape):
    dilations = jax_cls.dilations
    tm, variables = _torch_oracles(seed, tuple(dilations))
    h, w = shape
    x = np.random.RandomState(seed * 7 + h).rand(2, h, w, 3).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)

    model = jax_cls()
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-2)


@pytest.mark.parametrize("jax_cls", [UNet, UNetDC])
def test_bf16_fast_path_close_to_torch(_torch_oracles, jax_cls):
    """The production TPU path (bf16 pair-packed fast forward) against the
    torch f32 oracle on a non-square input: bf16 rounding through 23 convs
    bounds the probability error at ~1e-2; layout bugs produce O(1)."""
    from unetdc_tpu.models.unet_fast import build_fast_params, forward_folded

    tm, variables = _torch_oracles(0, tuple(jax_cls.dilations))
    x = np.random.RandomState(3).rand(2, 48, 80, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)

    folded = fold_batchnorm(variables)
    fp = build_fast_params(folded["params"], dtype=jnp.bfloat16)
    out = forward_folded(fp, jnp.asarray(x), dilations=jax_cls.dilations)
    assert np.asarray(out).dtype == np.float32  # probs emitted in f32
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)


def test_engine_fast_forward_matches_flax_path(monkeypatch):
    """QuantifyEngine's default fast forward produces the same probabilities
    as the UNETDC_TPU_FAST_FWD=0 flax fallback."""
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    variables = init_params(UNetDC(), jax.random.PRNGKey(1),
                            input_shape=(1, 64, 64, 3))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    monkeypatch.setenv("UNETDC_TPU_FAST_FWD", "1")
    fast = QuantifyEngine(variables, img_size=64, compute_dtype=jnp.float32)
    assert fast._use_fast
    monkeypatch.setenv("UNETDC_TPU_FAST_FWD", "0")
    slow = QuantifyEngine(variables, img_size=64, compute_dtype=jnp.float32)
    assert not slow._use_fast
    # default: auto-on for bf16, off for the f32 parity dtype
    monkeypatch.delenv("UNETDC_TPU_FAST_FWD")
    assert QuantifyEngine(variables, img_size=64,
                          compute_dtype=jnp.bfloat16)._use_fast
    assert not QuantifyEngine(variables, img_size=64,
                              compute_dtype=jnp.float32)._use_fast
    a = np.asarray(fast.forward_probs(x))
    b = np.asarray(slow.forward_probs(x))
    np.testing.assert_allclose(a, b, atol=2e-4)
