"""Fused Pallas pair-conv kernels (ops/pallas_conv.py) vs the XLA pair
path, in interpret mode on CPU.

The kernels compute the SAME multiply-accumulates as models/unet_fast.py's
pair-packed XLA convs (themselves pinned against the flax module and the
torch reference in test_models.py), grouped mid/side per the module
docstring and accumulated in f32 — so in f32 the only allowed deviation is
summation order (~1e-6), and in bf16 the per-element rounding of outputs.
Reference behavior: models/model_2.py:40-54, :62-66, :80.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unetdc_tpu.models import unet_fast as F
from unetdc_tpu.models.unet import UNetDC, fold_batchnorm


@pytest.fixture(scope="module")
def folded():
    m = UNetDC()
    v = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
               train=False)
    return fold_batchnorm(v)


def test_pair_conv_pool_matches_xla_pair_conv(rng):
    """Kernel A (mid/side decomposition + fused 2x2 pool) vs the XLA conv
    with the structured pair kernel, f32."""
    from unetdc_tpu.ops.pallas_conv import pair_conv_pool, pair_mid_side

    c = 64
    B, H, Wp = 2, 32, 24
    W = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    b = rng.randn(c).astype(np.float32) * 0.1
    x = np.maximum(rng.randn(B, H, Wp, 2 * c).astype(np.float32), 0)

    y_ref = F._conv(jnp.asarray(x), jnp.asarray(F._pair_kernel(W, [c])),
                    jnp.asarray(np.concatenate([b, b])))
    p_ref = F._pool_from_pair(y_ref)

    mid, side = pair_mid_side(W)
    y, p = pair_conv_pool(
        jnp.asarray(x), jnp.asarray(mid), jnp.asarray(side),
        jnp.asarray(np.concatenate([b, b])[None]), tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", [(2, 64, 96), (1, 32, 32)])
def test_forward_folded_pallas_matches_xla_f32(folded, rng, shape):
    """Full pallas forward (kernel A + the dec1_head mega-kernel) vs
    forward_folded, f32, probabilities and logits."""
    fp = F.build_fast_params(folded["params"], dtype=jnp.float32)
    fp["_pa"] = F.build_pallas_head_params(folded["params"],
                                           dtype=jnp.float32)
    b, h, w = shape
    x = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    for sig in (True, False):
        ref = F.forward_folded(fp, x, apply_sigmoid=sig)
        out = F.forward_folded_pallas(fp, x, apply_sigmoid=sig,
                                      interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-6, rtol=1e-5)


def test_forward_folded_pallas_bf16_close_to_f32(folded, rng):
    """bf16 kernels accumulate in f32, so probabilities stay within bf16
    rounding of the f32 pallas forward."""
    fp32 = F.build_fast_params(folded["params"], dtype=jnp.float32)
    fp32["_pa"] = F.build_pallas_head_params(folded["params"],
                                             dtype=jnp.float32)
    fpb = F.build_fast_params(folded["params"], dtype=jnp.bfloat16)
    fpb["_pa"] = F.build_pallas_head_params(folded["params"],
                                            dtype=jnp.bfloat16)
    x = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    ref = F.forward_folded_pallas(fp32, x, interpret=True)
    out = F.forward_folded_pallas(fpb, x, interpret=True)
    assert float(jnp.abs(out - ref).max()) < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_forward_folded_pallas_spmd_bit_equal_across_meshes(folded, rng):
    """shard_map spatial/data sharding of the pallas kernels (ppermute
    halo exchange + ext-mode kernels with per-shard edge flags) must be
    BIT-identical to the single-device pallas forward — same per-row
    math, f32 accumulation — across mesh shapes, in bf16."""
    from unetdc_tpu.core.mesh import make_mesh

    fp = F.build_fast_params(folded["params"], dtype=jnp.bfloat16)
    fp["_pa"] = F.build_pallas_head_params(folded["params"],
                                           dtype=jnp.bfloat16)
    x = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    ref = np.asarray(F.forward_folded_pallas(fp, x, interpret=True))
    for nd, ns in [(8, 1), (2, 4), (1, 8)]:
        mesh = make_mesh(nd, ns)
        got = np.asarray(jax.jit(
            lambda c, m=mesh: F.forward_folded_pallas_spmd(
                fp, c, mesh=m, shard_space=True, interpret=True))(x))
        np.testing.assert_array_equal(got, ref, err_msg=f"{nd}x{ns}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_engine_pallas_spmd_interp_matches_single_pallas(rng):
    """Engine under a ('data','space') mesh with UNETDC_TPU_PALLAS=interp
    routes through forward_folded_pallas_spmd and produces bit-identical
    megastep outputs to the single-device pallas engine."""
    import os

    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.models.unet import UNetDC, init_params
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    variables = init_params(UNetDC(), jax.random.PRNGKey(0),
                            input_shape=(1, 32, 32, 3))
    imgs = (rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)

    old = os.environ.get("UNETDC_TPU_PALLAS")
    try:
        os.environ["UNETDC_TPU_PALLAS"] = "interp"
        single = QuantifyEngine(variables, compute_dtype=jnp.bfloat16,
                                max_labels=512, img_size=64)
        assert single._use_pallas and not single._use_pallas_spmd
        ref = single.run_batch(imgs, (64, 64), background_radius=10)

        mesh = make_mesh(2, 4)
        sharded = QuantifyEngine(variables, compute_dtype=jnp.bfloat16,
                                 max_labels=512, img_size=64, mesh=mesh,
                                 shard_space=True)
        assert sharded._use_pallas_spmd and not sharded._use_pallas
        out = sharded.run_batch(imgs, (64, 64), background_radius=10)
    finally:
        if old is None:
            os.environ.pop("UNETDC_TPU_PALLAS", None)
        else:
            os.environ["UNETDC_TPU_PALLAS"] = old

    np.testing.assert_array_equal(out["mask"], ref["mask"])
    np.testing.assert_array_equal(out["count"], ref["count"])
    np.testing.assert_array_equal(out["area"], ref["area"])


def test_engine_pallas_interp_matches_xla_masks(tmp_path, rng):
    """Engine opt-in (UNETDC_TPU_PALLAS=interp): megastep masks on a
    decisive checkpoint are bit-identical to the XLA fast path (sigmoid
    saturation makes masks stable across float summation orders)."""
    import os

    torch = pytest.importorskip("torch")
    from tests.torch_reference import make_decisive_checkpoint
    from unetdc_tpu.pipelines.engine import load_engine

    ckpt = tmp_path / "ref.pth"
    make_decisive_checkpoint(str(ckpt), seed=0, img_size=64)
    imgs = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)

    old = os.environ.get("UNETDC_TPU_PALLAS")
    oldf = os.environ.get("UNETDC_TPU_FAST_FWD")
    try:
        os.environ["UNETDC_TPU_FAST_FWD"] = "1"  # fast path even in f32
        os.environ["UNETDC_TPU_PALLAS"] = "0"
        eng0 = load_engine(str(ckpt), fast=False)
        eng0.img_size = 64
        assert not eng0._use_pallas
        ref = eng0.run_batch(imgs, (64, 64), background_radius=10)

        os.environ["UNETDC_TPU_PALLAS"] = "interp"
        eng1 = load_engine(str(ckpt), fast=False)
        eng1.img_size = 64
        assert eng1._use_pallas
        out = eng1.run_batch(imgs, (64, 64), background_radius=10)
    finally:
        for k, v in (("UNETDC_TPU_PALLAS", old),
                     ("UNETDC_TPU_FAST_FWD", oldf)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    np.testing.assert_array_equal(out["mask"], ref["mask"])
    np.testing.assert_array_equal(out["count"], ref["count"])
    np.testing.assert_array_equal(out["area"], ref["area"])
