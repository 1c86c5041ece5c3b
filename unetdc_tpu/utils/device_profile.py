"""Per-stage DEVICE-time breakdown of the inference megastep.

The reference has no profiling at all (SURVEY.md §5); `utils.profiling`
gives host wall-time per pipeline stage, but on this machine the host<->TPU
relay adds ~0.1 s dispatch latency and ~30 ms per-call overhead, which
swamps single-op microbenchmarks. This module times each megastep stage by
looping it N times INSIDE one jitted program (a `lax.scan` whose carry
feeds the next iteration, defeating loop-invariant hoisting), so dispatch
overhead is paid once and amortized.

Stages mirror `pipelines.engine.QuantifyEngine._megastep_impl`
(reference hot loop: quantify_droplets_batch.py:40-95):
  rolling_ball -> resize_u8 -> forward (UNetDC bf16) -> threshold+mask
  resize -> connected components+regionprops -> packbits.

Run: python -m unetdc_tpu.utils.device_profile [--batch 8 --size 512]
Prints a per-stage table with ms/batch, img/s, and model MFU, plus one
JSON line for machine consumption.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Callable, Dict

import numpy as np

# v5e peak: ~197 TFLOP/s bf16 (cloud.google.com/tpu/docs/v5e)
PEAK_BF16_FLOPS = 197e12


def _bump_leaf(a, bump):
    if a.dtype == np.bool_:
        import jax.numpy as jnp
        return jnp.logical_xor(a, bump > 0)
    return a + bump.astype(a.dtype)


def _loop_jit(op: Callable, n: int):
    """Jit `op` looped n times serially with an iteration-to-iteration data
    dependency (a runtime-zero bump derived from each output is folded back
    into the carry) so XLA cannot hoist the body out of the loop. Returns a
    function whose output is a scalar (cheap to fetch over the relay)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def body(carry, _):
        out = op(carry)
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = leaf.ravel()[0].astype(jnp.float32)
        bump = jnp.where(jnp.isnan(s), jnp.float32(1), jnp.float32(0))
        new = jax.tree_util.tree_map(lambda a: _bump_leaf(a, bump), carry)
        return new, ()

    def run(x):
        final, _ = lax.scan(body, x, None, length=n)
        leaves = jax.tree_util.tree_leaves(final)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves[:1])

    return jax.jit(run)


def _time_once(fn, x) -> float:
    t0 = time.perf_counter()
    y = fn(x)
    float(y)  # sync: np-style fetch (block_until_ready unreliable on axon)
    return time.perf_counter() - t0


def _measure(fn, x, n: int, overhead: float, repeats: int = 2) -> float:
    _time_once(fn, x)  # compile + warmup
    best = min(_time_once(fn, x) for _ in range(repeats))
    return max(best - overhead, 0.0) / n


def forward_flops(model, params, x) -> float:
    """FLOPs of one jitted forward batch from XLA's own cost analysis."""
    import jax

    try:
        compiled = jax.jit(
            lambda p, v: model.apply(p, v, train=False)).lower(
                params, x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return float("nan")


def profile_stages(batch: int = 8, size: int = 512, iters: int = 24,
                   seed: int = 0, verbose: bool = True,
                   int8: bool = False) -> Dict[str, float]:
    """Time each megastep stage on the current default device.

    Returns {stage: seconds_per_batch_call}, plus derived keys
    ``total``, ``img_per_s_device``, ``forward_mfu``. With ``int8`` the
    quantized forward (models/unet_int8.py) is timed too and
    ``total_int8``/``img_per_s_device_int8`` report the megastep with the
    int8 forward substituted.
    """
    import jax
    import jax.numpy as jnp

    from unetdc_tpu.models.unet import UNetDC, init_params, fold_batchnorm
    from unetdc_tpu.models.unet_fast import build_fast_params, forward_folded
    from unetdc_tpu.ops.resize import resize_linear_u8_cv2exact
    from unetdc_tpu.ops.rolling_ball import rolling_ball_correction_rgb
    from unetdc_tpu.ops.connected_components import quantify_mask_batch

    rng = np.random.RandomState(seed)
    from bench import make_blob_images  # synthetic microscopy-like inputs
    imgs = jnp.asarray(make_blob_images(batch, size, size, seed=seed))

    variables = init_params(UNetDC(), jax.random.PRNGKey(seed),
                            input_shape=(1, 64, 64, 3))
    folded = fold_batchnorm(variables)
    model = UNetDC(use_bn=False, dtype=jnp.bfloat16)
    # production inference path (engine.py): pair-packed fast forward
    fastp = build_fast_params(folded["params"], dtype=jnp.bfloat16)

    x_f32 = jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32)
    probs = jnp.asarray(rng.rand(batch, size, size, 1), jnp.float32)
    masks = jnp.asarray(
        (make_blob_images(batch, size, size, seed=seed + 1)[..., 0] > 128)
        .astype(np.uint8))

    def st_rolling_ball(c):
        return jax.vmap(lambda im: rolling_ball_correction_rgb(im, 50))(c)

    def st_resize(c):
        return jax.vmap(jax.vmap(
            lambda ch: resize_linear_u8_cv2exact(ch, (size, size)),
            in_axes=-1, out_axes=-1))(c)

    def st_forward(c):
        return forward_folded(fastp, c, UNetDC.dilations)

    def st_thresh_maskresize(c):
        m512 = (c[..., 0] > 0.3).astype(jnp.uint8)
        return jax.vmap(
            lambda m: resize_linear_u8_cv2exact(m, (size, size)))(m512)

    def st_cc(c):
        return quantify_mask_batch(c, jnp.int32(1), 4096, connectivity=1)

    def st_packbits(c):
        return jax.vmap(lambda m: jnp.packbits(m.reshape(-1)))(c)

    stages = [
        ("rolling_ball", st_rolling_ball, imgs),
        ("resize_u8", st_resize, imgs),
        ("forward_bf16", st_forward, x_f32),
        ("thresh+maskresize", st_thresh_maskresize, probs),
        ("cc+regionprops", st_cc, masks),
        ("packbits", st_packbits, masks),
    ]

    if jax.default_backend() == "tpu" and os.environ.get(
            "UNETDC_TPU_PALLAS", "auto") != "0":
        # production single-chip forward since r5: fused Pallas kernels
        # for the thin-channel stages (ops/pallas_conv.py)
        from unetdc_tpu.models.unet_fast import (build_pallas_head_params,
                                                 forward_folded_pallas)
        fastp_pa = dict(fastp)
        fastp_pa["_pa"] = build_pallas_head_params(folded["params"],
                                                   dtype=jnp.bfloat16)

        def st_forward_pallas(c):
            return forward_folded_pallas(fastp_pa, c, UNetDC.dilations)

        stages.append(("forward_pallas", st_forward_pallas, x_f32))

    if int8:
        from unetdc_tpu.models import unet_int8 as qi

        # calibrate on a tiny slice: scale VALUES don't affect timing, and
        # a 128^2 batch-1 f32 calibration program compiles far faster
        fp32c = build_fast_params(folded["params"], dtype=jnp.float32)
        xs = x_f32[:1, :128, :128, :]
        maxima = np.asarray(jax.jit(
            lambda f, a: qi.forward_calib(f, a, UNetDC.dilations)[1]
        )(fp32c, xs))
        qp = jax.tree_util.tree_map(
            jnp.asarray,
            qi.build_int8_params(folded["params"], maxima))

        def st_forward_int8(c):
            return qi.forward_int8(qp, c, UNetDC.dilations)

        stages.append(("forward_int8", st_forward_int8, x_f32))

    # relay/dispatch overhead baseline: an (almost) empty looped program
    null = _loop_jit(lambda c: c + 1, iters)
    zero = jnp.float32(0.0)
    _time_once(null, zero)
    overhead = min(_time_once(null, zero) for _ in range(3))

    out: Dict[str, float] = {}
    for name, op, x in stages:
        sec = _measure(_loop_jit(op, iters), x, iters, overhead)
        out[name] = sec
        if verbose:
            print(f"  {name:20s} {sec * 1e3:9.2f} ms/batch-{batch}  "
                  f"{batch / sec if sec else float('inf'):9.1f} img/s")

    out["total"] = sum(v for k, v in out.items()
                       if k not in ("forward_int8", "forward_pallas"))
    out["img_per_s_device"] = batch / out["total"]
    if "forward_pallas" in out:
        # the engine's actual single-chip megastep since r5
        out["total_pallas"] = (out["total"] - out["forward_bf16"]
                               + out["forward_pallas"])
        out["img_per_s_device_pallas"] = batch / out["total_pallas"]
    if "forward_int8" in out:
        out["total_int8"] = (out["total"] - out["forward_bf16"]
                             + out["forward_int8"])
        out["img_per_s_device_int8"] = batch / out["total_int8"]

    fl = forward_flops(model, folded, x_f32)
    out["forward_flops"] = fl
    if np.isfinite(fl) and out["forward_bf16"] > 0:
        out["forward_mfu"] = fl / out["forward_bf16"] / PEAK_BF16_FLOPS
    if verbose:
        print(f"  {'TOTAL':20s} {out['total'] * 1e3:9.2f} ms/batch-{batch}  "
              f"{out['img_per_s_device']:9.1f} img/s (device only)")
        if "total_int8" in out:
            print(f"  {'TOTAL (int8 fwd)':20s} {out['total_int8'] * 1e3:9.2f}"
                  f" ms/batch-{batch}  {out['img_per_s_device_int8']:9.1f}"
                  " img/s (device only)")
        if "forward_mfu" in out:
            print(f"  forward: {fl / 1e12:.3f} TFLOP/batch, "
                  f"MFU {out['forward_mfu'] * 100:.1f}% of bf16 peak")
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--int8", action="store_true",
                    help="also time the quantized int8 forward")
    args = ap.parse_args()

    res = profile_stages(args.batch, args.size, args.iters, int8=args.int8)
    line = json.dumps({k: (round(v, 6) if np.isfinite(v) else None)
                       for k, v in res.items()})
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
