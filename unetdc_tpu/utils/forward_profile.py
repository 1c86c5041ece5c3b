"""Per-LAYER device-time breakdown of the fast inference forward pass.

`utils.device_profile` attributes megastep time to pipeline stages; this
module drills into the dominant stage (forward_bf16, ~76% of the megastep)
and attributes it to individual UNetDC blocks, with a per-layer roofline:
useful FLOPs (the MACs the math requires), executed FLOPs (after XLA's
128-lane padding and the pair-layout structure — see models/unet_fast.py),
minimum HBM traffic, and which bound each layer sits against. This is the
evidence behind the "forward MFU 62% is layer-mix, not scheduling"
claim in ROUND3.md.

Timing method: each block is looped `iters` times inside ONE jitted
`lax.scan` (`device_profile._loop_jit`) so the ~30 ms relay dispatch
overhead amortizes away. Isolated-block times slightly overstate the
in-graph cost (no cross-block overlap) — the printed SUM vs the measured
whole-forward row quantifies that gap.

Reference: models/model_2.py:5-80 defines the architecture being timed;
the reference itself has no per-layer profiler.

Run: python -m unetdc_tpu.utils.forward_profile [--batch 8 --size 512]
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Tuple

import numpy as np

from unetdc_tpu.utils.device_profile import (PEAK_BF16_FLOPS, _loop_jit,
                                             _measure, _time_once)

PEAK_HBM_BYTES = 819e9  # v5e: ~819 GB/s


def _conv_flops(h: int, w: int, kh: int, kw: int, cin: int, cout: int,
                n: int) -> float:
    return 2.0 * n * h * w * kh * kw * cin * cout


def _pad128(c: int) -> int:
    return max(128, int(np.ceil(c / 128.0) * 128))


def profile_forward(batch: int = 8, size: int = 512, iters: int = 24,
                    seed: int = 0, verbose: bool = True) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from unetdc_tpu.models.unet import UNetDC, fold_batchnorm, init_params
    from unetdc_tpu.models import unet_fast as F

    rng = np.random.RandomState(seed)
    variables = init_params(UNetDC(), jax.random.PRNGKey(seed),
                            input_shape=(1, 64, 64, 3))
    folded = fold_batchnorm(variables)
    fp = F.build_fast_params(folded["params"], dtype=jnp.bfloat16)
    d = UNetDC.dilations
    B, S = batch, size
    bf = jnp.bfloat16

    def r(shape):
        return jnp.asarray(rng.rand(*shape), bf)

    # (name, op(carry)->out, example_input, [conv specs for FLOPs], note)
    # conv spec: (h, w, kh, kw, cin_useful, cout_useful, cin_exec, cout_exec)
    L: List[Tuple] = []

    # For pair-layout stages, spatial dims below are PAIR dims (S, S/2);
    # useful channel counts are written so h*w*cin*cout equals the true
    # unpaired MAC count (the structured pair kernel computes each original
    # tap once — see unet_fast._pair_kernel), while exec counts use the
    # full pair-kernel channels (2x useful by structure).
    x_pair = r((B, S, S // 2, 6))
    L.append(("enc1 (pair dc 3->64->64)",
              lambda c: F._dc(c, fp["enc1"]),
              x_pair,
              [(S, S // 2, 3, 3, 6, 64, _pad128(6), 128),
               (S, S // 2, 3, 3, 128, 64, 128, 128)],
              "pair layout: 128-dense lanes; 2x useful FLOPs by structure"))

    e1 = r((B, S, S // 2, 128))
    L.append(("pool1 (from pair)", lambda c: F._pool_from_pair(c), e1,
              [], "lane-half max + H-reduce"))

    p1 = r((B, S // 2, S // 2, 64))
    L.append(("enc2 (dc 64->128, dil 2)",
              lambda c: F._dc(c, fp["enc2"], d[1]), p1,
              [(S // 2, S // 2, 3, 3, 64, 128, _pad128(64), 128),
               (S // 2, S // 2, 3, 3, 128, 128, 128, 128)], ""))

    e2 = r((B, S // 2, S // 2, 128))
    L.append(("pool2+enc3 (128->256, dil 4)",
              lambda c: F._dc(F._pool(c), fp["enc3"], d[2]), e2,
              [(S // 4, S // 4, 3, 3, 128, 256, 128, 256),
               (S // 4, S // 4, 3, 3, 256, 256, 256, 256)], ""))

    e3 = r((B, S // 4, S // 4, 256))
    L.append(("pool3+enc4 (256->512, dil 8)",
              lambda c: F._dc(F._pool(c), fp["enc4"], d[3]), e3,
              [(S // 8, S // 8, 3, 3, 256, 512, 256, 512),
               (S // 8, S // 8, 3, 3, 512, 512, 512, 512)], ""))

    e4 = r((B, S // 8, S // 8, 512))
    L.append(("pool4+bottleneck (512->1024, dil 16)",
              lambda c: F._dc(F._pool(c), fp["bottleneck"], d[4]), e4,
              [(S // 16, S // 16, 3, 3, 512, 1024, 512, 1024),
               (S // 16, S // 16, 3, 3, 1024, 1024, 1024, 1024)], ""))

    bott = r((B, S // 16, S // 16, 1024))
    L.append(("upconv4 (2x2 convT 1024->512)",
              lambda c: F._upconv_t(c, fp["upconv4"]), bott,
              [(S // 8, S // 8, 1, 1, 1024, 512, 1024, 512)], ""))

    up4 = r((B, S // 8, S // 8, 512))
    L.append(("dec4 (concat+dc 1024->512)",
              lambda c: F._dc(jnp.concatenate(c, -1), fp["dec4"]),
              (up4, e4),
              [(S // 8, S // 8, 3, 3, 1024, 512, 1024, 512),
               (S // 8, S // 8, 3, 3, 512, 512, 512, 512)], ""))

    d4 = r((B, S // 8, S // 8, 512))
    L.append(("upconv3 (512->256)",
              lambda c: F._upconv_t(c, fp["upconv3"]), d4,
              [(S // 4, S // 4, 1, 1, 512, 256, 512, 256)], ""))

    up3 = r((B, S // 4, S // 4, 256))
    L.append(("dec3 (concat+dc 512->256)",
              lambda c: F._dc(jnp.concatenate(c, -1), fp["dec3"]),
              (up3, e3),
              [(S // 4, S // 4, 3, 3, 512, 256, 512, 256),
               (S // 4, S // 4, 3, 3, 256, 256, 256, 256)], ""))

    d3 = r((B, S // 4, S // 4, 256))
    L.append(("upconv2 (256->128)",
              lambda c: F._upconv_t(c, fp["upconv2"]), d3,
              [(S // 2, S // 2, 1, 1, 256, 128, 256, 128)], ""))

    up2 = r((B, S // 2, S // 2, 128))
    L.append(("dec2 (concat+dc 256->128)",
              lambda c: F._dc(jnp.concatenate(c, -1), fp["dec2"]),
              (up2, e2),
              [(S // 2, S // 2, 3, 3, 256, 128, 256, 128),
               (S // 2, S // 2, 3, 3, 128, 128, 128, 128)], ""))

    d2 = r((B, S // 2, S // 2, 128))
    L.append(("upconv1 (pair pixel-shuffle 128->64)",
              lambda c: F._upconv1_pair(c, fp["upconv1"]), d2,
              [(S // 2, S // 2, 1, 1, 128, 256, 128, 256)],
              "matmul emitting pair layout"))

    up1 = r((B, S, S // 2, 128))
    L.append(("dec1 (pair concat+dc 128->64->64)",
              lambda c: F._dc(jnp.concatenate(c, -1), fp["dec1"]),
              (up1, e1),
              [(S, S // 2, 3, 3, 256, 64, 256, 128),
               (S, S // 2, 3, 3, 128, 64, 128, 128)],
              "pair layout: 2x useful FLOPs by structure"))

    d1 = r((B, S, S // 2, 128))

    def out_op(c):
        import jax.nn
        from jax import lax
        y = lax.conv_general_dilated(c, fp["out_conv"]["k"], (1, 1),
                                     "VALID", dimension_numbers=F._DN,
                                     preferred_element_type=bf)
        return jax.nn.sigmoid(
            F._unpair(y + fp["out_conv"]["b"]).astype(jnp.float32))

    L.append(("out_conv+sigmoid (1x1 64->1)", out_op, d1,
              [(S, S // 2, 1, 1, 128, 1, 128, 128)], "pair 1x1"))

    null = _loop_jit(lambda c: c + 1, iters)
    zero = jnp.float32(0.0)
    _time_once(null, zero)
    overhead = min(_time_once(null, zero) for _ in range(3))

    header = (f"  {'layer':42s} {'ms':>7s} {'useful':>8s} {'MFU%':>6s} "
              f"{'exec%':>6s} {'trafficMB':>9s} {'bound':>7s}")
    if verbose:
        print(header)
    rows = {}
    total = 0.0
    for name, op, x, convs, note in L:
        sec = _measure(_loop_jit(op, iters), x, iters, overhead)
        total += sec
        useful = sum(_conv_flops(h, w, kh, kw, ci, co, B)
                     for h, w, kh, kw, ci, co, _, _ in convs)
        execf = sum(_conv_flops(h, w, kh, kw, cie, coe, B)
                    for h, w, kh, kw, _, _, cie, coe in convs)
        # min traffic: read inputs + write outputs + weights, all bf16
        leaves = x if isinstance(x, tuple) else (x,)
        in_b = sum(2 * int(np.prod(a.shape)) for a in leaves)
        es = jax.eval_shape(op, x)
        if isinstance(es, tuple):
            es = es[0]
        out_b = 2 * int(np.prod(es.shape))
        w_b = sum(2 * kh * kw * cie * coe
                  for _, _, kh, kw, _, _, cie, coe in convs)
        traffic = in_b + out_b + w_b
        t_comp = execf / PEAK_BF16_FLOPS
        t_bw = traffic / PEAK_HBM_BYTES
        bound = "compute" if t_comp > t_bw else "HBM"
        mfu = useful / sec / PEAK_BF16_FLOPS if sec else float("inf")
        epc = execf / sec / PEAK_BF16_FLOPS if sec else float("inf")
        # isolated small ops can time under the null-loop overhead noise
        # (~tens of us/iter on the relay): flag rather than report >peak
        subfloor = sec * 1e3 < 0.05 or epc > 1.2
        rows[name] = {"ms": sec * 1e3, "useful_gflop": useful / 1e9,
                      "mfu": None if subfloor else mfu,
                      "exec_util": None if subfloor else epc,
                      "traffic_mb": traffic / 1e6,
                      "bound": "sub-floor" if subfloor else bound}
        if verbose:
            m_s = "   n/a" if subfloor else f"{mfu * 100:6.1f}"
            e_s = "   n/a" if subfloor else f"{epc * 100:6.1f}"
            print(f"  {name:42s} {sec * 1e3:7.2f} {useful / 1e9:7.1f}G "
                  f"{m_s} {e_s} {traffic / 1e6:9.1f} "
                  f"{rows[name]['bound']:>9s}"
                  + (f"  # {note}" if note else ""))

    # whole forward, measured the same way, for the isolation-gap row
    x_f32 = jnp.asarray(rng.rand(B, S, S, 3), jnp.float32)
    whole = _measure(
        _loop_jit(lambda c: F.forward_folded(fp, c, d), iters),
        x_f32, iters, overhead)
    rows["_sum_of_layers_ms"] = total * 1e3
    rows["_whole_forward_ms"] = whole * 1e3
    if verbose:
        print(f"  {'SUM of isolated layers':42s} {total * 1e3:7.2f}")
        print(f"  {'whole forward (one jit)':42s} {whole * 1e3:7.2f}"
              f"   (gap = cross-layer overlap XLA finds)")
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()
    rows = profile_forward(args.batch, args.size, args.iters)

    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if isinstance(v, float):
            return round(v, 4) if np.isfinite(v) else None
        return v

    line = json.dumps(clean(rows))
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
