"""Int8 quantized inference forward (post-training quantization, opt-in).

Why this exists (measured on TPU v5e, ROUND3.md int8 probe): the MXU's
double-rate int8 path runs a 256->128->256 double conv (int32 accumulate +
requantize pass) 1.53x faster than the bf16 pair — 110.6% of bf16 peak
FLOP/s. The forward pass is ~74% of the inference megastep, so an int8
forward is the largest remaining device-throughput lever after the r2/r3
XLA-level work (pair packing, packed fetches, scan CC).

Scheme — standard symmetric post-training quantization:

- Weights: per-OUTPUT-channel symmetric int8 (scale = max|W|/127 per out
  channel), computed AFTER folding each input channel's activation scale
  into the weight (``W' = W * s_act(in_ch)``). Folding per input channel is
  what lets the decoder's concat(up, skip) inputs keep their own scales —
  no requantize-to-common-scale pass is ever needed at the concats.
- Activations: per-tensor symmetric int8, scales calibrated by running the
  exact f32 fast forward (`forward_calib`, same MACs as
  `unet_fast.forward_folded`) on one representative batch and recording
  per-tag maxima. ReLU outputs quantize to [0, 127]; the (un-ReLU'd)
  upconv outputs to [-127, 127].
- Each conv runs int8 x int8 -> int32 on the MXU
  (``preferred_element_type=int32``; no overflow: worst case accumulates
  1024*9*127^2 < 2^31), then one fused elementwise requantize
  ``clip(round(R*m + c), lo, 127)`` where ``m = s_w/s_next`` and
  ``c = bias/s_next`` — the ReLU is the lo=0 clip. Max-pools commute with
  monotone quantization, so they run directly on int8 (4x less HBM than
  f32, 2x less than bf16).
- The pair-packed layout of `unet_fast` is kept: XLA pads channel lanes to
  128 for int8 exactly as for bf16, so the 64-channel stages still need
  pair packing to fill the MXU tile.
- `out_conv` dequantizes to f32 (no requant) and applies the reference's
  sigmoid (models/model_2.py:80).

This path is NOT bit-parity with the reference (quantization error ~0.4%
of each tensor's range); it is an opt-in speed mode
(``QuantifyEngine(quantize="int8")`` / ``--int8`` on the batch CLI) with
mask-agreement guarantees pinned by tests/test_int8.py (the MEASURED
envelope on the worst-case random checkpoint — see the e2e test's
docstring). The f32/bf16 paths remain the parity defaults.

Why activation scales are per-TENSOR, not per-channel (r4 negative
result, ROUND4.md): per-channel scales fold for free at inference (the
requant multiplier is already a per-out-channel vector), and a faithful
fake-quant A/B measured them cutting probability error p99 0.125->0.082 —
but mask agreement was FLAT (0.9339->0.9330) because disagreements are
concentrated where |p - thresh| is small, which finer scales don't fix.
Per-tensor keeps the sidecar layout trivial for identical masks.

Reference behavior parity target: models/model_2.py:5-80 (architecture);
the reference has no quantized path — this is TPU-specific execution of
the same network.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unetdc_tpu.models import unet_fast as uf

_DN = ("NHWC", "HWIO", "NHWC")

# Calibration-tag order: one activation scale per quantization point.
# "<blk>a" = output of the block's conv0 (input to conv1); "<blk>" = block
# output; "up*" = transposed-conv outputs (symmetric range, no ReLU).
TAGS: Tuple[str, ...] = (
    "in",
    "enc1a", "enc1", "enc2a", "enc2", "enc3a", "enc3", "enc4a", "enc4",
    "botta", "bott",
    "up4", "dec4a", "dec4", "up3", "dec3a", "dec3", "up2", "dec2a", "dec2",
    "up1", "dec1a", "dec1",
)


# ---------------------------------------------------------------------------
# Calibration: exact replica of unet_fast.forward_folded that also returns
# the per-tag activation maxima (stacked in TAGS order -> ONE device fetch).
# ---------------------------------------------------------------------------
def forward_calib(fp: Dict[str, Any], x: jax.Array,
                  dilations: Sequence[int] = (1, 2, 4, 8, 16)
                  ) -> Tuple[jax.Array, jax.Array]:
    """f32 fast forward + activation maxima.

    ``fp``: `unet_fast.build_fast_params(..., dtype=jnp.float32)`.
    Returns ``(probs, maxima)`` with ``maxima`` a (len(TAGS),) f32 vector.
    The probs are identical to `forward_folded` (same ops, pinned by
    tests/test_int8.py) so the calibration batch doubles as a free f32
    reference output.
    """
    d = tuple(dilations)
    assert d[0] == 1
    rec: Dict[str, jax.Array] = {"in": jnp.max(x)}

    def dc(xi, p, tag, dil=1):
        a = uf._conv(xi, p["k0"], p["b0"], dil)
        rec[tag + "a"] = jnp.max(a)
        b = uf._conv(a, p["k1"], p["b1"], dil)
        rec[tag] = jnp.max(b)
        return b

    def up(xi, p, tag):
        y = uf._upconv_t(xi, p)
        rec[tag] = jnp.max(jnp.abs(y))
        return y

    xp = uf._pair(x.astype(fp["enc1"]["k0"].dtype))
    enc1p = dc(xp, fp["enc1"], "enc1")
    enc2 = dc(uf._pool_from_pair(enc1p), fp["enc2"], "enc2", d[1])
    enc3 = dc(uf._pool(enc2), fp["enc3"], "enc3", d[2])
    enc4 = dc(uf._pool(enc3), fp["enc4"], "enc4", d[3])
    bott = dc(uf._pool(enc4), fp["bottleneck"], "bott", d[4])
    dec4 = dc(jnp.concatenate([up(bott, fp["upconv4"], "up4"), enc4], -1),
              fp["dec4"], "dec4")
    dec3 = dc(jnp.concatenate([up(dec4, fp["upconv3"], "up3"), enc3], -1),
              fp["dec3"], "dec3")
    dec2 = dc(jnp.concatenate([up(dec3, fp["upconv2"], "up2"), enc2], -1),
              fp["dec2"], "dec2")
    up1p = uf._upconv1_pair(dec2, fp["upconv1"])
    rec["up1"] = jnp.max(jnp.abs(up1p))
    dec1p = dc(jnp.concatenate([up1p, enc1p], -1), fp["dec1"], "dec1")

    out = lax.conv_general_dilated(dec1p, fp["out_conv"]["k"], (1, 1),
                                   "VALID", dimension_numbers=_DN,
                                   preferred_element_type=dec1p.dtype)
    out = uf._unpair(out + fp["out_conv"]["b"]).astype(jnp.float32)
    maxima = jnp.stack([rec[t] for t in TAGS])
    return jax.nn.sigmoid(out), maxima


# ---------------------------------------------------------------------------
# Calibration persistence (sidecar .npz next to the checkpoint)
# ---------------------------------------------------------------------------
def save_calibration(path, maxima: np.ndarray) -> None:
    """Persist the per-tag activation maxima so later runs reproduce the
    SAME int8 params regardless of dataset order (the reference's
    determinism contract: same input -> same CSV,
    quantify_droplets_batch.py end-to-end)."""
    m = np.asarray(maxima, np.float32)
    if m.shape != (len(TAGS),):
        raise ValueError(f"expected {len(TAGS)} maxima, got {m.shape}")
    np.savez(path, maxima=m, tags=np.array(TAGS))


def load_calibration(path) -> np.ndarray:
    """Load + validate a `save_calibration` sidecar -> (len(TAGS),) f32."""
    with np.load(path, allow_pickle=False) as z:
        tags = tuple(str(t) for t in z["tags"])
        m = np.asarray(z["maxima"], np.float32)
    if tags != TAGS:
        raise ValueError(
            f"calibration sidecar {path} was written for a different "
            f"quantization-point layout ({len(tags)} tags vs {len(TAGS)}); "
            "delete it to recalibrate")
    if m.shape != (len(TAGS),) or not np.all(np.isfinite(m)) or m.min() < 0:
        raise ValueError(f"calibration sidecar {path} is corrupt: {m!r}")
    return m


# ---------------------------------------------------------------------------
# Quantization (host-side numpy; runs once per engine)
# ---------------------------------------------------------------------------
def _act_scale(maxima: Dict[str, float], tag: str) -> float:
    return max(float(maxima[tag]), 1e-8) / 127.0


def _quant_kernel(W: np.ndarray, in_scales: np.ndarray, in_axis: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold per-input-channel activation scales into W, then quantize per
    output channel (last axis). Returns (int8 kernel, (Cout,) f32 s_w)."""
    shape = [1] * W.ndim
    shape[in_axis] = -1
    Wf = W.astype(np.float64) * in_scales.reshape(shape)
    red = tuple(i for i in range(W.ndim) if i != W.ndim - 1)
    sw = np.maximum(np.abs(Wf).max(axis=red), 1e-12) / 127.0
    Wq = np.clip(np.rint(Wf / sw), -127, 127).astype(np.int8)
    return Wq, sw.astype(np.float32)


def build_int8_params(folded_params: Dict[str, Any], maxima: np.ndarray,
                      dilations: Sequence[int] = (1, 2, 4, 8, 16)
                      ) -> Dict[str, Any]:
    """Quantize `fold_batchnorm(...)['params']` given calibration maxima
    (TAGS order, from `forward_calib`). Returns the int8 param pytree for
    `forward_int8` (numpy leaves; caller moves to device)."""
    mx = {t: float(v) for t, v in zip(TAGS, np.asarray(maxima))}
    fp = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32),
        uf.build_fast_params(folded_params, dtype=jnp.float32))
    s = {t: _act_scale(mx, t) for t in TAGS}
    qp: Dict[str, Any] = {"in_inv": np.float32(1.0 / s["in"])}

    def dc(name, in_tag_groups):
        """in_tag_groups: [(tag, n_channels), ...] describing conv0's input
        channel dim (pair layout where applicable)."""
        blk = fp[name]
        in_scales = np.concatenate(
            [np.full(n, s[t], np.float32) for t, n in in_tag_groups])
        k0q, sw0 = _quant_kernel(blk["k0"], in_scales, in_axis=2)
        mid = name + "a" if name != "bottleneck" else "botta"
        out_t = name if name != "bottleneck" else "bott"
        k1q, sw1 = _quant_kernel(
            blk["k1"], np.full(blk["k1"].shape[2], s[mid], np.float32), 2)
        return {
            "k0": k0q, "m0": (sw0 / s[mid]).astype(np.float32),
            "c0": (blk["b0"] / s[mid]).astype(np.float32),
            "k1": k1q, "m1": (sw1 / s[out_t]).astype(np.float32),
            "c1": (blk["b1"] / s[out_t]).astype(np.float32),
        }

    qp["enc1"] = dc("enc1", [("in", fp["enc1"]["k0"].shape[2])])
    prev = {"enc2": "enc1", "enc3": "enc2", "enc4": "enc3",
            "bottleneck": "enc4"}
    for name, p in prev.items():
        qp[name] = dc(name, [(p, fp[name]["k0"].shape[2])])

    for name, src, out_t in (("upconv4", "bott", "up4"),
                             ("upconv3", "dec4", "up3"),
                             ("upconv2", "dec3", "up2")):
        k, b = fp[name]["k"], fp[name]["b"]
        kq, sw = _quant_kernel(
            k, np.full(k.shape[2], s[src], np.float32), 2)
        qp[name] = {"k": kq, "m": (sw / s[out_t]).astype(np.float32),
                    "c": (b / s[out_t]).astype(np.float32)}

    for name, ut, st in (("dec4", "up4", "enc4"), ("dec3", "up3", "enc3"),
                         ("dec2", "up2", "enc2")):
        half = fp[name]["k0"].shape[2] // 2
        qp[name] = dc(name, [(ut, half), (st, half)])

    # upconv1: (I, 4*O) matmul; columns ordered (p, q*O + o) — requantize on
    # the matmul output (before the pixel-shuffle reshape), so the bias
    # vector is the pair-layout bias tiled over the two p rows.
    k1, b1 = fp["upconv1"]["k"], fp["upconv1"]["b"]
    kq, sw = _quant_kernel(
        k1, np.full(k1.shape[0], s["dec2"], np.float32), 0)
    qp["upconv1"] = {"k": kq, "m": (sw / s["up1"]).astype(np.float32),
                     "c": (np.tile(b1, 2) / s["up1"]).astype(np.float32)}

    qp["dec1"] = dc("dec1", [("up1", 128), ("enc1", 128)])

    ko, bo = fp["out_conv"]["k"], fp["out_conv"]["b"]
    kq, sw = _quant_kernel(
        ko, np.full(ko.shape[2], s["dec1"], np.float32), 2)
    qp["out_conv"] = {"k": kq, "sw": sw, "b": bo.astype(np.float32)}
    return qp


# ---------------------------------------------------------------------------
# Int8 forward
# ---------------------------------------------------------------------------
# numpy scalar (not jnp): lax.reduce_window inspects the init value
# concretely, and a jnp scalar would be a tracer under jit
_I8_MIN = np.int8(-128)


def _requant(r_i32: jax.Array, m: jax.Array, c: jax.Array, lo: float
             ) -> jax.Array:
    """clip(round(R*m + c), lo, 127) -> int8. lo=0 IS the ReLU."""
    y = r_i32.astype(jnp.float32) * m + c
    return jnp.clip(jnp.round(y), lo, 127.0).astype(jnp.int8)


def _conv_q(x: jax.Array, k: jax.Array, dil: int = 1) -> jax.Array:
    return lax.conv_general_dilated(
        x, k, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)


def _dc_q(x, p, dil=1):
    a = _requant(_conv_q(x, p["k0"], dil), p["m0"], p["c0"], 0.0)
    return _requant(_conv_q(a, p["k1"], dil), p["m1"], p["c1"], 0.0)


def _pool_q(x):
    return lax.reduce_window(x, _I8_MIN, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _pool_from_pair_q(xp):
    c = xp.shape[-1] // 2
    m = jnp.maximum(xp[..., :c], xp[..., c:])
    return lax.reduce_window(m, _I8_MIN, lax.max,
                             (1, 2, 1, 1), (1, 2, 1, 1), "VALID")


def _upconv_t_q(x, p):
    r = lax.conv_transpose(x, p["k"], (2, 2), "VALID",
                           dimension_numbers=_DN,
                           preferred_element_type=jnp.int32)
    return _requant(r, p["m"], p["c"], -127.0)


def _upconv1_pair_q(x, p):
    b, h, w, i = x.shape
    r = lax.dot_general(x.reshape(-1, i), p["k"],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    yq = _requant(r, p["m"], p["c"], -127.0)       # (B*H*W, 2*2*O)
    yq = yq.reshape(b, h, w, 2, -1)
    return jnp.transpose(yq, (0, 1, 3, 2, 4)).reshape(b, 2 * h, w, -1)


def forward_int8(qp: Dict[str, Any], x: jax.Array,
                 dilations: Sequence[int] = (1, 2, 4, 8, 16),
                 apply_sigmoid: bool = True) -> jax.Array:
    """Quantized fast forward. ``x``: (B,H,W,3) f32 in [0,1], H,W % 16 == 0,
    W even. Returns (B,H,W,n_out) f32 probabilities (or logits)."""
    d = tuple(dilations)
    assert d[0] == 1, "pair layout requires undilated enc1"
    xq = jnp.clip(jnp.round(uf._pair(x) * qp["in_inv"]),
                  -127.0, 127.0).astype(jnp.int8)
    enc1p = _dc_q(xq, qp["enc1"])
    enc2 = _dc_q(_pool_from_pair_q(enc1p), qp["enc2"], d[1])
    enc3 = _dc_q(_pool_q(enc2), qp["enc3"], d[2])
    enc4 = _dc_q(_pool_q(enc3), qp["enc4"], d[3])
    bott = _dc_q(_pool_q(enc4), qp["bottleneck"], d[4])

    dec4 = _dc_q(jnp.concatenate([_upconv_t_q(bott, qp["upconv4"]), enc4],
                                 -1), qp["dec4"])
    dec3 = _dc_q(jnp.concatenate([_upconv_t_q(dec4, qp["upconv3"]), enc3],
                                 -1), qp["dec3"])
    dec2 = _dc_q(jnp.concatenate([_upconv_t_q(dec3, qp["upconv2"]), enc2],
                                 -1), qp["dec2"])
    up1p = _upconv1_pair_q(dec2, qp["upconv1"])
    dec1p = _dc_q(jnp.concatenate([up1p, enc1p], -1), qp["dec1"])

    r = lax.conv_general_dilated(                    # (B,H,W/2,2*n_out) i32
        dec1p, qp["out_conv"]["k"], (1, 1), "VALID",
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    out = r.astype(jnp.float32) * qp["out_conv"]["sw"] + qp["out_conv"]["b"]
    out = uf._unpair(out)
    if apply_sigmoid:
        out = jax.nn.sigmoid(out)
    return out
