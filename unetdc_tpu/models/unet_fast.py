"""Folded-inference fast path for UNet/UNetDC: pure-lax forward with a
pair-packed layout for the 64-channel full-resolution stages.

Why this exists (measured on TPU v5e, batch 8, 512x512, bf16):

- XLA physically pads the channel (lane) dimension to 128. A conv with 64
  input AND 64 output channels therefore executes 4x its useful FLOPs
  (matmul diagnostic: (524288,1152)@(1152,64) takes the same wall time as
  @(1152,128)). The two 64->64 convolutions (enc1.conv2, dec1.conv2) run at
  ~25% MFU for this reason — they dominate the forward pass at 512^2.
- Fix: merge each pair of horizontally adjacent pixels into the channel
  dim ("pair layout": (B,H,W,C) -> (B,H,W/2,2C)), so the lane dim is 128
  dense. A 3x3 conv becomes a 3x3 conv over pair-columns with a structured
  (3,3,2C,2C') kernel holding each original tap once — executed FLOPs drop
  from 4x to 2x useful, i.e. a ~2x speedup for the 64->64 convs.
- The 2x2 max-pool after enc1 consumes the pair layout for free (the
  horizontal pool reduces exactly over the two phases of a pair), and
  upconv1 produces it for free (the W-interleave of the pixel-shuffle is
  exactly the pair merge), so no relayout copies are paid at the seams.
- The decoder's 2x2/stride-2 upconvs use `lax.conv_transpose` (faster than
  the einsum pixel-shuffle at 128+ channels: 0.20 vs 0.59 ms for upconv2).

This module is inference-only (BatchNorm already folded — see
`unet.fold_batchnorm`) and numerically equivalent to
`UNetDC(use_bn=False).apply` up to floating-point summation order: it
computes exactly the same multiply-accumulates per output pixel, grouped
differently. `tests/test_models.py` pins the agreement.

Reference behavior parity: models/model_2.py:5-80 (architecture),
models/model_2.py:80 (sigmoid-in-forward). The reference has no equivalent
of this module — it is TPU-specific scheduling of the same math.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _pair_kernel(W: np.ndarray, in_groups: Sequence[int]) -> np.ndarray:
    """Lift a (3,3,Cin,Cout) HWIO kernel to pair layout (3,3,2*Cin,2*Cout).

    ``in_groups`` describes the input channel dim as a concatenation of
    independently pair-packed tensors (e.g. [64, 64] for concat(up, skip)),
    because pair(concat(a, b)) != concat(pair(a), pair(b)).

    Output pair phase q of pair j, tap dx in {-1,0,1}, reads original
    column 2j+q+dx = pair j+joff phase qin with joff=(q+dx+2)//2-1,
    qin=q+dx-2*joff. Every original tap appears exactly once, so the
    structured kernel computes identical MACs (zeros elsewhere).
    """
    kh, kw, cin, cout = W.shape
    assert kh == 3 and kw == 3 and cin == sum(in_groups)
    Wp = np.zeros((3, 3, 2 * cin, 2 * cout), W.dtype)
    for q in range(2):
        for dx in (-1, 0, 1):
            col = q + dx
            joff = (col + 2) // 2 - 1
            qin = col - 2 * joff
            base = 0
            for cg in in_groups:
                src = W[:, dx + 1, base:base + cg, :]
                Wp[:, joff + 1,
                   2 * base + qin * cg: 2 * base + (qin + 1) * cg,
                   q * cout:(q + 1) * cout] = src
                base += cg
    return Wp


def _pair(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def _unpair(x: jax.Array) -> jax.Array:
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, 2 * wp, c2 // 2)


def build_pallas_head_params(folded_params: Dict[str, Any],
                             dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Weights for the fused Pallas kernels (ops/pallas_conv.py): the
    enc1.conv1+pool kernel and the upconv1+dec1+out_conv head kernel.

    Returns {"wmid","wside","bias"} for `pair_conv_pool` plus
    {"head": {...}} for `dec1_head`, built from the same folded params as
    `build_fast_params` (mid/side decomposition documented there)."""
    from unetdc_tpu.ops.pallas_conv import pair_mid_side

    P = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                               folded_params)

    def pair_bias(b):
        return np.concatenate([b, b])[None]  # (1, 2c), f32

    w1 = P["enc1"]["conv1"]["kernel"]  # (3,3,64,64)
    mid, side = pair_mid_side(w1)
    pa: Dict[str, Any] = {
        "wmid": jnp.asarray(mid, dtype),
        "wside": jnp.asarray(side, dtype),
        "bias": jnp.asarray(pair_bias(P["enc1"]["conv1"]["bias"]),
                            jnp.float32),
    }

    k0 = P["dec1"]["conv0"]["kernel"]  # (3,3,128,64): concat(up, enc1)
    cg = k0.shape[2] // 2
    wm_up, ws_up = pair_mid_side(k0[:, :, :cg, :])
    wm_e, ws_e = pair_mid_side(k0[:, :, cg:, :])
    wm1, ws1 = pair_mid_side(P["dec1"]["conv1"]["kernel"])
    wu = P["upconv1"]["kernel"]  # (I, O, 2, 2) torch ConvTranspose2d
    i, o = wu.shape[0], wu.shape[1]
    oc = P["out_conv"]["kernel"]  # (1,1,64,n_out)
    n_out = oc.shape[3]
    ocp = np.zeros((2 * o, 2 * n_out), np.float32)
    for q in range(2):
        ocp[q * o:(q + 1) * o, q * n_out:(q + 1) * n_out] = oc[0, 0]
    pa["head"] = {
        "upk": jnp.asarray(
            np.transpose(wu, (0, 2, 3, 1)).reshape(i, 4 * o), dtype),
        "upb": jnp.asarray(np.tile(P["upconv1"]["bias"], 4)[None],
                           jnp.float32),
        "wm_up": jnp.asarray(wm_up, dtype),
        "ws_up": jnp.asarray(ws_up, dtype),
        "wm_e": jnp.asarray(wm_e, dtype),
        "ws_e": jnp.asarray(ws_e, dtype),
        "b0": jnp.asarray(pair_bias(P["dec1"]["conv0"]["bias"]),
                          jnp.float32),
        "wm1": jnp.asarray(wm1, dtype),
        "ws1": jnp.asarray(ws1, dtype),
        "b1": jnp.asarray(pair_bias(P["dec1"]["conv1"]["bias"]),
                          jnp.float32),
        "ock": jnp.asarray(ocp, dtype),
        "ocb": jnp.asarray(np.tile(P["out_conv"]["bias"], 2)[None],
                           jnp.float32),
    }
    return pa


def forward_folded_pallas(fp: Dict[str, Any], x: jax.Array,
                          dilations: Tuple[int, ...] = (1, 2, 4, 8, 16),
                          apply_sigmoid: bool = True,
                          interpret: bool = False) -> jax.Array:
    """`forward_folded` with the thin-channel stages on the fused Pallas
    kernels (ops/pallas_conv.py): enc1.conv1+pool1 fused, and
    upconv1+dec1+out_conv+sigmoid fused. Same MACs, f32 accumulation in
    the fused stages. Requires fp["_pa"] = build_pallas_head_params(...).
    Single-device only (pallas_call has no GSPMD partitioning rule)."""
    from unetdc_tpu.ops.pallas_conv import dec1_head, pair_conv_pool

    d = dilations
    assert d[0] == 1, "pair layout only implemented for undilated enc1"
    pa = fp["_pa"]
    dt = fp["enc1"]["k0"].dtype
    xp = _pair(x.astype(dt))
    h = _conv(xp, fp["enc1"]["k0"], fp["enc1"]["b0"])  # stem (XLA)
    enc1p, pooled = pair_conv_pool(h, pa["wmid"], pa["wside"], pa["bias"],
                                   interpret=interpret)
    enc2 = _dc(pooled, fp["enc2"], d[1])
    enc3 = _dc(_pool(enc2), fp["enc3"], d[2])
    enc4 = _dc(_pool(enc3), fp["enc4"], d[3])
    bott = _dc(_pool(enc4), fp["bottleneck"], d[4])

    dec4 = _dc(jnp.concatenate([_upconv_t(bott, fp["upconv4"]), enc4], -1),
               fp["dec4"])
    dec3 = _dc(jnp.concatenate([_upconv_t(dec4, fp["upconv3"]), enc3], -1),
               fp["dec3"])
    dec2 = _dc(jnp.concatenate([_upconv_t(dec3, fp["upconv2"]), enc2], -1),
               fp["dec2"])
    out = dec1_head(dec2, enc1p, pa["head"], sigmoid=apply_sigmoid,
                    interpret=interpret)
    b, hh, wp, no2 = out.shape
    return out.reshape(b, hh, wp * 2, no2 // 2)


def forward_folded_pallas_spmd(fp: Dict[str, Any], x: jax.Array,
                               dilations: Tuple[int, ...] = (1, 2, 4, 8, 16),
                               *, mesh, shard_space: bool = True,
                               apply_sigmoid: bool = True,
                               interpret: bool = False) -> jax.Array:
    """`forward_folded_pallas` under a ('data','space') device mesh.

    The XLA stages (stem, enc2..dec2) stay GSPMD-auto-partitioned exactly
    like `forward_folded`; the two fused Pallas stages run inside
    `jax.shard_map` islands, because pallas_call has no GSPMD
    partitioning rule. Each island first fetches its spatial halo rows
    from the neighbouring shards with `lax.ppermute` (which zero-fills at
    the global edges — exactly the kernels' SAME-padding contract) and
    then invokes the kernels in `ext` mode with per-shard edge flags, so
    sharded outputs are BIT-identical to the single-device pallas path
    (same per-row math, f32 accumulation; `tests/test_pallas_conv.py`
    pins equality across mesh shapes on the virtual CPU mesh).

    Requires: x (B, H, W, 3) with B % mesh['data'] == 0 and
    H % (2 * mesh['space']) == 0 when `shard_space` (callers guard and
    fall back to the XLA pair path otherwise — pipelines/engine.py).
    Reference behavior parity: models/model_2.py:5-80; the reference has
    no parallelism of any kind (SURVEY §2.7).
    """
    from jax.sharding import PartitionSpec
    from unetdc_tpu.core.mesh import DATA_AXIS, SPACE_AXIS
    from unetdc_tpu.ops.pallas_conv import dec1_head, pair_conv_pool

    d = dilations
    assert d[0] == 1, "pair layout only implemented for undilated enc1"
    pa = fp["_pa"]
    dt = fp["enc1"]["k0"].dtype
    S = int(mesh.shape[SPACE_AXIS]) if shard_space else 1
    spec = PartitionSpec(DATA_AXIS,
                         SPACE_AXIS if (shard_space and S > 1) else None,
                         None, None)

    def halo(a, n):
        """Prepend/append n height rows from the spatial neighbours
        (zeros at the global edges, matching SAME padding)."""
        if S == 1:
            z = jnp.zeros((a.shape[0], n, *a.shape[2:]), a.dtype)
            return jnp.concatenate([z, a, z], axis=1)
        fwd = [(i, i + 1) for i in range(S - 1)]
        rev = [(i + 1, i) for i in range(S - 1)]
        top = lax.ppermute(a[:, -n:], SPACE_AXIS, fwd)
        bot = lax.ppermute(a[:, :n], SPACE_AXIS, rev)
        return jnp.concatenate([top, a, bot], axis=1)

    def edge_flags():
        if S == 1:
            return jnp.ones((2,), jnp.int32)
        i = lax.axis_index(SPACE_AXIS)
        return jnp.stack([(i == 0).astype(jnp.int32),
                          (i == S - 1).astype(jnp.int32)])

    def local_a(h):
        return pair_conv_pool(halo(h, 1), pa["wmid"], pa["wside"],
                              pa["bias"], interpret=interpret, ext=True)

    def local_b(dec2, enc1p):
        return dec1_head(halo(dec2, 1), halo(enc1p, 2), pa["head"],
                         sigmoid=apply_sigmoid, interpret=interpret,
                         ext=True, edge_flags=edge_flags())

    xp = _pair(x.astype(dt))
    h = _conv(xp, fp["enc1"]["k0"], fp["enc1"]["b0"])  # stem (XLA, GSPMD)
    enc1p, pooled = jax.shard_map(local_a, mesh=mesh, in_specs=spec,
                                  out_specs=(spec, spec),
                                  check_vma=False)(h)
    enc2 = _dc(pooled, fp["enc2"], d[1])
    enc3 = _dc(_pool(enc2), fp["enc3"], d[2])
    enc4 = _dc(_pool(enc3), fp["enc4"], d[3])
    bott = _dc(_pool(enc4), fp["bottleneck"], d[4])

    dec4 = _dc(jnp.concatenate([_upconv_t(bott, fp["upconv4"]), enc4], -1),
               fp["dec4"])
    dec3 = _dc(jnp.concatenate([_upconv_t(dec4, fp["upconv3"]), enc3], -1),
               fp["dec3"])
    dec2 = _dc(jnp.concatenate([_upconv_t(dec3, fp["upconv2"]), enc2], -1),
               fp["dec2"])
    out = jax.shard_map(local_b, mesh=mesh, in_specs=(spec, spec),
                        out_specs=spec, check_vma=False)(dec2, enc1p)
    b, hh, wp, no2 = out.shape
    return out.reshape(b, hh, wp * 2, no2 // 2)


def build_fast_params(folded_params: Dict[str, Any],
                      dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Precompute inference kernels from `fold_batchnorm(...)['params']`.

    Everything is cast to ``dtype`` once here (instead of per call) and the
    pair-structured kernels for enc1/dec1/out_conv are materialized. Upconv
    kernels are rewritten for their fast formulations:
    - upconv4..2: HWIO kernel for `lax.conv_transpose` (stride==kernel==2,
      no overlap, no spatial flip: out[2h+p,2w+q] = x[h,w] @ K[p,q]).
    - upconv1: (I, 2*2*O) matmul emitting the pair layout directly.
    """
    P = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                               folded_params)
    fp: Dict[str, Any] = {}

    def dc(name, in_groups=None):
        blk = P[name]
        k0, b0 = blk["conv0"]["kernel"], blk["conv0"]["bias"]
        k1, b1 = blk["conv1"]["kernel"], blk["conv1"]["bias"]
        if in_groups is not None:  # pair-packed block
            k0 = _pair_kernel(k0, in_groups)
            k1 = _pair_kernel(k1, [k1.shape[2]])
            b0 = np.concatenate([b0, b0])
            b1 = np.concatenate([b1, b1])
        return {"k0": k0, "b0": b0, "k1": k1, "b1": b1}

    fp["enc1"] = dc("enc1", in_groups=[P["enc1"]["conv0"]["kernel"].shape[2]])
    for name in ("enc2", "enc3", "enc4", "bottleneck",
                 "dec4", "dec3", "dec2"):
        fp[name] = dc(name)
    # dec1 consumes concat(pair(up1), pair(enc1)) with 64+64 input groups
    fp["dec1"] = dc("dec1", in_groups=[64, 64])

    for name in ("upconv4", "upconv3", "upconv2"):
        w = P[name]["kernel"]  # (I, O, 2, 2) torch ConvTranspose2d layout
        fp[name] = {"k": np.transpose(w, (2, 3, 0, 1)),  # (2,2,I,O) HWIO
                    "b": P[name]["bias"]}
    w1 = P["upconv1"]["kernel"]  # (I=128, O=64, 2, 2)
    i, o = w1.shape[0], w1.shape[1]
    # columns ordered (p, q*O + o): matmul then split p to rows, (q,o) stays
    fp["upconv1"] = {"k": np.transpose(w1, (0, 2, 3, 1)).reshape(i, 4 * o),
                     "b": np.concatenate([P["upconv1"]["bias"]] * 2)}

    oc = P["out_conv"]["kernel"]  # (1,1,64,out)
    n_out = oc.shape[3]
    ocp = np.zeros((1, 1, 128, 2 * n_out), np.float32)
    for q in range(2):
        ocp[0, 0, q * 64:(q + 1) * 64, q * n_out:(q + 1) * n_out] = oc[0, 0]
    fp["out_conv"] = {"k": ocp,
                      "b": np.concatenate([P["out_conv"]["bias"]] * 2)}

    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), fp)


def _conv(x, k, b, dil=1):
    y = lax.conv_general_dilated(
        x, k, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
        dimension_numbers=_DN, preferred_element_type=x.dtype)
    return jnp.maximum(y + b, 0)


def _dc(x, p, dil=1):
    return _conv(_conv(x, p["k0"], p["b0"], dil), p["k1"], p["b1"], dil)


def _pool(x):
    return lax.reduce_window(x, -jnp.inf if x.dtype == jnp.float32 else
                             jnp.finfo(x.dtype).min, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _pool_from_pair(xp):
    """2x2 max-pool consuming pair layout, emitting standard layout.

    Horizontal pool = max over the two phases of each pair (lane-half max);
    vertical pool = reduce over H. Output width = number of pairs.
    """
    c = xp.shape[-1] // 2
    m = jnp.maximum(xp[..., :c], xp[..., c:])
    return lax.reduce_window(m, jnp.finfo(m.dtype).min, lax.max,
                             (1, 2, 1, 1), (1, 2, 1, 1), "VALID")


def _upconv_t(x, p):
    y = lax.conv_transpose(x, p["k"], (2, 2), "VALID",
                           dimension_numbers=_DN,
                           preferred_element_type=x.dtype)
    return y + p["b"]


def _upconv1_pair(x, p):
    """Pixel-shuffle upconv emitting pair layout: (B,H,Wp,I)->(B,2H,Wp,2O).

    out[b, 2h+p, j, q*O+o] = sum_i x[b,h,j,i] K[i, (p,q,o)] — the matmul
    columns are ordered (p, q, o) so the (q,o) merge IS the pair pack; only
    the row interleave over p (sublane dim) remains.
    """
    b, h, w, i = x.shape
    y = x.reshape(-1, i) @ p["k"]           # (B*H*W, 2*2*O)
    y = y.reshape(b, h, w, 2, -1)           # (..., p, q*O+o)
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, 2 * h, w, -1)
    return y + p["b"]


def forward_folded(fp: Dict[str, Any], x: jax.Array,
                   dilations: Tuple[int, ...] = (1, 2, 4, 8, 16),
                   apply_sigmoid: bool = True) -> jax.Array:
    """TPU-fast folded forward; see module docstring.

    ``x``: (B, H, W, 3) float in [0,1]; H, W divisible by 16, W even.
    Returns (B, H, W, n_out) float32 probabilities (or logits).
    Requires dilations[0] == 1 (true for UNet and UNetDC).
    """
    d = dilations
    assert d[0] == 1, "pair layout only implemented for undilated enc1"
    dt = fp["enc1"]["k0"].dtype
    xp = _pair(x.astype(dt))
    enc1p = _dc(xp, fp["enc1"])                       # (B,H,W/2,128) pair
    enc2 = _dc(_pool_from_pair(enc1p), fp["enc2"], d[1])
    enc3 = _dc(_pool(enc2), fp["enc3"], d[2])
    enc4 = _dc(_pool(enc3), fp["enc4"], d[3])
    bott = _dc(_pool(enc4), fp["bottleneck"], d[4])

    dec4 = _dc(jnp.concatenate([_upconv_t(bott, fp["upconv4"]), enc4], -1),
               fp["dec4"])
    dec3 = _dc(jnp.concatenate([_upconv_t(dec4, fp["upconv3"]), enc3], -1),
               fp["dec3"])
    dec2 = _dc(jnp.concatenate([_upconv_t(dec3, fp["upconv2"]), enc2], -1),
               fp["dec2"])
    up1p = _upconv1_pair(dec2, fp["upconv1"])         # (B,H,W/2,128) pair
    dec1p = _dc(jnp.concatenate([up1p, enc1p], -1), fp["dec1"])

    out = lax.conv_general_dilated(dec1p, fp["out_conv"]["k"], (1, 1),
                                   "VALID", dimension_numbers=_DN,
                                   preferred_element_type=dt)
    out = _unpair(out + fp["out_conv"]["b"]).astype(jnp.float32)
    if apply_sigmoid:
        out = jax.nn.sigmoid(out)
    return out
