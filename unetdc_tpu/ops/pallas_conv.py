"""Fused pair-layout convolution kernels (Mosaic/Pallas) for the
thin-channel UNet stages.

Why (measured on TPU v5e, batch 8, 512x512, bf16 — see ROUND3.md forward
roofline): XLA pads the channel (lane) dim to 128, so the pair-packed
64-channel stages (models/unet_fast.py) execute 2x their useful FLOPs —
enc1.conv1 runs at 2.52 ms and the dec1 double conv at 6.54 ms, 36% useful
MFU, and they have been the flat bottleneck of the inference forward for
two rounds. The adjacent glue ops are HBM-bound far off their roofline:
pool1 1.77 ms (4x floor), upconv1 1.03 ms (2x), out_conv+sigmoid 1.31 ms
(4x).

The kernels here restructure that work so the MXU sees dense 128-lane
matmuls and the glue never touches HBM:

- In pair layout a 3x3 conv splits per kernel row ky into
  * a MID matmul: out_pair[j] += x_pair[j] @ Wmid[ky], where Wmid is
    (2cin, 2cout) and 100% dense — output phase q=0 consumes x phases
    (p0,p1) via taps (dx=0,+1) and q=1 via (dx=-1,0), covering 4 of the 6
    (q,dx) combinations at exec == useful FLOPs;
  * a SIDE matmul for the 2 remaining combinations ((q0,dx=-1) from pair
    j-1 phase1, (q1,dx=+1) from pair j+1 phase0): t[j] = x_pair[j] @
    Wside[ky] with Wside anti-block-diagonal (half dense), then
    out_pair[j] += [t[j-1][:, :cout] ; t[j+1][:, cout:]] — a pair-column
    shift + lane select on the f32 accumulator, NO input relayout.
  Executed/useful FLOPs drop from XLA's 2x to 4/3.
- `pair_conv_pool` fuses enc1.conv1 with the 2x2 max-pool: the pool is a
  lane-half max + row-pair max on the VMEM-resident conv output, so the
  separate 1.77 ms reduce_window pass (and its 134 MB re-read) disappears.
- `dec1_head` fuses upconv1 -> concat -> dec1 double conv -> out_conv ->
  sigmoid: upconv1's pixel-shuffle matmul runs on the DMA'd dec2 tile
  inside VMEM (its 134 MB HBM round-trip disappears), the concat never
  materializes (each input group gets its own mid/side matmuls summed
  into one accumulator), conv0's output stays in VMEM for conv1, and the
  1x1 out_conv + sigmoid emit probabilities directly.

LAYOUT: the kernels compute in logical (H, Wp, B, C) order — the SAME
physical bytes XLA's TPU convs put their activations in (their chosen
layout {3,0,2,1} on (B,H,W,C) is minor-to-major C,B,W,H, i.e. batch in
sublanes, channels in lanes). The public entry points take/return the
usual (B, H, Wp, C) arrays and wrap the kernel in jnp.transposes, which
XLA folds into bitcasts against its own layout choice. The first version
of these kernels used (B, H, Wp, C) blocks directly and LOST the full-
forward A/B (24.3 vs 22.6 ms) despite winning both isolated A/Bs
(1.90 vs 2.34, 3.46 vs 5.07): XLA inserted 1.17 GB of layout-conversion
copies at the pallas boundaries (measured via compiled-HLO copy bytes:
1619 MB vs 449 MB baseline), ~2.9 ms of pure HBM traffic.

Both kernels stream row tiles with double-buffered halo DMA: three async
copies per input per grid step (body rows + one/two halo rows each side,
clamped at the image edge and zero-repaired in VMEM), started one step
ahead so the copy of tile t+1 overlaps the matmuls of tile t. A row tile
now spans the whole batch (batch lives in sublanes), so tiles are a few
rows tall. Accumulation is f32 (more accurate than the bf16-accumulated
XLA path it replaces); outputs round to the input dtype exactly once.

Edge semantics match lax.conv SAME padding: halo rows/pair-columns beyond
the image are ZERO — including conv1's view of conv0 (h rows outside the
image are zeroed explicitly, not conv0-of-zero-input, which would be
relu(bias)) and upconv1 rows outside the image (zeroed after the bias
add).

Reference behavior parity: models/model_2.py:40-54 (DoubleConv), :62-66
(up + skip concat), :80 (1x1 out conv + sigmoid-in-forward). The
reference has no analogue of these kernels — they are TPU-specific
scheduling of the same multiply-accumulates; `tests/test_pallas_conv.py`
pins agreement in interpret mode against the XLA pair path.

GSPMD note: pallas_call has no auto-partitioning rule. Single-chip
callers use the kernels directly; under a mesh the kernels run inside
`jax.shard_map` islands (models/unet_fast.py::forward_folded_pallas_spmd)
with `ext=True`: the caller concatenates halo rows fetched from the
spatial neighbours via `lax.ppermute` (zero-filled at the global edges,
matching SAME padding), the DMA clamps/zero-repairs are skipped because
every needed row exists in the extended input, and the edge-row masks
(which zero conv contributions that must not exist outside the GLOBAL
image) condition on per-shard `edge_flags` [is_top, is_bottom] read from
SMEM instead of on the local tile index alone.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MB physical VMEM


# ---------------------------------------------------------------------------
# weight builders (numpy, run once at engine build time)
# ---------------------------------------------------------------------------

def pair_mid_side(W: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split an HWIO (3,3,cin,cout) kernel into the pair-layout MID and
    SIDE matmul weights, each (3, 2*cin, 2*cout) indexed by ky.

    MID (dense): rows p0 (input col 2j) feed q0 via W[ky,dx=0] and q1 via
    W[ky,dx=-1]; rows p1 (col 2j+1) feed q0 via W[ky,dx=+1] and q1 via
    W[ky,dx=0].

    SIDE (anti-block-diagonal): t[j][:cout] = x[j] p1 @ W[ky,dx=-1] is the
    contribution of col 2j+1 to output col 2(j+1) (consumed at j+1);
    t[j][cout:] = x[j] p0 @ W[ky,dx=+1] contributes col 2j to output col
    2(j-1)+1 (consumed at j-1).
    """
    kh, kw, cin, cout = W.shape
    assert kh == 3 and kw == 3
    mid = np.zeros((3, 2 * cin, 2 * cout), W.dtype)
    side = np.zeros((3, 2 * cin, 2 * cout), W.dtype)
    for ky in range(3):
        mid[ky, :cin, :cout] = W[ky, 1]        # p0 -> q0, dx=0
        mid[ky, :cin, cout:] = W[ky, 0]        # p0 -> q1, dx=-1
        mid[ky, cin:, :cout] = W[ky, 2]        # p1 -> q0, dx=+1
        mid[ky, cin:, cout:] = W[ky, 1]        # p1 -> q1, dx=0
        side[ky, cin:, :cout] = W[ky, 0]       # p1 of j-1 -> q0, dx=-1
        side[ky, :cin, cout:] = W[ky, 2]       # p0 of j+1 -> q1, dx=+1
    return mid, side


def _side_add(acc: jax.Array, tac: jax.Array, cout: int) -> jax.Array:
    """acc[j] += [t[j-1][:, :cout] ; t[j+1][:, cout:]] with zero edges,
    j = the pair-column dim 1 of (R, Wp, B, 2cout).

    One full-lane pair-column shift each way + one lane-iota select on
    the f32 accumulator — the only non-matmul work the SIDE decomposition
    costs. (Full-lane shifts then select: a lane-sliced pad lowers to a
    tpu.concatenate with mismatched lane offsets, which Mosaic rejects.)
    """
    pad = ((0, 0), (1, 0), (0, 0), (0, 0))
    tL = jnp.pad(tac[:, :-1], pad)
    tR = jnp.pad(tac[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    lane = lax.broadcasted_iota(jnp.int32, tac.shape, 3)
    return acc + jnp.where(lane < cout, tL, tR)


def _row_mask(x: jax.Array, first_valid, end_valid) -> jax.Array:
    """Zero rows of (R, Wp, B, C) outside [first_valid, end_valid)."""
    r = lax.broadcasted_iota(jnp.int32, (x.shape[0], 1, 1, 1), 0)
    return jnp.where((r >= first_valid) & (r < end_valid), x, 0)


def _halo_dmas(src, buf, sems, row0, body, halo, nrows, slot, base):
    """Three async copies loading rows [row0-halo, row0+body+halo) of
    src (H, Wp, B, C) into buf[slot], clamped to [0, nrows);
    sems[slot, base:base+3]. Out-of-image rows must be zero-repaired by
    the caller AFTER wait."""
    top = pltpu.make_async_copy(
        src.at[pl.ds(jnp.maximum(row0 - halo, 0), halo)],
        buf.at[slot, 0:halo], sems.at[slot, base])
    mid = pltpu.make_async_copy(
        src.at[pl.ds(row0, body)],
        buf.at[slot, halo:halo + body], sems.at[slot, base + 1])
    bot = pltpu.make_async_copy(
        src.at[pl.ds(jnp.minimum(row0 + body, nrows - halo), halo)],
        buf.at[slot, halo + body:2 * halo + body],
        sems.at[slot, base + 2])
    return top, mid, bot


def _matmuls(xv, w_ref, R, M, C):
    """sum_ky xv[ky:ky+R] @ w_ref[ky], f32 accumulation; xv (R+2*, Wp, B, C)."""
    acc = None
    for ky in range(3):
        m = jnp.dot(xv[ky:ky + R].reshape(M, C), w_ref[ky],
                    preferred_element_type=jnp.float32)
        acc = m if acc is None else acc + m
    return acc


# ---------------------------------------------------------------------------
# kernel A: pair conv (cin==cout) fused with the trailing 2x2 max pool
# ---------------------------------------------------------------------------

def _kernel_a(x_hbm, wmid_ref, wside_ref, bias_ref, y_ref, p_ref,
              xbuf, sems, *, T: int, H: int, Wp: int, B: int, C2: int,
              nT: int, ext: bool = False):
    t = pl.program_id(0)

    def dmas(tt, slot):
        # ext: x_hbm carries real halo rows (H+2 total; image row r is
        # src row r+1), so the loads never clamp and no repair is needed
        return _halo_dmas(x_hbm, xbuf, sems, tt * T + (1 if ext else 0),
                          T, 1, H + (2 if ext else 0), slot, 0)

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for d in dmas(t, slot):
            d.start()

    @pl.when(t + 1 < nT)
    def _():
        for d in dmas(t + 1, jax.lax.rem(t + 1, 2)):
            d.start()

    for d in dmas(t, slot):
        d.wait()

    if not ext:
        zrow = jnp.zeros((1, Wp, B, C2), xbuf.dtype)

        @pl.when(t == 0)
        def _():
            xbuf[slot, 0:1] = zrow

        @pl.when(t == nT - 1)
        def _():
            xbuf[slot, T + 1:T + 2] = zrow

    xv = xbuf[slot]
    M = T * Wp * B
    acc = _matmuls(xv, wmid_ref, T, M, C2).reshape(T, Wp, B, C2)
    tac = _matmuls(xv, wside_ref, T, M, C2).reshape(T, Wp, B, C2)
    c = C2 // 2
    acc = _side_add(acc, tac, c)
    y = jnp.maximum(acc + bias_ref[0], 0.0).astype(y_ref.dtype)
    y_ref[:] = y
    ph = jnp.maximum(y[..., :c], y[..., c:]).reshape(T // 2, 2, Wp, B, c)
    p_ref[:] = jnp.maximum(ph[:, 0], ph[:, 1])


def _pick_tile(H: int, budget_rows: int) -> int:
    """Largest even T <= budget_rows dividing H (H is divisible by 16)."""
    t = min(budget_rows, H)
    while t > 2 and (H % t or t % 2):
        t -= 1
    return max(t, 2)


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "ext"))
def pair_conv_pool(x: jax.Array, wmid: jax.Array, wside: jax.Array,
                   bias: jax.Array, *, tile: int = 16,
                   interpret: bool = False, ext: bool = False
                   ) -> Tuple[jax.Array, jax.Array]:
    """ReLU(pair-conv(x)) and its 2x2 max pool in one VMEM pass.

    x: (B, H, Wp, 2c) pair-packed bf16/f32; wmid/wside: (3, 2c, 2c) from
    `pair_mid_side`; bias: (1, 2c) f32 (pair-duplicated).
    Returns (y (B, H, Wp, 2c), pool (B, H//2, Wp, c)).

    ext=True (shard_map spatial sharding): x is (B, H+2, Wp, 2c) with one
    REAL halo row prepended/appended (neighbour rows via ppermute, zeros
    at the global edges); outputs still cover the H body rows.
    """
    B, Hx, Wp, C2 = x.shape
    H = Hx - 2 if ext else Hx
    T = _pick_tile(H, tile)
    nT = H // T
    xt = jnp.transpose(x, (1, 2, 0, 3))  # bitcast vs XLA's conv layout
    kern = functools.partial(_kernel_a, T=T, H=H, Wp=Wp, B=B, C2=C2,
                             nT=nT, ext=ext)
    y, p = pl.pallas_call(
        kern,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, Wp, B, C2), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T // 2, Wp, B, C2 // 2), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Wp, B, C2), x.dtype),
            jax.ShapeDtypeStruct((H // 2, Wp, B, C2 // 2), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, T + 2, Wp, B, C2), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, wmid, wside, bias)
    return jnp.transpose(y, (2, 0, 1, 3)), jnp.transpose(p, (2, 0, 1, 3))


# ---------------------------------------------------------------------------
# kernel B: upconv1 -> concat -> dec1 double conv -> out_conv -> sigmoid
# ---------------------------------------------------------------------------

def _kernel_b(dec2_hbm, enc_hbm, upk_ref, upb_ref, wm_up_ref, ws_up_ref,
              wm_e_ref, ws_e_ref, b0_ref, wm1_ref, ws1_ref, b1_ref,
              ock_ref, ocb_ref, flags_ref, o_ref, dbuf, ebuf, sems, *,
              T: int, H: int, Wp: int, B: int, C2: int, NO2: int, nT: int,
              sigmoid: bool, ext: bool = False):
    t = pl.program_id(0)
    Th = T // 2
    H2 = H // 2

    def dmas(tt, slot):
        # ext: sources carry REAL halo rows (dec2: H2+2, enc: H+4), so
        # the loads never clamp and the enc zero-repair is skipped
        return (_halo_dmas(dec2_hbm, dbuf, sems,
                           tt * Th + (1 if ext else 0), Th, 1,
                           H2 + (2 if ext else 0), slot, 0)
                + _halo_dmas(enc_hbm, ebuf, sems,
                             tt * T + (2 if ext else 0), T, 2,
                             H + (4 if ext else 0), slot, 3))

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for d in dmas(t, slot):
            d.start()

    @pl.when(t + 1 < nT)
    def _():
        for d in dmas(t + 1, jax.lax.rem(t + 1, 2)):
            d.start()

    for d in dmas(t, slot):
        d.wait()

    if not ext:
        # zero-repair the enc halo rows at the image edges (dec2's zero
        # rows are handled by the up-row mask below, enc's must be
        # explicit); in ext mode the halo rows arrive real from the
        # neighbour shard (ppermute zero-fills them at the global edges)
        zrows = jnp.zeros((2, Wp, B, C2), ebuf.dtype)

        @pl.when(t == 0)
        def _():
            ebuf[slot, 0:2] = zrows

        @pl.when(t == nT - 1)
        def _():
            ebuf[slot, T + 2:T + 4] = zrows

    # edge-row masks fire only on tiles touching the GLOBAL image
    # edges: always true single-device (flags [1,1]); under shard_map
    # only the first/last spatial shard set them
    top0 = (t == 0) & (flags_ref[0] != 0)
    bot0 = (t == nT - 1) & (flags_ref[1] != 0)

    # upconv1 on the dec2 tile: pixel-shuffle matmul, rows interleave p
    dv = dbuf[slot]  # (Th+2, Wp, B, C2)
    mat = jnp.dot(dv.reshape((Th + 2) * Wp * B, C2), upk_ref[:],
                  preferred_element_type=jnp.float32) + upb_ref[0]
    up = jnp.transpose(mat.reshape(Th + 2, Wp, B, 2, C2), (0, 3, 1, 2, 4))
    up = up.reshape(T + 4, Wp, B, C2)
    # rows of `up` are global rows [t*T-2, t*T+T+2): zero outside [0, H)
    up = _row_mask(up, jnp.where(top0, 2, 0),
                   jnp.where(bot0, T + 2, T + 4))
    upv = up.astype(ebuf.dtype)
    ev = ebuf[slot]

    # conv0 over T+2 rows (conv1 needs a one-row halo of h)
    R0 = T + 2
    M0 = R0 * Wp * B
    acc = (_matmuls(upv, wm_up_ref, R0, M0, C2)
           + _matmuls(ev, wm_e_ref, R0, M0, C2)).reshape(R0, Wp, B, C2)
    tac = (_matmuls(upv, ws_up_ref, R0, M0, C2)
           + _matmuls(ev, ws_e_ref, R0, M0, C2)).reshape(R0, Wp, B, C2)
    c = C2 // 2
    acc = _side_add(acc, tac, c)
    h = jnp.maximum(acc + b0_ref[0], 0.0)
    # h rows outside the image are conv1's ZERO padding, not conv0(0)
    h = _row_mask(h, jnp.where(top0, 1, 0),
                  jnp.where(bot0, T + 1, T + 2))
    hv = h.astype(ebuf.dtype)

    # conv1 over T rows
    M1 = T * Wp * B
    acc1 = _matmuls(hv, wm1_ref, T, M1, C2).reshape(T, Wp, B, C2)
    tac1 = _matmuls(hv, ws1_ref, T, M1, C2).reshape(T, Wp, B, C2)
    acc1 = _side_add(acc1, tac1, c)
    d1 = jnp.maximum(acc1 + b1_ref[0], 0.0).astype(ebuf.dtype)

    # 1x1 out conv (+ sigmoid)
    o = jnp.dot(d1.reshape(M1, C2), ock_ref[:],
                preferred_element_type=jnp.float32) + ocb_ref[0]
    if sigmoid:
        o = jax.nn.sigmoid(o)
    o_ref[:] = o.reshape(T, Wp, B, NO2)


@functools.partial(jax.jit,
                   static_argnames=("tile", "sigmoid", "interpret", "ext"))
def dec1_head(dec2: jax.Array, enc1p: jax.Array, w: Dict[str, jax.Array],
              *, tile: int = 8, sigmoid: bool = True,
              interpret: bool = False, ext: bool = False,
              edge_flags: jax.Array | None = None) -> jax.Array:
    """upconv1 + concat + dec1 double conv + out_conv (+ sigmoid), fused.

    dec2: (B, H/2, Wp, 2c); enc1p: (B, H, Wp, 2c) pair-packed.
    w: dict with upk (2c, 2*2c) pixel-shuffle matmul [(p,(q,o)) columns],
    upb (1, 2*2c) f32, per-group mid/side (3, 2c, 2c), biases (1, 2c)
    f32, ock (2c, 2*n_out), ocb (1, 2*n_out) f32.
    Returns probabilities/logits (B, H, Wp, 2*n_out) f32 — reshape
    (B, H, W, n_out) outside.

    ext=True (shard_map spatial sharding): dec2 is (B, H/2+2, Wp, 2c)
    and enc1p (B, H+4, Wp, 2c) with REAL halo rows (ppermute; zeros at
    the global edges), and `edge_flags` is an int32 (2,) [is_top,
    is_bottom] marking whether this shard touches the global image
    edges (the edge-row masks fire only there).
    """
    B, H2x, Wp, C2 = dec2.shape
    H2 = H2x - 2 if ext else H2x
    H = H2 * 2
    NO2 = w["ock"].shape[1]
    T = _pick_tile(H, tile)
    nT = H // T
    if edge_flags is None:
        edge_flags = jnp.ones((2,), jnp.int32)
    d2t = jnp.transpose(dec2, (1, 2, 0, 3))   # bitcasts vs conv layout
    e1t = jnp.transpose(enc1p, (1, 2, 0, 3))
    kern = functools.partial(_kernel_b, T=T, H=H, Wp=Wp, B=B, C2=C2,
                             NO2=NO2, nT=nT, sigmoid=sigmoid, ext=ext)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        kern,
        grid=(nT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)] + [vm] * 12
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((T, Wp, B, NO2), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Wp, B, NO2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, T // 2 + 2, Wp, B, C2), dec2.dtype),
            pltpu.VMEM((2, T + 4, Wp, B, C2), enc1p.dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(d2t, e1t, w["upk"], w["upb"], w["wm_up"], w["ws_up"], w["wm_e"],
      w["ws_e"], w["b0"], w["wm1"], w["ws1"], w["b1"], w["ock"], w["ocb"],
      edge_flags.astype(jnp.int32))
    return jnp.transpose(o, (2, 0, 1, 3))