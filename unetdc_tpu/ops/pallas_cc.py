"""Pallas TPU kernel for connected-component min/max propagation.

The XLA version of the propagation loop (connected_components._propagate)
round-trips every sweep through HBM: ~36 shifted min/and ops per sweep over
(B, H, W) int32 materialize >1 GB of HBM traffic per sweep and dominate the
quantification megastep (~0.2 s/batch measured on v5e).

Here each image stays resident in VMEM (512x512 int32 = 1 MB << 16 MB) for
the *entire* while_loop: HBM sees one read of the mask and one write of the
result; all sweeps run at VMEM bandwidth on the VPU. Shifts are
`pltpu.roll` + edge masking (static shift amounts), the segmented scans are
the same Hillis-Steele doubling as the XLA path, and convergence is a
per-image `lax.while_loop`.

Grid = batch; one program per image. Non-TPU backends fall back to the XLA
implementation (tests run the kernel in interpreter mode for correctness).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIAGONALS = ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _roll_shift(x, d, axis, fill, pos_ids, n):
    """shifted[i] = x[i + d] along `axis`, `fill` outside (static d)."""
    if d == 0:
        return x
    rolled = pltpu.roll(x, -d % n, axis)
    if d > 0:
        oob = pos_ids >= (n - d)
    else:
        oob = pos_ids < (-d)
    return jnp.where(oob, fill, rolled)


def _kernel(mask_ref, init_ref, out_ref, *, connectivity, is_min, fill,
            max_scan):
    h, w = mask_ref.shape[-2:]
    fg = mask_ref[0] != 0
    init = init_ref[0]
    comb = jnp.minimum if is_min else jnp.maximum
    fillv = jnp.asarray(fill, init.dtype)
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def seg_scan(v, axis, reverse):
        ids = cols if axis == 1 else rows
        n = w if axis == 1 else h
        # flags kept as int32: Mosaic cannot roll i1 vectors
        p = fg.astype(jnp.int32)
        d = 1
        sgn = 1 if reverse else -1
        while d < min(n, max_scan):
            vs = _roll_shift(v, sgn * d, axis, fillv, ids, n)
            ps = _roll_shift(p, sgn * d, axis, jnp.int32(0), ids, n)
            v = jnp.where(p > 0, comb(v, vs), v)
            p = p * ps
            d *= 2
        return v

    def sweep(lab):
        v = jnp.where(fg, lab, fillv)
        for axis in (1, 0):
            v = seg_scan(v, axis, False)
            v = seg_scan(v, axis, True)
        if connectivity == 2:
            m = jnp.where(fg, v, fillv)
            for dy, dx in _DIAGONALS:
                s = _roll_shift(m, dy, 0, fillv, rows, h)
                s = _roll_shift(s, dx, 1, fillv, cols, w)
                v = comb(v, s)
        return jnp.where(fg, v, lab)

    # (fg itself is only ever used in selects, never rolled as i1)

    def body(state):
        lab, _ = state
        new = sweep(lab)
        return new, jnp.any(new != lab)

    lab, _ = lax.while_loop(lambda s: s[1], body, (init, jnp.bool_(True)))
    out_ref[0] = lab


@functools.partial(jax.jit,
                   static_argnames=("connectivity", "is_min", "fill",
                                    "max_scan"))
def propagate_pallas(init: jax.Array, fg: jax.Array, fill: int,
                     connectivity: int, is_min: bool,
                     max_scan: int = 0) -> jax.Array:
    """Batched propagation on TPU via Pallas; (B, H, W) int32 init +
    (B, H, W) mask -> converged labels. Interpreted off-TPU.

    max_scan caps the doubling distance per sweep (information still
    propagates arbitrarily far — the while_loop just runs more sweeps);
    smaller caps keep Mosaic's roll lowering cheap on large images."""
    b, h, w = init.shape
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _kernel, connectivity=connectivity, is_min=is_min, fill=fill,
        max_scan=max_scan if max_scan > 0 else max(h, w))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), init.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fg.astype(jnp.int32), init)
