"""Exact Euclidean distance transform on TPU.

The separable squared-EDT decomposition (Felzenszwalb & Huttenlocher):
    1D pass:  d2[i] = min_j ( (i - j)^2 + f[j] )
applied first along columns, then along rows, yields the exact 2D squared
EDT. The classic CPU algorithm computes the lower envelope sequentially;
on TPU we evaluate the 1D pass as a MIN-PLUS MATRIX PRODUCT against the
constant (i-j)^2 matrix — O(n^3) VPU work (~134M ops at 512^2) that
vectorizes perfectly, instead of a sequential parabola stack.

This replaces scipy.ndimage.distance_transform_edt for the watershed
pipeline's device side (algorithms.py:152); results are exact (integer
squared distances), verified against scipy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _minplus_pass(f: jax.Array, axis_len: int) -> jax.Array:
    """d2[i, x] = min_j ((i-j)^2 + f[j, x]) for f of shape (axis_len, W).

    Evaluated in chunks of output rows to bound the (chunk, n, W)
    broadcast; all VPU adds/mins."""
    i = jnp.arange(axis_len, dtype=jnp.int32)
    d = (i[:, None] - i[None, :]).astype(jnp.float32) ** 2  # (n, n)
    # out[i, x] = min_j (d[i, j] + f[j, x]) — min-plus product
    chunk = max(1, min(axis_len, 4194304 // (axis_len * f.shape[1]) + 1, 64))
    outs = []
    for s in range(0, axis_len, chunk):
        e = min(s + chunk, axis_len)
        outs.append(jnp.min(d[s:e, :, None] + f[None, :, :], axis=1))
    return jnp.concatenate(outs, axis=0)


@jax.jit
def distance_transform_edt_sq(mask: jax.Array) -> jax.Array:
    """Exact SQUARED Euclidean distance of foreground pixels to the nearest
    background pixel (scipy.ndimage.distance_transform_edt semantics,
    squared). (H, W) bool/int -> (H, W) float32."""
    h, w = mask.shape
    big = jnp.float32((h + w) ** 2 + 1)
    f = jnp.where(mask.astype(bool), big, 0.0)
    # pass 1: along columns (axis 0)
    g = _minplus_pass(f, h)
    # pass 2: along rows (axis 1) — transpose, pass, transpose back
    d2 = _minplus_pass(g.T, w).T
    return jnp.minimum(d2, big)


def distance_transform_edt(mask) -> "jax.Array":
    """sqrt of the exact squared EDT (drop-in for scipy's function)."""
    return jnp.sqrt(distance_transform_edt_sq(jnp.asarray(mask)))
