"""Image resizing ops matching OpenCV semantics.

IMPORTANT BEHAVIORAL NOTE (verified empirically against cv2): every
`cv2.resize` call in the reference passes the interpolation flag as the THIRD
POSITIONAL argument, which is `dst`, not `interpolation` — e.g.
`cv2.resize(im, (512,512), cv2.INTER_AREA)` (quantify_droplets_batch.py:44)
and `cv2.resize(mask512, (ow,oh), cv2.INTER_NEAREST)` (…:57). OpenCV ignores
the misplaced flag and uses the default INTER_LINEAR in *all* of these call
sites. The golden outputs were therefore produced with bilinear resizing
everywhere. This module provides:

- `resize_linear`        — cv2 INTER_LINEAR semantics (half-pixel centers,
                           edge clamp, no antialiasing). The parity op.
- `resize_mask_linear_round` — bilinear resize of a 0/1 mask + round, which
                           is exactly what the reference's buggy "nearest"
                           mask upscale computes on uint8 masks.
- `resize_nearest`       — true cv2 INTER_NEAREST (what the reference
                           *intended*), provided for completeness.
- `resize_area`          — true cv2 INTER_AREA box-average downscale
                           (intended at quantify_droplets_batch.py:44).

Linear/area resizes are implemented as two per-axis weight-matrix matmuls —
on TPU that is two MXU contractions instead of gather chains, and the weight
matrices are compile-time constants for static shapes.
"""

from __future__ import annotations

import functools
import numpy as np

import jax
import jax.numpy as jnp


def _linear_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear weight matrix, cv2 INTER_LINEAR convention:
    src_x = (dst_x + 0.5) * src/dst - 0.5, clamped to edges."""
    w = np.zeros((dst, src), np.float32)
    scale = src / dst
    for d in range(dst):
        sx = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        frac = sx - x0
        # cv2 quantizes interpolation weights to 11-bit fixed point
        # (INTER_RESIZE_COEF_BITS); emulate for near-bit parity.
        fq = np.rint(frac * 2048.0) / 2048.0
        x0c = min(max(x0, 0), src - 1)
        x1c = min(max(x0 + 1, 0), src - 1)
        w[d, x0c] += 1.0 - fq
        w[d, x1c] += fq
    return w


def _area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) box-average weight matrix (cv2 INTER_AREA downscale):
    dst pixel d covers src span [d*s, (d+1)*s), weights = fractional overlap."""
    w = np.zeros((dst, src), np.float32)
    s = src / dst
    for d in range(dst):
        lo, hi = d * s, (d + 1) * s
        i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
        for i in range(i0, min(i1, src)):
            overlap = min(hi, i + 1) - max(lo, i)
            if overlap > 0:
                w[d, i] = overlap / s
    return w


def _nearest_index(src: int, dst: int) -> np.ndarray:
    """cv2 INTER_NEAREST source index per dst pixel: floor(d * src/dst)."""
    scale = src / dst
    idx = np.floor(np.arange(dst) * scale).astype(np.int32)
    return np.clip(idx, 0, src - 1)


def _apply_sep(img: jax.Array, wy: np.ndarray, wx: np.ndarray) -> jax.Array:
    """Apply per-axis weight matrices to (H, W) or (H, W, C) image."""
    wy = jnp.asarray(wy)
    wx = jnp.asarray(wx)
    x = img.astype(jnp.float32)
    if x.ndim == 2:
        return wy @ x @ wx.T
    # (H, W, C): contract H then W
    y = jnp.einsum("dh,hwc->dwc", wy, x)
    return jnp.einsum("ew,dwc->dec", wx, y)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_linear(img: jax.Array, out_hw) -> jax.Array:
    """cv2 INTER_LINEAR resize to (out_h, out_w); float output (no rounding)."""
    oh, ow = out_hw
    h, w = img.shape[:2]
    return _apply_sep(img, _linear_weights(h, oh), _linear_weights(w, ow))


def resize_linear_u8(img: jax.Array, out_hw) -> jax.Array:
    """INTER_LINEAR with uint8 output. cv2 rounds half-up in fixed point
    ((acc + 2^21) >> 22); emulate with floor(v + 0.5). Residual ±1 diffs vs
    cv2 only at exact fixed-point rounding ties (float32 cannot represent
    the 2^-22 grid)."""
    y = resize_linear(img, tuple(out_hw))
    return jnp.clip(jnp.floor(y + 0.5), 0, 255).astype(jnp.uint8)


def _coeffs_fixed(src: int, dst: int):
    """cv2 INTER_LINEAR source indices + 11-bit fixed-point coefficients."""
    x0s = np.empty(dst, np.int32)
    a1 = np.empty(dst, np.int32)
    scale = src / dst
    for d in range(dst):
        sx = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        a1[d] = int(np.rint((sx - x0) * 2048.0))
        x0s[d] = x0
    x0c = np.clip(x0s, 0, src - 1)
    x1c = np.clip(x0s + 1, 0, src - 1)
    return x0c, x1c, 2048 - a1, a1


def _select_matrix(idx: np.ndarray, src: int) -> np.ndarray:
    """(src, len(idx)) one-hot selection matrix: (x @ M)[d] = x[idx[d]]."""
    m = np.zeros((src, len(idx)), np.float32)
    m[idx, np.arange(len(idx))] = 1.0
    return m


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_linear_u8_cv2exact(img: jax.Array, out_hw) -> jax.Array:
    """Emulation of this cv2 build's uint8 INTER_LINEAR kernel: 11-bit
    fixed-point coefficients with the SIMD path's intermediate truncations,
    verified bit-exact on the paths the pipeline relies on (binary 0/1
    masks at any size, and resizes to 512); other uint8 content/sizes can
    differ from cv2 by ±1 on a small fraction of pixels
        row  = a0*s[x0] + a1*s[x1]
        out  = (((b0*(row0>>4))>>16) + ((b1*(row1>>4))>>16) + 2) >> 2.
    2D uint8 input only. This is the op the pipeline uses to resize predicted
    masks back to original size (quantify_droplets_batch.py:57), where
    per-pixel parity decides droplet counts.

    TPU note: the index selections run as one-hot MXU matmuls rather than
    gathers (random-access gathers over a 512-wide lane axis are slow on
    TPU); all selected values are < 2^20 so float32 matmuls are exact, and
    the fixed-point truncation arithmetic stays in int32 elementwise ops.
    """
    oh, ow = out_hw
    h, w = img.shape
    if (oh, ow) == (h, w):
        # scale-1 INTER_LINEAR is exactly identity in cv2's fixed-point
        # path (weight 2048 = 2^11, (2048*p*2048)>>22 == p). Shortcut it:
        # XLA elides the emulation standalone, but fused into the megastep
        # the dead 512->512 resize measured +5 ms/batch-8.
        return img
    x0c, x1c, ax0, ax1 = _coeffs_fixed(w, ow)
    y0c, y1c, by0, by1 = _coeffs_fixed(h, oh)
    sf = img.astype(jnp.float32)
    gx0 = jnp.asarray(_select_matrix(x0c, w))
    gx1 = jnp.asarray(_select_matrix(x1c, w))
    # row = a0*s[:, x0] + a1*s[:, x1]   (exact: products < 2^19)
    row = (jnp.dot(sf, gx0, preferred_element_type=jnp.float32)
           .astype(jnp.int32) * ax0[None, :]
           + jnp.dot(sf, gx1, preferred_element_type=jnp.float32)
           .astype(jnp.int32) * ax1[None, :])          # (h, ow) int32 < 2^20
    py0 = jnp.asarray(_select_matrix(y0c, h))
    py1 = jnp.asarray(_select_matrix(y1c, h))
    rowf = row.astype(jnp.float32)                      # < 2^20: f32 exact
    r0 = jnp.dot(py0.T, rowf,
                 preferred_element_type=jnp.float32).astype(jnp.int32) >> 4
    r1 = jnp.dot(py1.T, rowf,
                 preferred_element_type=jnp.float32).astype(jnp.int32) >> 4
    out = (((by0[:, None] * r0) >> 16) + ((by1[:, None] * r1) >> 16) + 2) >> 2
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_mask_linear_round(mask: jax.Array, out_hw) -> jax.Array:
    """Resize a 0/1 mask the way the reference actually does it — uint8
    bilinear through cv2's fixed-point kernel (see module docstring).
    Bit-exact with the reference mask path; returns 0/1 uint8."""
    return resize_linear_u8_cv2exact(mask.astype(jnp.uint8), tuple(out_hw))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_nearest(img: jax.Array, out_hw) -> jax.Array:
    """True cv2 INTER_NEAREST resize."""
    oh, ow = out_hw
    h, w = img.shape[:2]
    iy = jnp.asarray(_nearest_index(h, oh))
    ix = jnp.asarray(_nearest_index(w, ow))
    return img[iy][:, ix]


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_area(img: jax.Array, out_hw) -> jax.Array:
    """True cv2 INTER_AREA (box-average) downscale; for upscale factors this
    falls back to bilinear like OpenCV does."""
    oh, ow = out_hw
    h, w = img.shape[:2]
    wy = _area_weights(h, oh) if oh <= h else _linear_weights(h, oh)
    wx = _area_weights(w, ow) if ow <= w else _linear_weights(w, ow)
    return _apply_sep(img, wy, wx)
