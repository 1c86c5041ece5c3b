"""ROI contouring algorithms — device equivalents of the BlobInspector
contour family (algorithms.py:240-379).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from unetdc_tpu.ops.connected_components import (
    _propagate, label, component_areas)


@jax.jit
def contour_scan(image: jax.Array, threshold) -> jax.Array:
    """algorithms.py:244-276: from each of the 4 edges, clear pixels along
    each scanline until the first pixel above threshold. A pixel survives
    iff every directional prefix up to it contains something > threshold.

    Vectorized: cleared_from_direction = 'inclusive running OR of
    (img > thresh)' is still False."""
    above = image > threshold

    def cleared(along_axis, reverse):
        acc = jnp.cumsum(
            jnp.flip(above, along_axis) if reverse else above,
            axis=along_axis) > 0
        if reverse:
            acc = jnp.flip(acc, along_axis)
        return ~acc  # True where no above-threshold pixel yet (inclusive)

    c = (cleared(0, False) | cleared(0, True)
         | cleared(1, False) | cleared(1, True))
    return ~c


@functools.partial(jax.jit, static_argnames=("connectivity",))
def contour_spreading(image: jax.Array, threshold,
                      connectivity: int = 1) -> jax.Array:
    """algorithms.py:278-314 (contour_spreading_4 / _8): flood-fill
    background (<= threshold) from the borders; the mask keeps everything
    not reachable. Device: min-propagate a 0 seed from border background
    pixels across the background region."""
    h, w = image.shape
    bg = image <= threshold
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
    big = 1 << 30
    seed = jnp.where(border & bg, 0, big)
    reached = _propagate(seed, bg, big, connectivity, is_min=True)
    return ~(bg & (reached == 0))


def contour_spreading_4(image, threshold):
    return contour_spreading(image, threshold, connectivity=1)


def contour_spreading_8(image, threshold):
    return contour_spreading(image, threshold, connectivity=2)


@jax.jit
def contour_shrinking_box(image: jax.Array, threshold) -> jax.Array:
    """algorithms.py:316-352: grow the border background inward one box
    ring at a time — outerbox extends by (3x3-dilated outerbox & next
    ring's background); stop when a ring adds nothing."""
    h, w = image.shape
    bg = image <= threshold
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    ring0 = (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
    outer0 = ring0 & bg

    def dil3(m):
        p = jnp.pad(m, 1, constant_values=False)
        out = jnp.zeros_like(m)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                out = out | p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        return out

    def body(state):
        outer, step, _ = state
        # innerbox: everything outside the current shrunken box
        begin = step
        end_y, end_x = h - step, w - step
        outside = ((yy < begin) | (yy >= end_y)
                   | (xx < begin) | (xx >= end_x))
        inner = outside & bg
        grow = dil3(outer) & inner
        added = jnp.any(grow)
        return outer | grow, step + 1, added

    def cond(state):
        _, step, added = state
        return added & (w - step - step > 1) & (h - step - step > 1)

    outer, _, _ = lax.while_loop(cond, body, (outer0, jnp.int32(1),
                                              jnp.bool_(True)))
    return ~outer


@functools.partial(jax.jit, static_argnames=("num_segments",))
def remove_objects(contour_mask: jax.Array, min_size,
                   num_segments: int = 4096) -> jax.Array:
    """algorithms.py:354-367: drop 8-connected components smaller than
    min_size; returns boolean mask."""
    lab, _ = label(contour_mask, connectivity=2)
    areas = component_areas(lab, num_segments)
    keep = areas >= min_size
    keep = keep.at[0].set(False)
    return keep[jnp.clip(lab, 0, num_segments - 1)]


@jax.jit
def calculate_contours_centroid(mask: jax.Array):
    """algorithms.py:369-379: mean of True coords, image center fallback."""
    h, w = mask.shape
    m = mask > 0
    n = m.sum()
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    cy = jnp.where(n > 0, jnp.sum(jnp.where(m, yy, 0)) / jnp.maximum(n, 1),
                   h / 2)
    cx = jnp.where(n > 0, jnp.sum(jnp.where(m, xx, 0)) / jnp.maximum(n, 1),
                   w / 2)
    return cy.astype(jnp.float32), cx.astype(jnp.float32)
