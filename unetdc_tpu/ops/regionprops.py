"""Region properties via segment sums — the on-device replacement for
`skimage.measure.regionprops_table` (reference: quantify_droplets_batch.py:89,
properties=["label", "area", "equivalent_diameter", "centroid"]).

Everything is one batched `segment_sum` over the flattened label image:
area, centroid row/col sums; equivalent_diameter = sqrt(4*area/pi). Output
arrays have a static `max_labels` length with a validity count, keeping the
pipeline fully jittable; the host report layer slices [:n].
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_labels",))
def regionprops_table(labels: jax.Array, max_labels: int) -> Dict[str, jax.Array]:
    """Compute per-component properties of a labeled image.

    Args:
      labels: (H, W) int32, 0 = background, components 1..n (n <= max_labels).
      max_labels: static capacity; labels above it are dropped (callers check
        the count returned by `ops.label` against this).

    Returns dict of (max_labels,) arrays for labels 1..max_labels:
      'label', 'area', 'equivalent_diameter', 'centroid-0' (row),
      'centroid-1' (col). Entries with area == 0 are padding.
    """
    h, w = labels.shape
    if h * w * max(h - 1, w - 1) >= 2 ** 31:
        raise ValueError(
            f"labels image {h}x{w} exceeds the exact-int32 coordinate-sum "
            "bound (~1290px sides); use ops.connected_components."
            "quantify_mask, which switches to a hi/lo coordinate split")
    flat = labels.reshape(-1)
    cap = max_labels + 1

    # exact int32 sums (guarded above): centroid division
    # happens in f64 on the host report layer so CSV floats match skimage's
    # f64 computation bit-for-bit; f32 centroids provided for device users.
    rows = jnp.arange(h * w, dtype=jnp.int32) // w
    cols = jnp.arange(h * w, dtype=jnp.int32) % w
    feats = jnp.stack([jnp.ones_like(rows), rows, cols], axis=-1)  # (N, 3)
    sums = jax.ops.segment_sum(feats, flat, num_segments=cap)  # (cap, 3)

    area = sums[1:, 0]
    areaf = area.astype(jnp.float32)
    safe = jnp.maximum(areaf, 1.0)
    return {
        "label": jnp.arange(1, cap, dtype=jnp.int32),
        "area": area,
        "sum-0": sums[1:, 1],
        "sum-1": sums[1:, 2],
        "equivalent_diameter": jnp.sqrt(4.0 * areaf / jnp.pi),
        "centroid-0": sums[1:, 1].astype(jnp.float32) / safe,
        "centroid-1": sums[1:, 2].astype(jnp.float32) / safe,
    }


@functools.partial(jax.jit, static_argnames=("max_labels",))
def centroid_size_image(labels: jax.Array, max_labels: int) -> jax.Array:
    """Image with component size written at each (rounded) centroid pixel —
    the on-device `calculate_centroids_sizes_image` (algorithms.py:561-576,
    rounding centroid + 0.5 to int)."""
    props = regionprops_table(labels, max_labels)
    h, w = labels.shape
    area = props["area"]
    valid = area > 0
    cy = jnp.floor(props["centroid-0"] + 0.5).astype(jnp.int32)
    cx = jnp.floor(props["centroid-1"] + 0.5).astype(jnp.int32)
    cy = jnp.clip(cy, 0, h - 1)
    cx = jnp.clip(cx, 0, w - 1)
    flat_idx = jnp.where(valid, cy * w + cx, h * w)  # sentinel drops padding
    img = jnp.zeros(h * w + 1, jnp.float32)
    img = img.at[flat_idx].set(jnp.where(valid, area, 0.0))
    return img[:-1].reshape(h, w)
