"""Connected-component labeling on TPU.

Replaces the reference's host-side `skimage.measure.label`
(quantify_droplets_batch.py:82,86; algorithms.py:174) with a fully jittable
device algorithm, so the mask->droplet-table stage never leaves HBM.

Algorithm: min-label propagation with pointer jumping.
  1. Every pixel starts labeled with its own flat raster index.
  2. Each iteration, every foreground pixel takes the min label over itself
     and its foreground neighbors (4- or 8-connectivity) — pure VPU shifts.
  3. Two pointer-jumping steps (L <- L[L], a flat gather) per iteration
     collapse label chains toward component roots, giving roughly
     O(log diameter) convergence instead of O(diameter).
  4. `lax.while_loop` runs until a fixed point.

The component root is the *minimum* flat index == the first component pixel
in raster order, so ranking roots ascending reproduces skimage/scipy label
ordering exactly (labels 1..n assigned in raster order of first pixel) —
this is what makes the droplet CSV `label` column match the reference.

All shapes are static; batching via `jax.vmap` (the while_loop then runs
until every image in the batch converges).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_OFFSETS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
_OFFSETS_8 = _OFFSETS_4 + ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """shifted[y, x] = x[y+dy, x+dx] with `fill` outside bounds."""
    h, w = x.shape
    pt, pb = max(-dy, 0), max(dy, 0)
    plf, prt = max(-dx, 0), max(dx, 0)
    padded = jnp.pad(x, ((pt, pb), (plf, prt)), constant_values=fill)
    # padded[i, j] = x[i - pt, j - plf]; x[y+dy, x+dx] = padded[y+dy+pt, x+dx+plf]
    return padded[dy + pt: dy + pt + h, dx + plf: dx + plf + w]


@functools.partial(jax.jit, static_argnames=("connectivity", "jump_steps"))
def _label_flat(mask: jax.Array, connectivity: int = 1, jump_steps: int = 2
                ) -> jax.Array:
    """Root labels: each fg pixel -> min flat index of its component;
    bg pixels -> own flat index."""
    h, w = mask.shape
    n = h * w
    fg = mask.astype(bool)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(n)
    offsets = _OFFSETS_4 if connectivity == 1 else _OFFSETS_8

    def neighbor_min(lab):
        masked = jnp.where(fg, lab, big)
        m = masked
        for dy, dx in offsets:
            m = jnp.minimum(m, _shift(masked, dy, dx, big))
        return jnp.where(fg, jnp.minimum(lab, m), lab)

    def pointer_jump(lab):
        flat = lab.reshape(-1)
        for _ in range(jump_steps):
            flat = flat[flat]
        return flat.reshape(h, w)

    def body(state):
        lab, _ = state
        new = pointer_jump(neighbor_min(lab))
        return new, jnp.any(new != lab)

    lab0 = idx
    lab, _ = lax.while_loop(lambda s: s[1], body, (lab0, jnp.bool_(True)))
    return lab


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label(mask: jax.Array, connectivity: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Label connected components of a 2D binary mask.

    Args:
      mask: (H, W) bool/int array.
      connectivity: 1 (4-neighbors, reference quantify path,
        quantify_droplets_batch.py:82) or 2 (8-neighbors, algorithms.py:174).

    Returns:
      (labels, n): labels is (H, W) int32 with background 0 and components
      numbered 1..n in raster order of their first pixel (skimage-compatible);
      n is the int32 component count.
    """
    h, w = mask.shape
    n_pix = h * w
    fg = mask.astype(bool)
    roots = _label_flat(mask, connectivity=connectivity)
    flat_roots = roots.reshape(-1)
    flat_fg = fg.reshape(-1)
    idx = jnp.arange(n_pix, dtype=jnp.int32)
    is_root = flat_fg & (flat_roots == idx)
    # ascending root indices, non-roots pushed to the end with sentinel
    root_sorted = jnp.sort(jnp.where(is_root, idx, jnp.int32(n_pix)))
    lab = jnp.searchsorted(root_sorted, flat_roots).astype(jnp.int32) + 1
    lab = jnp.where(flat_fg, lab, 0)
    return lab.reshape(h, w), is_root.sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def component_areas(labels: jax.Array, num_segments: int) -> jax.Array:
    """areas[k] = pixel count of label k (index 0 = background)."""
    flat = labels.reshape(-1)
    return jax.ops.segment_sum(
        jnp.ones_like(flat, jnp.int32), flat, num_segments=num_segments
    )


@functools.partial(jax.jit, static_argnames=("num_segments",))
def sieve_small_components(
    labels: jax.Array, min_area: int, num_segments: int
) -> Tuple[jax.Array, jax.Array]:
    """Drop components smaller than `min_area` pixels and renumber 1..m
    preserving raster order — reproduces the reference's
    sieve-then-relabel (quantify_droplets_batch.py:83-86).

    `num_segments` must exceed the maximum label value.
    """
    areas = component_areas(labels, num_segments)
    keep = areas >= jnp.asarray(min_area, areas.dtype)
    keep = keep.at[0].set(False)
    new_ids = jnp.cumsum(keep.astype(jnp.int32)) * keep
    return new_ids[labels], keep.sum().astype(jnp.int32)
