"""Density and concentric-ring ("target") heatmaps, on device.

Parity targets:
  - algorithms.py:389-456 `get_target`/`get_targets`: concentric rings
    around a centroid; per ring paint density %, blob count, count/10k px,
    mean blob size.
  - algorithms.py:458-518 `density_map`/`density_maps`: k x k sliding-window
    stats — the reference's slowest code (pure-Python double loop,
    O(H*W*k^2)); here a single `reduce_window` box sum per field.
  - quantify_pipline.py:61-97: ring map painting droplet-centroid counts and
    the Gaussian-ratio spatial density.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from unetdc_tpu.ops.filters import gaussian_filter_scipy


def _box_sum(x: jax.Array, k: int) -> jax.Array:
    """Sum over the k x k window clipped at borders (zero padding) — equals
    the reference's explicit np.sum over clamped slices."""
    half = (k - 1) // 2
    return lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(k, k), window_strides=(1, 1),
        padding=((half, k - 1 - half), (half, k - 1 - half)))


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def density_maps(mask_thresh: jax.Array, mask_contour: jax.Array,
                 centroid_size_image: jax.Array, kernel_size: int):
    """algorithms.py:482-518, vectorized. Returns (percentage, count,
    count_per_10k, mean_size) float32 heatmaps."""
    th = _box_sum(mask_thresh > 0, kernel_size)
    cont = _box_sum(mask_contour > 0, kernel_size)
    centroids = _box_sum(centroid_size_image > 0, kernel_size)
    sizes = _box_sum(centroid_size_image, kernel_size)

    inside = mask_contour > 0
    cont_pos = cont > 0
    cen_pos = centroids > 0
    pct = jnp.where(inside & cont_pos, th / jnp.maximum(cont, 1.0) * 100.0,
                    0.0)
    per10k = jnp.where(inside & cont_pos,
                       centroids / jnp.maximum(cont, 1.0) * 10000.0, 0.0)
    count = jnp.where(inside, centroids, 0.0)
    mean_size = jnp.where(inside & cen_pos,
                          sizes / jnp.maximum(centroids, 1.0), 0.0)
    return pct, count, per10k, mean_size


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def density_map(mask_thresh: jax.Array, mask_contour: jax.Array,
                kernel_size: int) -> jax.Array:
    """algorithms.py:458-480 — percentage field only."""
    th = _box_sum(mask_thresh > 0, kernel_size)
    cont = _box_sum(mask_contour > 0, kernel_size)
    inside = (mask_contour > 0) & (cont > 0)
    return jnp.where(inside, th / jnp.maximum(cont, 1.0) * 100.0, 0.0)


def _ring_index(mask_contour, centroid_y, centroid_x, nb_layers):
    """Per-pixel ring id in [0, nb_layers) for contour pixels, -1 outside
    or for d == 0 / d > max (matches b[i] < d <= b[i+1] with
    b = linspace(0, max_d, nb+1), algorithms.py:399-405)."""
    h, w = mask_contour.shape
    inside = mask_contour > 0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    d = jnp.sqrt((xx - centroid_x) ** 2 + (yy - centroid_y) ** 2)
    # empty contour -> max_d 0 -> every rid = -1 -> all-zero maps
    # (reference returns zeros_like, algorithms.py:455-456)
    max_d = jnp.maximum(jnp.max(jnp.where(inside, d, -jnp.inf)), 0.0)
    bounds = jnp.linspace(0.0, max_d, nb_layers + 1)
    # ring i: bounds[i] < d <= bounds[i+1]  ->  searchsorted 'left' - 1
    rid = jnp.searchsorted(bounds, d, side="left") - 1
    rid = jnp.where(inside & (d > 0) & (d <= max_d), rid, -1)
    rid = jnp.clip(rid, -1, nb_layers - 1)
    return rid, d, max_d, bounds


@functools.partial(jax.jit, static_argnames=("nb_layers",))
def get_targets(mask_thresh: jax.Array, mask_contour: jax.Array,
                centroid_size_image: jax.Array, nb_layers: int,
                centroid_y, centroid_x):
    """algorithms.py:415-456: per-ring density %, blob count, count/10k px,
    mean size painted onto ring pixels."""
    rid, _, _, _ = _ring_index(mask_contour, centroid_y, centroid_x,
                               nb_layers)
    seg = jnp.where(rid >= 0, rid, nb_layers).reshape(-1)  # nb = trash ring

    def ring_sum(field):
        return jax.ops.segment_sum(
            field.astype(jnp.float32).reshape(-1), seg,
            num_segments=nb_layers + 1)[:nb_layers]

    th = ring_sum(mask_thresh > 0)
    cont = ring_sum(mask_contour > 0)
    cen = ring_sum(centroid_size_image > 0)
    size = ring_sum(centroid_size_image)

    density = jnp.where(cont > 0, th / jnp.maximum(cont, 1.0) * 100.0, 0.0)
    per10k = jnp.where(cont > 0, cen / jnp.maximum(cont, 1.0) * 10000.0, 0.0)
    mean_size = jnp.where(cen > 0, size / jnp.maximum(cen, 1.0), 0.0)

    def paint(values):
        table = jnp.concatenate([values, jnp.zeros(1)])
        return table[jnp.where(rid >= 0, rid, nb_layers)]

    return paint(density), paint(cen), paint(per10k), paint(mean_size)


@functools.partial(jax.jit, static_argnames=("nb_layers",))
def get_target(mask_thresh: jax.Array, mask_contour: jax.Array,
               nb_layers: int, centroid_y, centroid_x) -> jax.Array:
    """algorithms.py:389-413 — density % ring map only."""
    pct, _, _, _ = get_targets(mask_thresh, mask_contour,
                               jnp.zeros_like(mask_thresh, jnp.float32),
                               nb_layers, centroid_y, centroid_x)
    return pct


@functools.partial(jax.jit, static_argnames=("nb_layers",))
def radial_centroid_count_map(mask_contour: jax.Array,
                              centroid_ys: jax.Array,
                              centroid_xs: jax.Array,
                              centroid_valid: jax.Array,
                              nb_layers: int, centroid_y, centroid_x
                              ) -> jax.Array:
    """quantify_pipline.py:61-91 `get_targets`: count droplet CENTROIDS per
    concentric ring and paint the count on the ring's ROI pixels.

    centroid_ys/xs: (max_labels,) droplet centroid coordinates with
    `centroid_valid` mask (from the quantify props tables).
    """
    rid, _, max_d, bounds = _ring_index(mask_contour, centroid_y, centroid_x,
                                        nb_layers)
    dc = jnp.sqrt((centroid_xs - centroid_x) ** 2
                  + (centroid_ys - centroid_y) ** 2)
    crid = jnp.searchsorted(bounds, dc, side="left") - 1
    ok = centroid_valid & (dc > 0) & (dc <= max_d) & (crid >= 0) \
        & (crid < nb_layers)
    counts = jax.ops.segment_sum(
        ok.astype(jnp.float32),
        jnp.where(ok, crid, nb_layers).astype(jnp.int32),
        num_segments=nb_layers + 1)[:nb_layers]
    table = jnp.concatenate([counts, jnp.zeros(1)])
    return table[jnp.where(rid >= 0, rid, nb_layers)]


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def gaussian_density_map(mask_thresh: jax.Array, mask_contour: jax.Array,
                         kernel_size: int = 21) -> jax.Array:
    """quantify_pipline.py:93-97: gaussian(mask, k/6) /
    (gaussian(roi, k/6) + 1e-5) * 100."""
    sigma = kernel_size / 6
    num = gaussian_filter_scipy(mask_thresh.astype(jnp.float32), sigma)
    den = gaussian_filter_scipy(mask_contour.astype(jnp.float32), sigma)
    return num / (den + 1e-5) * 100.0


def min_max_mean_sd_density(d_map, mask_contour):
    """algorithms.py:520-525 (3-decimal rounding on host)."""
    import numpy as np

    vals = np.asarray(d_map)[np.asarray(mask_contour) > 0]
    return (round(float(vals.min()), 3), round(float(vals.max()), 3),
            round(float(vals.mean()), 3), round(float(vals.std()), 3))


def min_max_mean_median_density(d_map, mask_contour):
    """algorithms.py:527-535."""
    import numpy as np

    m = np.asarray(mask_contour) > 0
    if m.sum() == 0:
        return 0, 0, 0, 0
    vals = np.asarray(d_map)[m]
    return (round(float(vals.min()), 3), round(float(vals.max()), 3),
            round(float(vals.mean()), 3), round(float(np.median(vals)), 3))
