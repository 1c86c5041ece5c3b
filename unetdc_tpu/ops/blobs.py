"""Blob detection: LoG / DoG / DoH scale-space detectors.

Parity target: algorithms.py:116-138 `blobs_detection`, which wraps skimage
blob_log / blob_dog / blob_doh with radius->sigma conversion. skimage is not
available in this image, so this is an independent implementation of the
same published algorithms: Gaussian scale-space filters run batched on
device; peak extraction and overlap pruning (small candidate sets) finish on
host.

API-compatible outputs: (n, 3) float arrays of (y, x, radius_or_sigma) rows
matching skimage conventions:
  - blob_log/blob_dog return sigma in column 2 (callers multiply by sqrt(2),
    algorithms.py:132,135)
  - blob_doh returns the detection sigma directly as radius.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from unetdc_tpu.ops.filters import (gaussian_derivative_scipy,
                                    gaussian_filter_scipy)


@functools.partial(jax.jit, static_argnames=("sigmas",))
def _log_cube(image: jax.Array, sigmas: tuple) -> jax.Array:
    """-sigma^2 * Laplacian-of-Gaussian response per scale: the TRUE
    scipy.ndimage.gaussian_laplace math (separable order-2 Gaussian
    derivative along each axis, summed), the scale-normalized response of
    the published LoG detector and of skimage blob_log. (r2 shipped a
    5-point finite-difference Laplacian of the smoothed image; r3 replaced
    it with the exact operator and pinned it against a scipy oracle,
    tests/test_blobs_oracle.py.)"""
    img = image.astype(jnp.float32)
    layers = []
    for s in sigmas:
        lap = (gaussian_derivative_scipy(img, s, 2, 0)
               + gaussian_derivative_scipy(img, s, 0, 2))
        layers.append(-lap * s ** 2)
    return jnp.stack(layers)


@functools.partial(jax.jit, static_argnames=("sigmas",))
def _dog_cube(image: jax.Array, sigmas: tuple) -> jax.Array:
    img = image.astype(jnp.float32)
    gs = [gaussian_filter_scipy(img, s) for s in sigmas]
    layers = [(gs[i] - gs[i + 1]) * (sigmas[i] / (sigmas[i + 1] - sigmas[i])
                                     if sigmas[i + 1] > sigmas[i] else 1.0)
              for i in range(len(sigmas) - 1)]
    return jnp.stack(layers)


@functools.partial(jax.jit, static_argnames=("sigmas",))
def _doh_cube(image: jax.Array, sigmas: tuple) -> jax.Array:
    """sigma^4-normalized determinant of the TRUE Gaussian Hessian
    (separable order-(2,0)/(0,2)/(1,1) derivative filters), the published
    DoH response. skimage's blob_doh uses an integral-image box-filter
    APPROXIMATION of this operator (SURF-style); we implement the exact
    definition and pin it against a scipy brute-force oracle
    (tests/test_blobs_oracle.py). Divergence-by-design from skimage's
    approximation, MEASURED (test_blob_doh_exact_vs_approx_divergence_
    envelope): same detections blob-for-blob on structured images with
    centers within 1.5 px, but the box detector's selected sigma runs
    1.5-2x coarse; on noise it finds ~3x fewer peaks (Jaccard ~0.2).
    `blob_doh(..., approximate=True)` provides the box-filter behavior
    (`_doh_cube_approx`) for skimage-family parity."""
    img = image.astype(jnp.float32)
    layers = []
    for s in sigmas:
        dyy = gaussian_derivative_scipy(img, s, 2, 0)
        dxx = gaussian_derivative_scipy(img, s, 0, 2)
        dxy = gaussian_derivative_scipy(img, s, 1, 1)
        layers.append((dxx * dyy - dxy ** 2) * s ** 4)
    return jnp.stack(layers)


def _surf_geometry(sigma: float):
    """Box-filter geometry of the SURF Hessian approximation at `sigma`
    (Bay et al. 2006, the construction skimage's blob_doh implements with
    integral images): filter size 3*sigma, lobe s3 = size//3, half-width
    s2 = (size-1)//2, normalization 1/size^2."""
    size = int(3.0 * sigma)
    s2 = (size - 1) // 2
    s3 = size // 3
    return size, s2, s3


@functools.partial(jax.jit, static_argnames=("sigmas",))
def _doh_cube_approx(image: jax.Array, sigmas: tuple) -> jax.Array:
    """SURF integral-image box-filter approximation of the Hessian
    determinant — the approximation FAMILY behind skimage's blob_doh
    (skimage.feature._hessian_det_appx; reference call site
    algorithms.py:129-137) — evaluated with static shifted slices of an
    edge-padded integral image (edge replication == the host code's index
    clamping), all VPU work. det = dxx*dyy - 0.81*dxy^2 (0.9^2 SURF
    cross-derivative weight). Pinned against a direct numpy
    transliteration in tests/test_blobs_oracle.py."""
    img = image.astype(jnp.float32)
    h, w = img.shape
    S = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)  # inclusive integral

    layers = []
    for s in sigmas:
        size, s2, s3 = _surf_geometry(s)
        pad = size + 2  # > any |offset| below
        P = jnp.pad(S, pad, mode="edge")
        w_i = 1.0 / (size * size)

        def corner(dr, dc):
            return lax.dynamic_slice(P, (pad + dr, pad + dc), (h, w))

        def integ(r0, c0, rl, cl):
            # sum of the rl x cl box whose top-left is (r0+1, c0+1), via
            # clamped integral-image corners (max(0, .) as in the host code)
            ans = (corner(r0, c0) + corner(r0 + rl, c0 + cl)
                   - corner(r0, c0 + cl) - corner(r0 + rl, c0))
            return jnp.maximum(ans, 0.0)

        tl = integ(-s3, -s3, s3, s3)
        br = integ(1, 1, s3, s3)
        bl = integ(1, -s3, s3, s3)
        tr = integ(-s3, 1, s3, s3)
        dxy = (bl + tr - tl - br) * w_i

        mid = integ(-s3 + 1, -s2, 2 * s3 - 1, size)
        side = integ(-s3 + 1, -(s3 // 2), 2 * s3 - 1, s3)
        dxx = (mid - 3.0 * side) * w_i

        mid = integ(-s2, -s3 + 1, size, 2 * s3 - 1)
        side = integ(-(s3 // 2), -s3 + 1, s3, 2 * s3 - 1)
        dyy = (mid - 3.0 * side) * w_i

        layers.append(dxx * dyy - 0.81 * dxy * dxy)
    return jnp.stack(layers)


def _local_maxima_3d(cube: np.ndarray, threshold: float) -> np.ndarray:
    """Peaks strictly greater-or-equal than their 3x3x3 neighborhood and
    above threshold; returns (n, 3) array of (scale, y, x)."""
    S, H, W = cube.shape
    pad = np.pad(cube, 1, mode="constant", constant_values=-np.inf)
    is_max = np.ones((S, H, W), bool)
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == dy == dx == 0:
                    continue
                is_max &= cube >= pad[1 + ds:1 + ds + S, 1 + dy:1 + dy + H,
                                      1 + dx:1 + dx + W]
    is_max &= cube > threshold
    return np.argwhere(is_max)


def _disk_overlap_fraction(d: float, r1: float, r2: float) -> float:
    """Area of intersection of two disks / area of the smaller disk
    (skimage._blob_overlap)."""
    if d > r1 + r2:
        return 0.0
    if d <= abs(r1 - r2):
        return 1.0
    ratio1 = max(-1.0, min(1.0, (d * d + r1 * r1 - r2 * r2) / (2 * d * r1)))
    ratio2 = max(-1.0, min(1.0, (d * d + r2 * r2 - r1 * r1) / (2 * d * r2)))
    a = (r1 * r1 * math.acos(ratio1) + r2 * r2 * math.acos(ratio2)
         - 0.5 * math.sqrt(abs((-d + r1 + r2) * (d + r1 - r2)
                               * (d - r1 + r2) * (d + r1 + r2))))
    return a / (math.pi * min(r1, r2) ** 2)


def _prune_overlap(blobs: np.ndarray, overlap: float = 0.5) -> np.ndarray:
    """skimage._prune_blobs semantics: for every pair whose disk-overlap
    area fraction exceeds `overlap`, eliminate the SMALLER-radius blob
    (radius = sigma * sqrt(2), the 2D convention skimage applies in its
    overlap test)."""
    if len(blobs) == 0:
        return blobs[:, :3] if blobs.ndim == 2 else blobs
    blobs = blobs.copy()
    n = len(blobs)
    for i in range(n):
        for j in range(i + 1, n):
            if blobs[i, 2] == 0 or blobs[j, 2] == 0:
                continue
            r1 = blobs[i, 2] * math.sqrt(2)
            r2 = blobs[j, 2] * math.sqrt(2)
            d = math.hypot(blobs[i, 0] - blobs[j, 0],
                           blobs[i, 1] - blobs[j, 1])
            if _disk_overlap_fraction(d, r1, r2) > overlap:
                if blobs[i, 2] > blobs[j, 2]:
                    blobs[j, 2] = 0
                else:
                    blobs[i, 2] = 0
    return blobs[blobs[:, 2] > 0][:, :3]


def blob_log(image, min_sigma=1.0, max_sigma=50.0, num_sigma=10,
             threshold=0.2) -> np.ndarray:
    sigmas = tuple(np.linspace(min_sigma, max_sigma, int(max(num_sigma, 1))))
    cube = np.asarray(_log_cube(jnp.asarray(image, jnp.float32), sigmas))
    peaks = _local_maxima_3d(cube, threshold)
    rows = [(y, x, sigmas[s], cube[s, y, x]) for s, y, x in peaks]
    return _prune_overlap(np.array(rows).reshape(-1, 4))


def blob_dog(image, min_sigma=1.0, max_sigma=50.0, sigma_ratio=1.6,
             threshold=0.2) -> np.ndarray:
    sigmas = [float(min_sigma)]
    while sigmas[-1] < max_sigma:
        sigmas.append(sigmas[-1] * sigma_ratio)
    if len(sigmas) < 2:  # min_sigma >= max_sigma: DoG needs two scales
        sigmas.append(sigmas[-1] * sigma_ratio)
    sigmas = tuple(sigmas)
    cube = np.asarray(_dog_cube(jnp.asarray(image, jnp.float32), sigmas))
    peaks = _local_maxima_3d(cube, threshold)
    rows = [(y, x, sigmas[s], cube[s, y, x]) for s, y, x in peaks]
    return _prune_overlap(np.array(rows).reshape(-1, 4))


def blob_doh(image, min_sigma=1.0, max_sigma=30.0, num_sigma=10,
             threshold=0.01, approximate: bool = False) -> np.ndarray:
    """DoH blob detector. Default: the EXACT Gaussian-Hessian determinant
    (the published operator, scipy-oracle-pinned). `approximate=True`
    switches to the SURF integral-image box-filter response — the
    approximation family skimage's blob_doh uses (algorithms.py:129-137),
    for behavior parity with the reference's detector; the measured
    exact-vs-approx divergence envelope is pinned in
    tests/test_blobs_oracle.py."""
    sigmas = tuple(np.linspace(min_sigma, max_sigma, int(max(num_sigma, 1))))
    fn = _doh_cube_approx if approximate else _doh_cube
    cube = np.asarray(fn(jnp.asarray(image, jnp.float32), sigmas))
    peaks = _local_maxima_3d(cube, threshold)
    rows = [(y, x, sigmas[s], cube[s, y, x]) for s, y, x in peaks]
    return _prune_overlap(np.array(rows).reshape(-1, 4))


def blobs_detection(image, algo_index: int, min_radius: int,
                    max_radius: int) -> Optional[np.ndarray]:
    """algorithms.py:120-138: dispatch + radius<->sigma conversion."""
    sq2 = math.sqrt(2)
    if algo_index == 1:
        blobs = blob_log(image, min_sigma=min_radius / sq2,
                         max_sigma=max_radius / sq2,
                         num_sigma=max_radius - min_radius + 1, threshold=.2)
        if len(blobs):
            blobs[:, 2] *= sq2
        return blobs
    if algo_index == 2:
        blobs = blob_dog(image, min_sigma=min_radius / sq2,
                         max_sigma=max_radius / sq2, threshold=.2)
        if len(blobs):
            blobs[:, 2] *= sq2
        return blobs
    if algo_index == 3:
        return blob_doh(image, min_sigma=min_radius, max_sigma=max_radius,
                        num_sigma=max_radius - min_radius + 1, threshold=.01)
    return None


def blobs_mask(image, blobs_list) -> np.ndarray:
    """algorithms.py:97-114: paint filled circles at (y, x, r) rows."""
    out = np.zeros(np.asarray(image).shape[:2], bool)
    h, w = out.shape
    yy, xx = np.mgrid[:h, :w]
    for blob in blobs_list:
        y, x, r = blob[0], blob[1], blob[2]
        y, x, r = int(y + 0.5), int(x + 0.5), int(math.ceil(r))
        out |= (yy - y) ** 2 + (xx - x) ** 2 <= r ** 2
    return out


def return_blobs_algorithms():
    """algorithms.py:116-118."""
    return ["None", "LoG", "DoG", "DoH"]
