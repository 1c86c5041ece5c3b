"""Watershed segmentation + Euclidean distance transform + peak finding.

Parity target: algorithms.py:144-165 `watershed_custom` (EDT ->
peak_local_max(min_distance=3) -> markers -> watershed). skimage is absent
from this image, so these are independent host implementations of the same
published algorithms (exact EDT via scipy, heap-based priority-flood
watershed, skimage-semantics peak_local_max). Device-accelerated variants
are future work (SURVEY.md §7 hard-parts list ranks them last); the host
versions are exact and operate on small per-image marker sets.
"""

from __future__ import annotations

import heapq
from typing import List, Tuple

import numpy as np
from scipy import ndimage as ndi


def distance_transform_edt(mask: np.ndarray) -> np.ndarray:
    """Exact EDT of the foreground — computed on device via the min-plus
    separable decomposition (ops/edt.py); scipy is the tiny-input fallback."""
    m = np.asarray(mask) > 0
    if m.size < 64 * 64:  # dispatch overhead beats compute at toy sizes
        return ndi.distance_transform_edt(m)
    from unetdc_tpu.ops.edt import distance_transform_edt as device_edt

    return np.asarray(device_edt(m))


def peak_local_max(image: np.ndarray, labels: np.ndarray = None,
                   min_distance: int = 3, exclude_border: bool = False
                   ) -> np.ndarray:
    """skimage.feature.peak_local_max semantics (the subset used by the
    reference): local maxima of `image` within a (2*min_distance+1) square
    footprint, restricted to `labels`>0, sorted by intensity with
    min_distance suppression."""
    img = np.asarray(image, np.float64)
    if labels is not None:
        region = np.asarray(labels) > 0
    else:
        region = np.ones_like(img, bool)

    size = 2 * min_distance + 1
    maxfilt = ndi.maximum_filter(img, size=size, mode="constant", cval=0.0)
    candidates = (img == maxfilt) & region & (img > 0)
    if exclude_border:
        candidates[:min_distance] = candidates[-min_distance:] = False
        candidates[:, :min_distance] = candidates[:, -min_distance:] = False
    coords = np.argwhere(candidates)
    if len(coords) == 0:
        return coords
    # sort by intensity (desc), suppress within min_distance — skimage's
    # ensure_spacing uses the Chebyshev metric (p_norm=inf) and rejects
    # strictly d < spacing (points at exactly `spacing` are kept)
    order = np.argsort(-img[tuple(coords.T)], kind="stable")
    coords = coords[order]
    accepted: List[np.ndarray] = []
    for c in coords:
        ok = True
        for a in accepted:
            if np.max(np.abs(c - a)) < min_distance:
                ok = False
                break
        if ok:
            accepted.append(c)
    return np.array(accepted)


_ALGO_DIR = None
_algo_lib = None
_algo_tried = False


def _load_algo():
    """ctypes handle to native/libalgo.so (auto-built); None on failure."""
    global _algo_lib, _algo_tried
    if _algo_lib is not None or _algo_tried:
        return _algo_lib
    _algo_tried = True
    import ctypes
    import subprocess
    from pathlib import Path

    native_dir = Path(__file__).resolve().parent.parent.parent / "native"
    lib_path = native_dir / "libalgo.so"
    if not lib_path.exists() and (native_dir / "Makefile").exists():
        try:
            subprocess.run(["make", "-C", str(native_dir), "libalgo.so"],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    if not lib_path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    fn = lib.watershed_flood
    fn.argtypes = [ctypes.POINTER(ctypes.c_double),
                   ctypes.POINTER(ctypes.c_int32),
                   ctypes.POINTER(ctypes.c_uint8),
                   ctypes.c_int32, ctypes.c_int32]
    fn.restype = ctypes.c_int
    _algo_lib = lib
    return lib


def watershed(neg_height: np.ndarray, markers: np.ndarray,
              mask: np.ndarray = None) -> np.ndarray:
    """Priority-flood watershed (skimage.segmentation.watershed semantics:
    lower `neg_height` floods first; FIFO tie-break by insertion order).

    Dispatches to the compiled flood in native/libalgo.so (identical
    algorithm, ~100x faster than the interpreted heap below, which remains
    as the oracle/fallback)."""
    lib = _load_algo()
    if lib is not None:
        import ctypes

        h = np.ascontiguousarray(neg_height, np.float64)
        out = np.ascontiguousarray(markers, np.int32).copy()
        if mask is not None:
            region = np.ascontiguousarray(mask, np.uint8)
            region = (region > 0).astype(np.uint8)
        else:
            region = np.ones(h.shape, np.uint8)
        lib.watershed_flood(
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            region.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int32(h.shape[0]), np.int32(h.shape[1]))
        return out
    return watershed_python(neg_height, markers, mask)


def watershed_python(neg_height: np.ndarray, markers: np.ndarray,
                     mask: np.ndarray = None) -> np.ndarray:
    """Pure-Python reference flood (exact oracle for the native kernel)."""
    h = np.asarray(neg_height, np.float64)
    out = np.asarray(markers, np.int32).copy()
    if mask is not None:
        region = np.asarray(mask) > 0
        out[~region] = -1  # never filled
    else:
        region = np.ones_like(out, bool)

    H, W = h.shape
    heap: List[Tuple[float, int, int, int]] = []
    counter = 0
    for y, x in np.argwhere((out > 0) & region):
        heapq.heappush(heap, (h[y, x], counter, y, x))
        counter += 1

    while heap:
        _, _, y, x = heapq.heappop(heap)
        lab = out[y, x]
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and region[ny, nx] \
                    and out[ny, nx] == 0:
                out[ny, nx] = lab
                heapq.heappush(heap, (h[ny, nx], counter, ny, nx))
                counter += 1
    out[out == -1] = 0
    return out


def watershed_custom(binary_image: np.ndarray, dots):
    """algorithms.py:144-165: EDT -> peak markers -> watershed; sample the
    label image at the dot coordinates."""
    binary_image = np.asarray(binary_image) > 0
    distance = distance_transform_edt(binary_image)
    max_coords = peak_local_max(distance, labels=binary_image,
                                min_distance=3, exclude_border=False)
    local_maxima = np.zeros(distance.shape, bool)
    if len(max_coords):
        local_maxima[tuple(max_coords.T)] = True
    markers, _ = ndi.label(local_maxima)
    labels = watershed(-distance, markers, mask=binary_image)
    ws_labels = []
    new_dots = []
    for d in dots:
        if labels[d[0]][d[1]] != 0:
            ws_labels.append(int(labels[d[0]][d[1]]))
            new_dots.append(d)
    return new_dots, ws_labels


def return_labeling_algorithms():
    """algorithms.py:140-142."""
    return ["No separation", "Watershed"]
