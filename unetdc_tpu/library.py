"""BlobInspector algorithm library — function-for-function parity surface
with the reference `algorithms.py` (GPL-3 BlobInspector functions by
L. Busson; re-implemented here TPU-first, not copied).

Every public symbol of /root/reference/algorithms.py has an equivalent here
with the same name, signature and list/array conventions (dots = [[y, x]]
lists, labels = python lists starting at 1, etc.). Heavy per-pixel work
dispatches to the device ops in unetdc_tpu.ops; list-shuffling glue stays
host-side numpy, as in the reference.

Reference line citations are given per function.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from unetdc_tpu.ops.bitdepth import (  # noqa: F401  (algorithms.py:35-57)
    convert_to_8_bits, rolling_ball)
from unetdc_tpu.ops.blobs import (  # noqa: F401  (algorithms.py:97-138)
    blobs_mask, blobs_detection, return_blobs_algorithms)
from unetdc_tpu.ops.watershed import (  # noqa: F401 (algorithms.py:140-165)
    watershed_custom, return_labeling_algorithms)
from unetdc_tpu.ops.threshold import segmentation_two_thresholds as _stt
from unetdc_tpu.ops.connected_components import label as _label
from unetdc_tpu.ops.contours import (
    contour_scan as _contour_scan,
    contour_spreading_4 as _cs4,
    contour_spreading_8 as _cs8,
    contour_shrinking_box as _csb,
    calculate_contours_centroid as _ccc,
)
from unetdc_tpu.ops.density import (  # noqa: F401 (algorithms.py:389-535)
    get_target as _get_target,
    get_targets as _get_targets,
    density_map as _density_map,
    density_maps as _density_maps,
    min_max_mean_sd_density as min_max_mean_SD_density,
    min_max_mean_median_density,
)

_MODEL_CACHE = {}


def segmentation_deep_learning(image, ckpt_path: Optional[str] = None,
                               thresh: float = 0.3) -> np.ndarray:
    """Single-call image -> mask inference (algorithms.py:61-80): lazy
    cached model, resize to 512, threshold 0.3, nearest-resize back, x255.

    Deviations from the reference, which is doubly broken at this call site:
    it feeds a 1-channel tensor to the 3-channel model (a hard error) and
    applies a second sigmoid to already-sigmoided output (which makes every
    pixel exceed the 0.3 threshold). We implement the evident intent:
    grayscale input broadcast to RGB, single sigmoid (inside the model).
    """
    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.ops.resize import (resize_linear,
                                       resize_mask_linear_round)

    if ckpt_path is None:
        ckpt_path = os.path.join(os.path.dirname(__file__),
                                 "best_UNetDC_focal_model.pth")
    if ckpt_path not in _MODEL_CACHE:
        _MODEL_CACHE[ckpt_path] = load_engine(ckpt_path)
    engine = _MODEL_CACHE[ckpt_path]

    img = np.asarray(image, np.float32) / 255.0
    oh, ow = img.shape[:2]
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    x = resize_linear(jnp.asarray(img), (512, 512))[None]
    probs = np.asarray(engine.forward_probs(x))[0, :, :, 0]
    mask512 = (probs > thresh).astype(np.uint8)
    mask = np.asarray(resize_mask_linear_round(jnp.asarray(mask512),
                                               (oh, ow)))
    return (mask * 255).astype(np.uint8)


def segmentation_two_thresholds(image, thresh1, thresh2) -> np.ndarray:
    """algorithms.py:83-95."""
    return np.asarray(_stt(jnp.asarray(image), thresh1, thresh2))


def labeling_custom(binary_image, dots) -> List[int]:
    """algorithms.py:167-178: 8-connectivity labels sampled at dots
    (vectorized gather; one indexing op instead of a per-dot loop)."""
    lab, _ = _label(jnp.asarray(binary_image), connectivity=2)
    lab = np.asarray(lab)
    if not len(dots):
        return []
    d = np.asarray(dots, np.intp)
    return [int(v) for v in lab[d[:, 0], d[:, 1]]]


def binary_to_dots(binary_image) -> List[List[int]]:
    """algorithms.py:180-186."""
    coord = np.where(np.asarray(binary_image))
    return [[int(y), int(x)] for y, x in zip(coord[0], coord[1])]


def dots_to_binary(mask_thresh, dots) -> np.ndarray:
    """algorithms.py:634-645."""
    mask = np.zeros(np.asarray(mask_thresh).shape, bool)
    for coord in dots:
        mask[round(coord[0]), round(coord[1])] = True
    return mask


def _group_indices(labels):
    """One-pass label -> [indices in increasing order] map: replaces the
    reference's O(labels x dots) per-label rescans with O(n) grouping while
    keeping every per-label visit order identical."""
    groups = {}
    for i, lab in enumerate(labels):
        groups.setdefault(lab, []).append(i)
    return groups


def sieve_labels(dots, labels, sieve_size):
    """algorithms.py:188-207: drop labels with <= sieve_size pixels,
    renumber from 1. Iteration still follows `set(labels)` order (the
    reference's python-set quirk), but the per-label coordinate gather is
    a precomputed group-by — O(n + k) instead of O(n*k)
    (behavior-identity pinned by tests/test_library_vectorized.py)."""
    sieved_dots, sieved_labels = [], []
    groups = _group_indices(labels)
    latest = 1
    for lab in set(labels):
        idx = groups[lab]
        if len(idx) > sieve_size:
            sieved_dots.extend(dots[i] for i in idx)
            sieved_labels.extend([latest] * len(idx))
            latest += 1
    return sieved_dots, sieved_labels


def _sizes_dropping_last(labels):
    """`[labels.count(i) for i in range(1, max(labels))]` — the reference's
    per-label size list INCLUDING its silently-dropped-last-label quirk
    (algorithms.py:216-218) — via one bincount pass instead of an O(n*k)
    count loop. Labels are 1..max ints by the labeling contract."""
    nb = int(max(labels))
    counts = np.bincount(np.asarray(labels, np.int64), minlength=nb + 1)
    return [int(c) for c in counts[1:nb]]


def mean_SD_size(labels):
    """algorithms.py:209-218 (note: reference counts sizes for labels
    1..max-1, silently dropping the last label — reproduced)."""
    if len(labels) == 0:
        return 0, 0
    sizes = _sizes_dropping_last(labels)
    return round(np.mean(sizes), 2), round(np.std(sizes), 2)


def mean_median_size(labels):
    """algorithms.py:220-228 (same last-label quirk)."""
    if len(labels) == 0:
        return 0, 0
    sizes = _sizes_dropping_last(labels)
    return round(np.mean(sizes), 2), round(np.median(sizes), 2)


def mean_median_min_max_size(labels):
    """algorithms.py:230-238 (same last-label quirk)."""
    if len(labels) == 0:
        return 0, 0, 0, 0, 0
    sizes = _sizes_dropping_last(labels)
    return (round(np.mean(sizes), 2), round(np.median(sizes), 2),
            round(np.min(sizes), 2), round(np.max(sizes), 2), sizes)


def return_contouring_algorithms():
    """algorithms.py:240-242."""
    return ["Scan", "Spreading 4-connect", "Spreading 8-connect",
            "Shrinking box", "Threshold"]


def contour_scan(image, threshold) -> np.ndarray:
    """algorithms.py:244-276."""
    return np.asarray(_contour_scan(jnp.asarray(image), threshold))


def contour_spreading_4(image, threshold) -> np.ndarray:
    """algorithms.py:278-295."""
    return np.asarray(_cs4(jnp.asarray(image), threshold))


def contour_spreading_8(image, threshold) -> np.ndarray:
    """algorithms.py:297-314."""
    return np.asarray(_cs8(jnp.asarray(image), threshold))


def contour_shrinking_box(image, threshold) -> np.ndarray:
    """algorithms.py:316-352."""
    return np.asarray(_csb(jnp.asarray(image), threshold))


def remove_objects(contour_mask, min_size) -> np.ndarray:
    """algorithms.py:354-367. One propagation + compact table — no host
    round-trip (an earlier version labeled twice with a blocking int() sync
    between, just to size num_segments). The reference's skimage path has
    no component cap; when a mask has more than 4096 8-connected blobs the
    exact root count (returned alongside the sieve) triggers a re-run at
    the next power-of-two cap that fits, so the result is always the exact
    sieve (degrade-to-correct, one extra compile on such masks)."""
    from unetdc_tpu.ops.connected_components import remove_small_batch_counted

    m = jnp.asarray(contour_mask)
    cap = 4096
    while True:
        kept, total = remove_small_batch_counted(
            m[None], jnp.asarray(min_size), max_labels=cap, connectivity=2)
        t = int(total[0])
        if t <= cap:
            return np.asarray(kept[0])
        while cap < t:
            cap *= 2


def calculate_contours_centroid(image):
    """algorithms.py:369-379."""
    cy, cx = _ccc(jnp.asarray(image))
    return [float(cy), float(cx)]


def return_colormaps():
    """algorithms.py:381-383."""
    return ["afmhot", "autumn", "bone", "cividis", "cool", "coolwarm",
            "copper", "gist_gray", "gist_heat", "gray", "hot", "inferno",
            "magma", "plasma", "rainbow", "seismic", "spring", "summer",
            "viridis", "winter", "Wistia"]


def return_colors_dictionnary():
    """algorithms.py:385-387."""
    return {"blue": [0, 0, 255], "cyan": [0, 255, 255], "green": [0, 255, 0],
            "magenta": [255, 0, 255], "orange": [255, 165, 0],
            "pink": [255, 192, 203], "red": [255, 0, 0],
            "royalblue": [65, 105, 225], "yellow": [255, 255, 0],
            "white": [255, 255, 255]}


def get_target(mask_thresh, mask_contour, nb_layers, centroid_y, centroid_x):
    """algorithms.py:389-413."""
    return np.asarray(_get_target(
        jnp.asarray(mask_thresh), jnp.asarray(mask_contour), int(nb_layers),
        float(centroid_y), float(centroid_x)))


def get_targets(mask_thresh, mask_contour, centroid_size_image, nb_layers,
                centroid_y, centroid_x):
    """algorithms.py:415-456."""
    outs = _get_targets(
        jnp.asarray(mask_thresh), jnp.asarray(mask_contour),
        jnp.asarray(centroid_size_image, jnp.float32), int(nb_layers),
        float(centroid_y), float(centroid_x))
    return tuple(np.asarray(o) for o in outs)


def density_map(mask_thresh, mask_contour, kernel_size):
    """algorithms.py:458-480."""
    return np.asarray(_density_map(
        jnp.asarray(mask_thresh), jnp.asarray(mask_contour),
        int(kernel_size)))


def density_maps(mask_thresh, mask_contour, centroid_size_image,
                 kernel_size):
    """algorithms.py:482-518."""
    outs = _density_maps(
        jnp.asarray(mask_thresh), jnp.asarray(mask_contour),
        jnp.asarray(centroid_size_image, jnp.float32), int(kernel_size))
    return tuple(np.asarray(o) for o in outs)


def is_float(string) -> bool:
    """algorithms.py:537-543."""
    try:
        float(string)
        return True
    except ValueError:
        return False


def _group_means_sizes(dots, labels):
    """Per-label (mean_y, mean_x, size) in np.unique(labels) order — the
    shared group-by behind the calculate_centroids* family. One stable
    argsort replaces the reference's per-label O(n) rescans; within each
    group the coordinates keep their original increasing-index order, so
    each group's np.mean sees the exact element sequence the loop version
    built (bit-identical results, pinned by
    tests/test_library_vectorized.py)."""
    coords = np.asarray(dots, np.float64).reshape(len(labels), 2)
    order = np.argsort(np.asarray(labels), kind="stable")
    sorted_coords = coords[order]
    _, starts = np.unique(np.asarray(labels)[order], return_index=True)
    bounds = list(starts) + [len(labels)]
    means, sizes = [], []
    for a, b in zip(bounds[:-1], bounds[1:]):
        means.append(sorted_coords[a:b].mean(axis=0))
        sizes.append(b - a)
    return means, sizes


def calculate_centroids_sizes(dots, labels) -> np.ndarray:
    """algorithms.py:545-559."""
    if len(labels) == 0:
        return np.array([])
    means, sizes = _group_means_sizes(dots, labels)
    return np.array([[c[0], c[1], n] for c, n in zip(means, sizes)])


def calculate_centroids_sizes_image(dots, labels, image) -> np.ndarray:
    """algorithms.py:561-576."""
    out = np.zeros(np.asarray(image).shape, np.uint16)
    if len(labels) == 0:
        return out
    means, sizes = _group_means_sizes(dots, labels)
    for c, n in zip(means, sizes):
        out[int(c[0] + 0.5), int(c[1] + 0.5)] = n
    return out


def calculate_centroids(dots, labels) -> np.ndarray:
    """algorithms.py:578-591."""
    if len(labels) == 0:
        return np.array([])
    means, _ = _group_means_sizes(dots, labels)
    return np.array([[c[0], c[1]] for c in means])


def calculate_blobs_centroids_and_DTOC(dots, labels, centroid_x, centroid_y):
    """algorithms.py:593-612."""
    if labels == []:
        return [], []
    means, _ = _group_means_sizes(dots, labels)
    cents = np.array(means)
    dtoc = np.sqrt((cents[:, 0] - centroid_y) ** 2
                   + (cents[:, 1] - centroid_x) ** 2)
    return np.array(cents), dtoc.tolist()


def get_filename(absolute_path: str) -> str:
    """algorithms.py:614-617."""
    last = max(absolute_path.rfind("/"), absolute_path.rfind("\\"))
    return absolute_path[last + 1:]


def get_folder(absolute_path: str) -> str:
    """algorithms.py:619-622."""
    last = max(absolute_path.rfind("/"), absolute_path.rfind("\\"))
    return absolute_path[:last + 1]


def get_filename_without_extension(absolute_path: str) -> str:
    """algorithms.py:625-632."""
    last = max(absolute_path.rfind("/"), absolute_path.rfind("\\"))
    dot = absolute_path.rfind(".")
    if last != -1:
        return absolute_path[last + 1:dot]
    return absolute_path[0:dot]
