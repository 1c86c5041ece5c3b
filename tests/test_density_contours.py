"""Density/ring/contour op parity vs direct numpy ports of the reference
loops (algorithms.py:244-276, 389-456, 458-518; quantify_pipline.py:61-97).
The numpy oracles here transcribe the documented reference behavior."""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp


def _blob_scene(rng, h=64, w=80):
    mask_contour = np.zeros((h, w), bool)
    yy, xx = np.mgrid[:h, :w]
    mask_contour[(yy - h // 2) ** 2 + (xx - w // 2) ** 2 <= (h // 2 - 4) ** 2] = True
    mask_thresh = np.zeros((h, w), bool)
    for _ in range(10):
        cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
        r = rng.randint(2, 5)
        mask_thresh |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
    mask_thresh &= mask_contour
    return mask_thresh, mask_contour


def _ref_density_maps(mask_thresh, mask_contour, centroid_size_image, k):
    """Direct port of algorithms.py:482-518."""
    half = int((k - 1) / 2)
    h, w = mask_thresh.shape
    pct = np.zeros((h, w), np.float32)
    cnt = np.zeros((h, w), np.float32)
    p10k = np.zeros((h, w), np.float32)
    msize = np.zeros((h, w), np.float32)
    mc = centroid_size_image > 0
    for y in range(h):
        for x in range(w):
            if mask_contour[y, x]:
                y0, y1 = max(0, y - half), min(h, y + 1 + half)
                x0, x1 = max(0, x - half), min(w, x + 1 + half)
                th = np.sum(mask_thresh[y0:y1, x0:x1])
                cont = np.sum(mask_contour[y0:y1, x0:x1])
                cc = np.sum(mc[y0:y1, x0:x1])
                sc = np.sum(centroid_size_image[y0:y1, x0:x1])
                if cont > 0:
                    pct[y, x] = th / cont * 100
                    p10k[y, x] = cc / cont * 10000
                cnt[y, x] = cc
                if cc > 0:
                    msize[y, x] = sc / cc
    return pct, cnt, p10k, msize


def _ref_get_targets(mask_thresh, mask_contour, csi, nb, cy, cx):
    """Direct port of algorithms.py:415-456."""
    coords = np.where(mask_contour)
    if len(coords[0]) == 0:
        z = np.zeros_like(mask_contour, np.uint8)
        return z, z, z, z
    d = np.sqrt((coords[1] - cx) ** 2 + (coords[0] - cy) ** 2)
    maxd = d.max()
    bounds = np.linspace(0, maxd, nb + 1)
    pct = np.zeros(mask_thresh.shape, np.float32)
    cnt = np.zeros_like(pct)
    size = np.zeros_like(pct)
    p10k = np.zeros_like(pct)
    mc = csi > 0
    for i in range(nb):
        ring = (bounds[i] < d) & (d <= bounds[i + 1])
        ys, xs = coords[0][ring], coords[1][ring]
        th = np.sum(mask_thresh[ys, xs])
        cont = np.sum(mask_contour[ys, xs])
        cs = np.sum(mc[ys, xs])
        ss = np.sum(csi[ys, xs])
        dens = th / cont * 100 if cont else 0
        if cont:
            p10k[ys, xs] = cs / cont * 10000
        pct[ys, xs] = dens
        cnt[ys, xs] = cs
        if cs > 0:
            size[ys, xs] = ss / cs
    return pct, cnt, p10k, size


def test_density_maps_matches_reference(rng):
    from unetdc_tpu.ops.density import density_maps

    mt, mc = _blob_scene(rng)
    csi = np.zeros_like(mt, np.float32)
    ys, xs = np.where(mt)
    for i in range(0, len(ys), 7):
        csi[ys[i], xs[i]] = rng.randint(1, 20)
    ref = _ref_density_maps(mt, mc, csi, 15)
    ours = density_maps(jnp.asarray(mt), jnp.asarray(mc), jnp.asarray(csi), 15)
    for o, r, name in zip(ours, ref, ["pct", "cnt", "p10k", "msize"]):
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-3, err_msg=name)


def test_get_targets_matches_reference(rng):
    from unetdc_tpu.ops.density import get_targets

    mt, mc = _blob_scene(rng)
    csi = np.zeros_like(mt, np.float32)
    ys, xs = np.where(mt)
    for i in range(0, len(ys), 5):
        csi[ys[i], xs[i]] = rng.randint(1, 30)
    cy, cx = 31.7, 40.2
    ref = _ref_get_targets(mt, mc, csi, 10, cy, cx)
    ours = get_targets(jnp.asarray(mt), jnp.asarray(mc), jnp.asarray(csi),
                       10, cy, cx)
    for o, r, name in zip(ours, ref, ["pct", "cnt", "p10k", "size"]):
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-2, err_msg=name)


def test_get_targets_empty_contour():
    from unetdc_tpu.ops.density import get_targets

    z = jnp.zeros((16, 16), jnp.uint8)
    outs = get_targets(z, z, jnp.zeros((16, 16), jnp.float32), 5, 8.0, 8.0)
    for o in outs:
        assert np.all(np.asarray(o) == 0)


def test_radial_centroid_count_map_matches_reference(rng):
    """Oracle: direct numpy port of quantify_pipline.py:61-91 (ring map of
    droplet-centroid counts painted on ROI pixels)."""
    from unetdc_tpu.ops.density import radial_centroid_count_map

    mt, mc = _blob_scene(rng)
    lbl, n = ndi.label(mt, structure=np.array([[0, 1, 0], [1, 1, 1],
                                               [0, 1, 0]], bool))
    idxs = np.arange(1, n + 1)
    areas = ndi.sum_labels(np.ones_like(lbl), lbl, index=idxs)
    cy_all = ndi.sum_labels(np.indices(lbl.shape)[0], lbl, index=idxs) / areas
    cx_all = ndi.sum_labels(np.indices(lbl.shape)[1], lbl, index=idxs) / areas
    cy, cx = 33, 41

    # reference port
    coords = np.where(mc)
    d = np.sqrt((coords[1] - cx) ** 2 + (coords[0] - cy) ** 2)
    maxd = d.max()
    bounds = np.linspace(0, maxd, 11)
    dc = np.sqrt((cx_all - cx) ** 2 + (cy_all - cy) ** 2)
    ref = np.zeros(mt.shape, np.float32)
    for i in range(10):
        in_ring = (bounds[i] < dc) & (dc <= bounds[i + 1])
        ring = (bounds[i] < d) & (d <= bounds[i + 1])
        if ring.any():
            ref[coords[0][ring], coords[1][ring]] = in_ring.sum()

    cap = 64
    cys = np.zeros(cap, np.float32)
    cxs = np.zeros(cap, np.float32)
    valid = np.zeros(cap, bool)
    cys[:n] = cy_all
    cxs[:n] = cx_all
    valid[:n] = True
    ours = np.asarray(radial_centroid_count_map(
        jnp.asarray(mc), jnp.asarray(cys), jnp.asarray(cxs),
        jnp.asarray(valid), 10, float(cy), float(cx)))
    # f32 ring-boundary rounding can shift individual centroids/pixels by
    # one ring; demand exact agreement away from boundaries
    assert (ours != ref).mean() < 0.02


def test_gaussian_density_map_matches_reference(rng):
    from unetdc_tpu.ops.density import gaussian_density_map

    mt, mc = _blob_scene(rng)
    ref_num = ndi.gaussian_filter(mt.astype(np.float32), sigma=21 / 6)
    ref_den = ndi.gaussian_filter(mc.astype(np.float32), sigma=21 / 6)
    ref = ref_num / (ref_den + 1e-5) * 100
    ours = np.asarray(gaussian_density_map(jnp.asarray(mt), jnp.asarray(mc),
                                           21))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def _ref_contour_scan(image, threshold):
    """Direct port of algorithms.py:244-276."""
    mask = np.ones_like(image, bool)
    for x in range(image.shape[1]):
        for y in range(image.shape[0]):
            if image[y, x] <= threshold:
                mask[y, x] = False
            else:
                break
        for y in reversed(range(image.shape[0])):
            if image[y, x] <= threshold:
                mask[y, x] = False
            else:
                break
    for y in range(image.shape[0]):
        for x in range(image.shape[1]):
            if image[y, x] <= threshold:
                mask[y, x] = False
            else:
                break
        for x in reversed(range(image.shape[1])):
            if image[y, x] <= threshold:
                mask[y, x] = False
            else:
                break
    return mask


def test_contour_scan_matches_reference(rng):
    from unetdc_tpu.ops.contours import contour_scan

    img = (rng.rand(48, 56) * 255).astype(np.uint8)
    img[:10] = 0
    img[:, :7] = 0
    for t in (0, 30):
        ref = _ref_contour_scan(img, t)
        ours = np.asarray(contour_scan(jnp.asarray(img), t))
        np.testing.assert_array_equal(ours, ref, err_msg=f"thresh={t}")


def test_contour_spreading_matches_flood_fill(rng):
    from unetdc_tpu.ops.contours import contour_spreading_4, contour_spreading_8

    img = (rng.rand(40, 40) * 255).astype(np.uint8)
    t = 60
    bg = img <= t
    # oracle: border-connected background via scipy labeling
    for conn, fn in [(np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool),
                      contour_spreading_4),
                     (np.ones((3, 3), bool), contour_spreading_8)]:
        lab, _ = ndi.label(bg, structure=conn)
        border_labels = set(lab[0]) | set(lab[-1]) | set(lab[:, 0]) \
            | set(lab[:, -1])
        border_labels.discard(0)
        reachable = np.isin(lab, list(border_labels))
        ref = ~(bg & reachable)
        ours = np.asarray(fn(jnp.asarray(img), t))
        np.testing.assert_array_equal(ours, ref)


def test_remove_objects_matches_reference(rng):
    from unetdc_tpu.ops.contours import remove_objects

    m = rng.rand(40, 40) > 0.7
    ref_lab, n = ndi.label(m, structure=np.ones((3, 3)))
    ref = np.zeros_like(m)
    for i in range(1, n + 1):
        if (ref_lab == i).sum() >= 5:
            ref |= ref_lab == i
    ours = np.asarray(remove_objects(jnp.asarray(m), 5))
    np.testing.assert_array_equal(ours, ref)


def test_calculate_contours_centroid():
    from unetdc_tpu.library import calculate_contours_centroid

    m = np.zeros((20, 30), bool)
    m[4:8, 10:20] = True
    cy, cx = calculate_contours_centroid(m)
    np.testing.assert_allclose([cy, cx], [5.5, 14.5])
    cy, cx = calculate_contours_centroid(np.zeros((20, 30), bool))
    np.testing.assert_allclose([cy, cx], [10.0, 15.0])
