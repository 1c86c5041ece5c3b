"""CC labeling + sieve + regionprops vs scipy.ndimage oracle.

scipy.ndimage.label assigns labels in raster order of each component's first
pixel — the same convention as skimage.measure.label used by the reference
(quantify_droplets_batch.py:82), so exact label equality is required.
"""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp

from unetdc_tpu.ops.connected_components import (
    label,
    sieve_small_components,
    component_areas,
)
from unetdc_tpu.ops.regionprops import regionprops_table, centroid_size_image

STRUCT_4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
STRUCT_8 = np.ones((3, 3), bool)


def _random_mask(rng, shape, p):
    return (rng.rand(*shape) < p).astype(np.uint8)


@pytest.mark.parametrize("connectivity,struct", [(1, STRUCT_4), (2, STRUCT_8)])
@pytest.mark.parametrize("p", [0.2, 0.5, 0.8])
def test_label_matches_scipy(rng, connectivity, struct, p):
    m = _random_mask(rng, (64, 96), p)
    ours, n = label(jnp.asarray(m), connectivity=connectivity)
    ref, n_ref = ndi.label(m, structure=struct)
    assert int(n) == n_ref
    np.testing.assert_array_equal(np.asarray(ours), ref)


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.slow
def test_cum_scan_propagation_matches_hillis_steele(rng, connectivity):
    """The offset-trick cumulative-scan propagation (the r3 default within
    its int32 headroom, `_seg_scan_cum`) must be bit-identical to the
    Hillis-Steele doubling fallback for both min-root and rank-max
    propagation, including batched inputs."""
    from unetdc_tpu.ops.connected_components import _propagate, _cumsum2d
    import jax

    for p in (0.25, 0.5, 0.75):
        m = _random_mask(rng, (3, 37, 53), p)
        fg = jnp.asarray(m, bool)
        h, w = fg.shape[-2:]
        idx = jnp.broadcast_to(
            jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), fg.shape)
        big = h * w
        roots = {}
        for impl in ("hs", "cum"):
            roots[impl] = _propagate(idx, fg, big, connectivity, True,
                                     scan_impl=impl)
        np.testing.assert_array_equal(np.asarray(roots["hs"])[m > 0],
                                      np.asarray(roots["cum"])[m > 0])
        is_root = fg & (roots["hs"] == idx)
        rank = jax.vmap(_cumsum2d)(is_root.astype(jnp.int32))
        seed = jnp.where(is_root, rank, 0)
        labs = {impl: _propagate(seed, fg, 0, connectivity, False,
                                 scan_impl=impl) for impl in ("hs", "cum")}
        np.testing.assert_array_equal(np.asarray(labs["hs"])[m > 0],
                                      np.asarray(labs["cum"])[m > 0])


def test_label_empty_and_full():
    z = np.zeros((16, 16), np.uint8)
    l0, n0 = label(jnp.asarray(z))
    assert int(n0) == 0 and np.all(np.asarray(l0) == 0)
    o = np.ones((16, 16), np.uint8)
    l1, n1 = label(jnp.asarray(o))
    assert int(n1) == 1 and np.all(np.asarray(l1) == 1)


def test_label_worst_case_snake():
    # serpentine path: long single component exercising propagation depth
    m = np.zeros((32, 32), np.uint8)
    for r in range(0, 32, 2):
        m[r, :] = 1
    for i, r in enumerate(range(1, 32, 2)):
        m[r, 31 if i % 2 == 0 else 0] = 1
    ours, n = label(jnp.asarray(m))
    ref, n_ref = ndi.label(m, structure=STRUCT_4)
    assert int(n) == n_ref == 1
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_sieve_matches_reference_semantics(rng):
    """Reproduce quantify()'s sieve-then-relabel (quantify_droplets_batch.py:
    81-95) against a direct numpy implementation."""
    m = _random_mask(rng, (64, 64), 0.35)
    min_area = 4
    lab, n = label(jnp.asarray(m))
    sieved, n2 = sieve_small_components(lab, min_area, num_segments=64 * 64 // 2 + 2)

    ref, _ = ndi.label(m, structure=STRUCT_4)
    for lv in np.unique(ref):
        if lv and (ref == lv).sum() < min_area:
            ref[ref == lv] = 0
    ref2, n_ref2 = ndi.label(ref > 0, structure=STRUCT_4)
    assert int(n2) == n_ref2
    np.testing.assert_array_equal(np.asarray(sieved), ref2)


def test_regionprops_matches_numpy(rng):
    m = _random_mask(rng, (48, 80), 0.3)
    lab, n = label(jnp.asarray(m))
    n = int(n)
    props = regionprops_table(lab, max_labels=1024)
    labnp = np.asarray(lab)
    for k in range(1, n + 1):
        ys, xs = np.where(labnp == k)
        assert props["area"][k - 1] == len(ys)
        np.testing.assert_allclose(props["centroid-0"][k - 1], ys.mean(),
                                   rtol=1e-5)
        np.testing.assert_allclose(props["centroid-1"][k - 1], xs.mean(),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            props["equivalent_diameter"][k - 1],
            np.sqrt(4 * len(ys) / np.pi), rtol=1e-5)
    # padding rows are zero-area
    assert np.all(np.asarray(props["area"][n:]) == 0)


def test_centroid_size_image(rng):
    """vs algorithms.py:561-576 semantics (int(centroid+0.5) placement)."""
    m = _random_mask(rng, (32, 32), 0.25)
    lab, n = label(jnp.asarray(m), connectivity=2)
    img = np.asarray(centroid_size_image(lab, max_labels=256))
    labnp = np.asarray(lab)
    expected = np.zeros_like(img)
    for k in range(1, int(n) + 1):
        ys, xs = np.where(labnp == k)
        cy, cx = int(ys.mean() + 0.5), int(xs.mean() + 0.5)
        expected[cy, cx] = len(ys)
    np.testing.assert_array_equal(img, expected)


def test_quantify_mask_matches_reference_semantics(rng):
    """Fused label->sieve->relabel->props path vs direct numpy port of
    quantify_droplets_batch.py:81-95."""
    from unetdc_tpu.ops.connected_components import quantify_mask

    m = _random_mask(rng, (64, 96), 0.35)
    min_area = 4
    stats = {k: np.asarray(v) for k, v in
             quantify_mask(jnp.asarray(m), jnp.int32(min_area), 2048).items()}

    ref, n0 = ndi.label(m, structure=STRUCT_4)
    assert int(stats["total"]) == n0
    for lv in np.unique(ref):
        if lv and (ref == lv).sum() < min_area:
            ref[ref == lv] = 0
    ref2, n2 = ndi.label(ref > 0, structure=STRUCT_4)
    assert int(stats["count"]) == n2
    for k in range(1, n2 + 1):
        ys, xs = np.where(ref2 == k)
        assert stats["area"][k - 1] == len(ys)
        def tot(axis, i):
            lo = stats[f"sum-{axis}-lo"][i]
            return lo + 256 * stats.get(f"sum-{axis}-hi", np.zeros(1))[
                i if f"sum-{axis}-hi" in stats else 0]
        assert tot(0, k - 1) == ys.sum()
        assert tot(1, k - 1) == xs.sum()
    assert np.all(stats["area"][n2:] == 0)


def test_quantify_mask_large_image_centroids_exact():
    """Regression: coordinate sums on large images must not overflow int32
    (hi/lo byte split) — a 2000x2000 full-frame component has coordinate
    sums ~4e9."""
    from unetdc_tpu.ops.connected_components import quantify_mask

    h = w = 2000
    m = np.ones((h, w), np.uint8)
    stats = quantify_mask(jnp.asarray(m), jnp.int32(1), 16)
    assert int(stats["count"]) == 1
    sum0 = int(stats["sum-0-hi"][0]) * 256 + int(stats["sum-0-lo"][0])
    expected = (h - 1) * h // 2 * w  # sum of row indices over all pixels
    assert sum0 == expected
    assert int(stats["area"][0]) == h * w


def test_remove_objects_beyond_default_cap(rng):
    """>4096 components: remove_objects re-runs at a doubled cap and the
    result matches the EXACT scipy sieve (degrade-to-correct, VERDICT r4
    item 5 — previously components ranked past the cap were conservatively
    kept). Reference is uncapped (algorithms.py:354-367)."""
    from unetdc_tpu.library import remove_objects

    m = np.zeros((160, 160), bool)
    m[::2, ::2] = True  # 6400 single-pixel components
    m[100:110, 100:110] = True  # one 100+px blob
    out = remove_objects(m, 10)

    ref_lab, n = ndi.label(m, structure=np.ones((3, 3)))
    sizes = np.bincount(ref_lab.ravel())
    expected = np.isin(ref_lab, np.nonzero(sizes >= 10)[0][1:])
    np.testing.assert_array_equal(out, expected)


def test_quantify_mask_adaptive_beyond_cap(rng):
    """>cap components: quantify_mask_adaptive re-runs at a doubled cap
    and matches scipy exactly (same rescue the engine applies per batch)."""
    from unetdc_tpu.ops.connected_components import quantify_mask_adaptive

    m = np.zeros((120, 120), np.uint8)
    m[::2, ::2] = 1  # 3600 single-pixel components
    m[50:60, 50:64] = 1  # one large blob
    min_area = 2
    stats = quantify_mask_adaptive(jnp.asarray(m), min_area, max_labels=512)

    ref, n0 = ndi.label(m, structure=STRUCT_4)
    assert int(stats["total"]) == n0
    for lv in range(1, n0 + 1):
        if (ref == lv).sum() < min_area:
            ref[ref == lv] = 0
    ref2, n2 = ndi.label(ref > 0, structure=STRUCT_4)
    assert int(stats["count"]) == n2
    for k in range(1, n2 + 1):
        ys, xs = np.where(ref2 == k)
        assert int(stats["area"][k - 1]) == len(ys)


def test_blob_dog_equal_radii():
    """Regression: DoG with min_radius == max_radius must not crash."""
    from unetdc_tpu.library import blobs_detection

    img = np.zeros((32, 32), np.float32)
    yy, xx = np.mgrid[:32, :32]
    img += np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / (2 * 2.0 ** 2))
    blobs = blobs_detection(img, 2, 3, 3)
    assert blobs is not None  # shape (n, 3); n may be 0


def test_quantify_mask_empty():
    from unetdc_tpu.ops.connected_components import quantify_mask

    z = jnp.zeros((32, 32), jnp.uint8)
    stats = quantify_mask(z, jnp.int32(1), 64)
    assert int(stats["count"]) == 0 and int(stats["total"]) == 0


@pytest.mark.slow
def test_label_fuzz_many_seeds():
    """Fuzz: 20 random masks across densities/shapes/connectivities must
    match scipy exactly (labels AND ordering)."""
    for seed in range(20):
        r = np.random.RandomState(seed)
        h = int(r.randint(8, 70))
        w = int(r.randint(8, 70))
        p = float(r.uniform(0.05, 0.95))
        m = (r.rand(h, w) < p).astype(np.uint8)
        conn = 1 if seed % 2 == 0 else 2
        struct = STRUCT_4 if conn == 1 else STRUCT_8
        ours, n = label(jnp.asarray(m), connectivity=conn)
        ref, n_ref = ndi.label(m, structure=struct)
        assert int(n) == n_ref, (seed, h, w, p)
        np.testing.assert_array_equal(np.asarray(ours), ref,
                                      err_msg=f"seed={seed}")


def test_pallas_props_kernel_matches_segment_sum(rng):
    """The MXU one-hot property-table kernel (ops/pallas_props.py, interpret
    mode on CPU) must reproduce segment_sum exactly — including odd widths
    (row padding), labels beyond CAP (dropped), and the background row."""
    from unetdc_tpu.ops.pallas_props import (CAP, component_tables,
                                             component_tables_reference)

    for b, h, w in [(2, 64, 64), (1, 50, 96), (2, 40, 70)]:
        lab = rng.randint(0, CAP + 140, (b, h, w)).astype(np.int32)
        lab[rng.rand(b, h, w) < 0.5] = 0
        got = np.asarray(component_tables(jnp.asarray(lab), interpret=True))
        ref = np.asarray(component_tables_reference(jnp.asarray(lab)))
        np.testing.assert_array_equal(got, ref, err_msg=f"{b}x{h}x{w}")


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("want_presieve", [False, True])
def test_quantify_table_path_matches_scatter_path(rng, connectivity,
                                                  want_presieve):
    """quantify_mask_batch's Pallas table path (impl='interp' on CPU) must
    produce the exact output dict of the portable scatter path, including
    ragged widths and empty masks."""
    from unetdc_tpu.ops.connected_components import quantify_mask_batch

    masks = np.stack([
        (rng.rand(60, 84) > 0.72).astype(np.uint8),
        np.zeros((60, 84), np.uint8),           # empty image
        (rng.rand(60, 84) > 0.4).astype(np.uint8),
    ])
    for min_area in (1, 3):
        a = quantify_mask_batch(jnp.asarray(masks), jnp.int32(min_area), 256,
                                connectivity=connectivity,
                                want_presieve=want_presieve, impl="scatter")
        b = quantify_mask_batch(jnp.asarray(masks), jnp.int32(min_area), 256,
                                connectivity=connectivity,
                                want_presieve=want_presieve, impl="interp")
        assert set(a.keys()) == set(b.keys())
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_component_areas(rng):
    m = _random_mask(rng, (40, 40), 0.4)
    lab, n = label(jnp.asarray(m))
    areas = np.asarray(component_areas(lab, num_segments=801))
    ref, n_ref = ndi.label(m, structure=STRUCT_4)
    for k in range(1, int(n) + 1):
        assert areas[k] == (ref == k).sum()


def test_quantify_mask_batch_fuzz():
    """Fuzz the fused batched quantify against the scipy reference for
    several seeds/min_areas."""
    from unetdc_tpu.ops.connected_components import quantify_mask_batch

    for seed, min_area in [(0, 1), (1, 3), (2, 7), (3, 2)]:
        r = np.random.RandomState(seed)
        m = (r.rand(3, 40, 56) < r.uniform(0.15, 0.6)).astype(np.uint8)
        stats = quantify_mask_batch(jnp.asarray(m), jnp.int32(min_area), 1024)
        for i in range(3):
            ref, n0 = ndi.label(m[i], structure=STRUCT_4)
            assert int(stats["total"][i]) == n0, (seed, i)
            for lv in np.unique(ref):
                if lv and (ref == lv).sum() < min_area:
                    ref[ref == lv] = 0
            ref2, n2 = ndi.label(ref > 0, structure=STRUCT_4)
            assert int(stats["count"][i]) == n2, (seed, i)
            for k in range(1, n2 + 1):
                ys, xs = np.where(ref2 == k)
                assert int(stats["area"][i][k - 1]) == len(ys)
                assert int(stats["sum-0-lo"][i][k - 1]) == ys.sum()
                assert int(stats["sum-1-lo"][i][k - 1]) == xs.sum()
