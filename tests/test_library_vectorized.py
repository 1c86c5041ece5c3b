"""Behavior-identity pins for the vectorized library glue (VERDICT r2
item 7): each function is compared against a straight transliteration of
the reference's O(labels x dots) loops (algorithms.py:188-238,545-612),
including the quirks — python-set iteration order in sieve_labels, the
dropped last label in the mean_*_size family, np.unique ordering and
np.mean numerics in the centroid family."""

import numpy as np
import pytest

import unetdc_tpu.library as L


# ---- transliterations of the reference loops (oracles) ------------------


def _ref_sieve_labels(dots, labels, sieve_size):
    sieved_dots, sieved_labels = [], []
    latest = 1
    for lab in set(labels):
        coords = [dots[i] for i in range(len(labels)) if labels[i] == lab]
        if len(coords) > sieve_size:
            sieved_dots.extend(coords)
            sieved_labels.extend([latest] * len(coords))
            latest += 1
    return sieved_dots, sieved_labels


def _ref_sizes(labels):
    nb = max(labels)
    return [labels.count(i) for i in range(1, nb)]


def _ref_centroids_sizes(dots, labels):
    out = []
    for lab in np.unique(labels):
        coords = np.asarray([dots[i] for i in range(len(labels))
                             if labels[i] == lab], np.float64)
        c = coords.mean(axis=0)
        out.append([c[0], c[1], len(coords)])
    return np.array(out)


def _random_dots_labels(rng, n, k, shuffled=True):
    labels = [int(v) for v in rng.randint(1, k + 1, n)]
    # labeling contract: labels are 1..max with every value present
    present = sorted(set(labels))
    remap = {lab: i + 1 for i, lab in enumerate(present)}
    labels = [remap[lab] for lab in labels]
    dots = [[int(y), int(x)] for y, x in rng.randint(0, 64, (n, 2))]
    return dots, labels


@pytest.mark.parametrize("n,k,sieve", [(0, 1, 0), (40, 5, 2), (300, 40, 4),
                                       (1000, 200, 1)])
def test_sieve_labels_matches_reference_loop(rng, n, k, sieve):
    dots, labels = _random_dots_labels(rng, n, k)
    ours = L.sieve_labels(dots, labels, sieve)
    ref = _ref_sieve_labels(dots, labels, sieve)
    assert ours == ref


def test_sieve_labels_set_order_quirk(rng):
    """Large hash-colliding label values: set order != sorted order; both
    implementations must agree because both iterate set(labels)."""
    labels = []
    for lab in (1, 9, 17, 2, 33, 65, 129):  # collide mod 8
        labels += [lab] * 3
    dots = [[i, i] for i in range(len(labels))]
    assert L.sieve_labels(dots, labels, 1) == _ref_sieve_labels(dots, labels, 1)


@pytest.mark.parametrize("n,k", [(30, 4), (500, 60), (2000, 300)])
def test_size_family_matches_reference_loop(rng, n, k):
    _, labels = _random_dots_labels(rng, n, k)
    nb = max(labels)
    ref_sizes = _ref_sizes(labels)
    if nb < 2:  # empty sizes -> np.mean warning path; reference identical
        return
    assert (L.mean_SD_size(labels)
            == (round(np.mean(ref_sizes), 2), round(np.std(ref_sizes), 2)))
    assert (L.mean_median_size(labels)
            == (round(np.mean(ref_sizes), 2),
                round(np.median(ref_sizes), 2)))
    m, med, mn, mx, sizes = L.mean_median_min_max_size(labels)
    assert sizes == ref_sizes  # incl. the dropped-last-label quirk
    assert (m, med, mn, mx) == (round(np.mean(ref_sizes), 2),
                                round(np.median(ref_sizes), 2),
                                round(np.min(ref_sizes), 2),
                                round(np.max(ref_sizes), 2))


@pytest.mark.parametrize("n,k", [(1, 1), (50, 7), (800, 120)])
def test_centroid_family_matches_reference_loop(rng, n, k):
    dots, labels = _random_dots_labels(rng, n, k)
    ref = _ref_centroids_sizes(dots, labels)
    ours = L.calculate_centroids_sizes(dots, labels)
    np.testing.assert_array_equal(ours, ref)  # bit-identical np.mean path

    np.testing.assert_array_equal(L.calculate_centroids(dots, labels),
                                  ref[:, :2])

    img = np.zeros((64, 64), np.uint8)
    ref_img = np.zeros((64, 64), np.uint16)
    for cy, cx, sz in ref:
        ref_img[int(cy + 0.5), int(cx + 0.5)] = sz
    np.testing.assert_array_equal(
        L.calculate_centroids_sizes_image(dots, labels, img), ref_img)

    cents, dtoc = L.calculate_blobs_centroids_and_DTOC(dots, labels, 10.0,
                                                      20.0)
    np.testing.assert_array_equal(cents, ref[:, :2])
    ref_dtoc = np.sqrt((ref[:, 0] - 20.0) ** 2 + (ref[:, 1] - 10.0) ** 2)
    assert dtoc == ref_dtoc.tolist()


def test_centroid_family_empty():
    assert L.calculate_centroids_sizes([], []).size == 0
    assert L.calculate_centroids([], []).size == 0
    assert L.calculate_blobs_centroids_and_DTOC([], [], 0, 0) == ([], [])
    out = L.calculate_centroids_sizes_image([], [], np.zeros((8, 8)))
    assert out.shape == (8, 8) and not out.any()


def test_labeling_custom_matches_per_dot_indexing(rng):
    from unetdc_tpu.ops.connected_components import label as _label
    import jax.numpy as jnp

    m = (rng.rand(48, 48) > 0.5).astype(np.uint8)
    dots = L.binary_to_dots(m)
    lab = np.asarray(_label(jnp.asarray(m), connectivity=2)[0])
    ref = [int(lab[d[0]][d[1]]) for d in dots]
    assert L.labeling_custom(m, dots) == ref
    assert L.labeling_custom(m, []) == []


def test_sieve_labels_scale_smoke():
    """The r2 implementation was O(labels x dots); 20k dots x 2k labels now
    completes in well under a second (regression guard, loose bound)."""
    import time

    r = np.random.RandomState(0)
    labels = [int(v) for v in r.randint(1, 2000, 20000)]
    dots = [[int(y), int(x)] for y, x in r.randint(0, 512, (20000, 2))]
    t0 = time.time()
    L.sieve_labels(dots, labels, 3)
    L.calculate_centroids_sizes(dots, labels)
    assert time.time() - t0 < 5.0
