"""Numerical oracles for the blob detectors (VERDICT r2 item 4).

Parity target: /root/reference/algorithms.py:116-138 (`blobs_detection`,
wrapping skimage blob_log/blob_dog/blob_doh). skimage is not installed, so
each stage is pinned against an INDEPENDENT brute-force implementation of
the published definitions:

  - response cubes vs scipy.ndimage C kernels (true gaussian_laplace /
    Gaussian Hessian / difference-of-Gaussians) in float64;
  - 3D local-maximum extraction vs a triple-loop numpy implementation;
  - pairwise overlap pruning vs an independently-written lens-area rule;
  - end-to-end detections vs a fully-independent oracle detector on
    structured images across sigma ranges.

Note blob_doh: skimage approximates the Hessian determinant with
integral-image box filters (SURF-style); ops/blobs.py implements the exact
Gaussian-derivative operator, so the oracle here is scipy's exact math, not
skimage's approximation (divergence-by-design, ops/blobs.py:_doh_cube).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage as ndi

from unetdc_tpu.ops.blobs import (_disk_overlap_fraction, _dog_cube,
                                  _doh_cube, _local_maxima_3d, _log_cube,
                                  _prune_overlap, blob_dog, blob_doh,
                                  blob_log)


def _planted_image(rng, shape=(72, 72), n=3, sig_range=(2.0, 5.0)):
    """Well-separated Gaussian bumps with strong amplitudes: every true
    scale-space peak is far from detection thresholds, so f32-vs-f64
    arithmetic cannot flip a detection."""
    h, w = shape
    img = np.zeros(shape, np.float64)
    yy, xx = np.mgrid[:h, :w]
    centers = []
    for _ in range(n):
        for _try in range(100):
            cy = rng.randint(12, h - 12)
            cx = rng.randint(12, w - 12)
            if all((cy - a) ** 2 + (cx - b) ** 2 > 24 ** 2
                   for a, b in centers):
                break
        centers.append((cy, cx))
        s = rng.uniform(*sig_range)
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return img.astype(np.float32)


# ---------------------------------------------------------------- cubes


@pytest.mark.parametrize("sigmas", [(1.0, 2.0, 3.5), (1.5, 4.0, 8.0)])
def test_log_cube_matches_scipy_gaussian_laplace(rng, sigmas):
    img = rng.rand(50, 61).astype(np.float32)
    ours = np.asarray(_log_cube(jnp.asarray(img), sigmas))
    for i, s in enumerate(sigmas):
        ref = -ndi.gaussian_laplace(img.astype(np.float64), s,
                                    mode="reflect") * s ** 2
        np.testing.assert_allclose(ours[i], ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sigmas", [(1.0, 2.0, 4.0), (2.0, 3.2, 5.12, 8.192)])
def test_dog_cube_matches_scipy(rng, sigmas):
    img = rng.rand(48, 57).astype(np.float32)
    ours = np.asarray(_dog_cube(jnp.asarray(img), sigmas))
    f64 = img.astype(np.float64)
    for i in range(len(sigmas) - 1):
        g1 = ndi.gaussian_filter(f64, sigmas[i], mode="reflect")
        g2 = ndi.gaussian_filter(f64, sigmas[i + 1], mode="reflect")
        ref = (g1 - g2) * (sigmas[i] / (sigmas[i + 1] - sigmas[i]))
        np.testing.assert_allclose(ours[i], ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sigmas", [(1.5, 3.0), (2.0, 4.0, 6.0)])
def test_doh_cube_matches_scipy_hessian(rng, sigmas):
    img = rng.rand(40, 52).astype(np.float32)
    ours = np.asarray(_doh_cube(jnp.asarray(img), sigmas))
    f64 = img.astype(np.float64)
    for i, s in enumerate(sigmas):
        dyy = ndi.gaussian_filter(f64, s, order=(2, 0), mode="reflect")
        dxx = ndi.gaussian_filter(f64, s, order=(0, 2), mode="reflect")
        dxy = ndi.gaussian_filter(f64, s, order=(1, 1), mode="reflect")
        ref = (dxx * dyy - dxy ** 2) * s ** 4
        np.testing.assert_allclose(ours[i], ref, rtol=5e-4, atol=2e-6)


# --------------------------------------------------------- local maxima


def _brute_local_maxima_3d(cube, threshold):
    """Triple-loop oracle: strictly above threshold AND >= every 3x3x3
    neighbor (plateaus report every member, like the implementation)."""
    S, H, W = cube.shape
    out = []
    for s in range(S):
        for y in range(H):
            for x in range(W):
                v = cube[s, y, x]
                if not v > threshold:
                    continue
                ok = True
                for ds in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            s2, y2, x2 = s + ds, y + dy, x + dx
                            if (0 <= s2 < S and 0 <= y2 < H and 0 <= x2 < W
                                    and cube[s2, y2, x2] > v):
                                ok = False
                if ok:
                    out.append((s, y, x))
    return np.array(sorted(out)).reshape(-1, 3)


def test_local_maxima_3d_matches_brute_force(rng):
    # coarse-quantized cube => plateau ties exercised
    cube = np.round(rng.rand(4, 12, 14) * 8) / 8.0
    ours = _local_maxima_3d(cube, 0.25)
    ref = _brute_local_maxima_3d(cube, 0.25)
    np.testing.assert_array_equal(
        np.array(sorted(map(tuple, ours))).reshape(-1, 3), ref)


# ------------------------------------------------------------- pruning


def _lens_area(d, r1, r2):
    """Independent circle-intersection area (standard lens formula written
    from scratch, not via _disk_overlap_fraction's cos^-1 arrangement)."""
    if d >= r1 + r2:
        return 0.0
    if d <= abs(r1 - r2):
        return math.pi * min(r1, r2) ** 2
    d1 = (d * d - r2 * r2 + r1 * r1) / (2 * d)
    d2 = d - d1
    a1 = r1 * r1 * math.acos(max(-1, min(1, d1 / r1))) - d1 * math.sqrt(
        max(0.0, r1 * r1 - d1 * d1))
    a2 = r2 * r2 * math.acos(max(-1, min(1, d2 / r2))) - d2 * math.sqrt(
        max(0.0, r2 * r2 - d2 * d2))
    return a1 + a2


def test_disk_overlap_fraction_matches_lens_formula(rng):
    for _ in range(200):
        r1, r2 = rng.uniform(0.5, 8, 2)
        d = rng.uniform(0, 10)
        ref = _lens_area(d, r1, r2) / (math.pi * min(r1, r2) ** 2)
        ours = _disk_overlap_fraction(d, r1, r2)
        assert abs(ours - ref) < 1e-9, (d, r1, r2)


def _brute_prune(blobs, overlap=0.5):
    """Independent pairwise pruning oracle (same visit order as skimage's
    itertools.combinations loop: kill the smaller-radius blob)."""
    blobs = [list(b) for b in blobs]
    n = len(blobs)
    for i in range(n):
        for j in range(i + 1, n):
            bi, bj = blobs[i], blobs[j]
            if bi[2] == 0 or bj[2] == 0:
                continue
            r1, r2 = bi[2] * math.sqrt(2), bj[2] * math.sqrt(2)
            d = math.hypot(bi[0] - bj[0], bi[1] - bj[1])
            frac = (_lens_area(d, r1, r2) / (math.pi * min(r1, r2) ** 2)
                    if r1 > 0 and r2 > 0 else 0.0)
            if frac > overlap:
                if bi[2] > bj[2]:
                    bj[2] = 0
                else:
                    bi[2] = 0
    return np.array([b[:3] for b in blobs if b[2] > 0]).reshape(-1, 3)


def test_prune_overlap_matches_brute_force(rng):
    for _ in range(20):
        n = rng.randint(0, 12)
        blobs = np.column_stack([
            rng.uniform(0, 40, n), rng.uniform(0, 40, n),
            rng.uniform(0.5, 6, n), rng.uniform(0, 1, n)])
        ours = _prune_overlap(blobs.copy())
        ref = _brute_prune(blobs[:, :3])
        np.testing.assert_allclose(ours, ref)


# -------------------------------------------------------- end-to-end


def _oracle_log(img, min_sigma, max_sigma, num_sigma, threshold):
    sigmas = np.linspace(min_sigma, max_sigma, num_sigma)
    cube = np.stack([-ndi.gaussian_laplace(img.astype(np.float64), s,
                                           mode="reflect") * s ** 2
                     for s in sigmas])
    peaks = _brute_local_maxima_3d(cube, threshold)
    rows = [(y, x, sigmas[s]) for s, y, x in peaks]
    return _brute_prune(rows)


def _oracle_dog(img, min_sigma, max_sigma, sigma_ratio, threshold):
    sigmas = [float(min_sigma)]
    while sigmas[-1] < max_sigma:
        sigmas.append(sigmas[-1] * sigma_ratio)
    if len(sigmas) < 2:
        sigmas.append(sigmas[-1] * sigma_ratio)
    f64 = img.astype(np.float64)
    gs = [ndi.gaussian_filter(f64, s, mode="reflect") for s in sigmas]
    cube = np.stack([(gs[i] - gs[i + 1])
                     * (sigmas[i] / (sigmas[i + 1] - sigmas[i]))
                     for i in range(len(sigmas) - 1)])
    peaks = _brute_local_maxima_3d(cube, threshold)
    rows = [(y, x, sigmas[s]) for s, y, x in peaks]
    return _brute_prune(rows)


def _oracle_doh(img, min_sigma, max_sigma, num_sigma, threshold):
    sigmas = np.linspace(min_sigma, max_sigma, num_sigma)
    f64 = img.astype(np.float64)
    layers = []
    for s in sigmas:
        dyy = ndi.gaussian_filter(f64, s, order=(2, 0), mode="reflect")
        dxx = ndi.gaussian_filter(f64, s, order=(0, 2), mode="reflect")
        dxy = ndi.gaussian_filter(f64, s, order=(1, 1), mode="reflect")
        layers.append((dxx * dyy - dxy ** 2) * s ** 4)
    peaks = _brute_local_maxima_3d(np.stack(layers), threshold)
    rows = [(y, x, sigmas[s]) for s, y, x in peaks]
    return _brute_prune(rows)


def _rows_equal(ours, ref):
    ours = np.array(sorted(map(tuple, np.round(np.asarray(ours, float), 6))))
    ref = np.array(sorted(map(tuple, np.round(np.asarray(ref, float), 6))))
    np.testing.assert_allclose(ours.reshape(-1, 3), ref.reshape(-1, 3),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("seed,smin,smax,nsig", [
    (0, 1.0, 6.0, 6), (1, 2.0, 8.0, 7), (2, 1.5, 5.0, 8)])
def test_blob_log_end_to_end_matches_oracle(seed, smin, smax, nsig):
    rng = np.random.RandomState(seed)
    img = _planted_image(rng)
    ours = blob_log(img, min_sigma=smin, max_sigma=smax, num_sigma=nsig,
                    threshold=0.05)
    ref = _oracle_log(img, smin, smax, nsig, 0.05)
    assert len(ref) >= 2  # the oracle itself must detect the planted blobs
    _rows_equal(ours, ref)


@pytest.mark.parametrize("seed,smin,smax,ratio", [
    (3, 1.0, 8.0, 1.6), (4, 1.5, 10.0, 1.4)])
def test_blob_dog_end_to_end_matches_oracle(seed, smin, smax, ratio):
    rng = np.random.RandomState(seed)
    img = _planted_image(rng)
    ours = blob_dog(img, min_sigma=smin, max_sigma=smax, sigma_ratio=ratio,
                    threshold=0.02)
    ref = _oracle_dog(img, smin, smax, ratio, 0.02)
    assert len(ref) >= 2
    _rows_equal(ours, ref)


@pytest.mark.parametrize("seed,smin,smax,nsig", [
    (5, 2.0, 8.0, 7), (6, 1.5, 6.0, 10)])
def test_blob_doh_end_to_end_matches_oracle(seed, smin, smax, nsig):
    rng = np.random.RandomState(seed)
    img = _planted_image(rng, sig_range=(2.5, 5.0))
    ours = blob_doh(img, min_sigma=smin, max_sigma=smax, num_sigma=nsig,
                    threshold=1e-4)
    ref = _oracle_doh(img, smin, smax, nsig, 1e-4)
    assert len(ref) >= 2
    _rows_equal(ours, ref)


def test_gaussian_derivative_matches_scipy_orders(rng):
    """The separable derivative filter itself, every order pair the
    detectors use, non-square image."""
    from unetdc_tpu.ops.filters import gaussian_derivative_scipy

    img = rng.rand(33, 47).astype(np.float32)
    for s in (1.0, 2.7, 5.0):
        for oy, ox in [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2)]:
            ref = ndi.gaussian_filter(img.astype(np.float64), s,
                                      order=(oy, ox), mode="reflect")
            ours = np.asarray(gaussian_derivative_scipy(
                jnp.asarray(img), s, oy, ox))
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6,
                                       err_msg=f"s={s} order=({oy},{ox})")


# ------------------------------------------- approximate (SURF box) DoH
def _integ_np(S, r, c, rl, cl):
    """Clamped integral-image box term, transliterating the host-side
    algorithm skimage's _hessian_det_appx uses (SURF box sums over the
    inclusive integral image with per-corner index clamping and a
    max(0, .) floor)."""
    H, W = S.shape
    r0 = min(max(r, 0), H - 1)
    c0 = min(max(c, 0), W - 1)
    r2 = min(max(r + rl, 0), H - 1)
    c2 = min(max(c + cl, 0), W - 1)
    return max(0.0, S[r0, c0] + S[r2, c2] - S[r0, c2] - S[r2, c0])


def _hessian_det_appx_np(img, sigma):
    """Direct (slow, per-pixel loop) numpy oracle of the SURF box-filter
    Hessian determinant: det = dxx*dyy - 0.81*dxy^2 with filter size
    3*sigma, lobe size//3, normalization 1/size^2."""
    S = np.cumsum(np.cumsum(np.asarray(img, np.float64), 0), 1)
    H, W = S.shape
    size = int(3.0 * sigma)
    s2 = (size - 1) // 2
    s3 = size // 3
    w_i = 1.0 / (size * size)
    out = np.zeros((H, W))
    for r in range(H):
        for c in range(W):
            tl = _integ_np(S, r - s3, c - s3, s3, s3)
            br = _integ_np(S, r + 1, c + 1, s3, s3)
            bl = _integ_np(S, r + 1, c - s3, s3, s3)
            tr = _integ_np(S, r - s3, c + 1, s3, s3)
            dxy = (bl + tr - tl - br) * w_i
            mid = _integ_np(S, r - s3 + 1, c - s2, 2 * s3 - 1, size)
            side = _integ_np(S, r - s3 + 1, c - s3 // 2, 2 * s3 - 1, s3)
            dxx = (mid - 3.0 * side) * w_i
            mid = _integ_np(S, r - s2, c - s3 + 1, size, 2 * s3 - 1)
            side = _integ_np(S, r - s3 // 2, c - s3 + 1, s3, 2 * s3 - 1)
            dyy = (mid - 3.0 * side) * w_i
            out[r, c] = dxx * dyy - 0.81 * dxy * dxy
    return out


def test_doh_cube_approx_matches_numpy_transliteration(rng):
    """The device SURF box-filter cube == the per-pixel numpy
    transliteration (edge-padded slices == index clamping)."""
    from unetdc_tpu.ops.blobs import _doh_cube_approx

    img = rng.rand(40, 52).astype(np.float32)
    sigmas = (2.0, 3.0, 5.0)
    got = np.asarray(_doh_cube_approx(jnp.asarray(img), sigmas))
    for i, s in enumerate(sigmas):
        ref = _hessian_det_appx_np(img, s)
        np.testing.assert_allclose(got[i], ref, rtol=2e-4, atol=2e-6,
                                   err_msg=f"sigma {s}")


def test_blob_doh_exact_vs_approx_divergence_envelope():
    """VERDICT r3 item 7 'done' criterion — NUMBERS, not prose, for the
    exact-Hessian vs SURF-box divergence. MEASURED envelope (seeds 0/3/8
    structured, 1/2 noise; this test pins it):

    - structured (planted Gaussian bumps, the reference's DoH regime):
      detection sets match BLOB-FOR-BLOB; matched centers all at d = 1.41
      px (a constant (1,1) diagonal shift from the box filters' half-open
      grid), and the approx detector's selected sigma is consistently
      1.5-2x the exact one (exact 3->approx 5-6, exact 4->approx 7): the
      box construction's scale response is biased coarse. Callers reading
      radii off skimage-family blob_doh inherit that bias; the exact
      detector does not have it.
    - unstructured noise: exact finds ~3x more (weaker, finer) peaks than
      the smoother box response; detection-set Jaccard measured
      0.21 / 0.26 at 3 px matching."""
    from unetdc_tpu.ops.blobs import blob_doh

    def match_sets(a, b, max_d):
        used = set()
        pairs = []
        for i, (y, x, s) in enumerate(a):
            best = None
            for j, (y2, x2, s2) in enumerate(b):
                if j in used:
                    continue
                d = math.hypot(y - y2, x - x2)
                if d <= max_d and (best is None or d < best[0]):
                    best = (d, j)
            if best is not None:
                used.add(best[1])
                pairs.append((i, best[1]))
        return pairs

    # structured: planted bumps with known centers
    for seed in (0, 3, 8):
        r = np.random.RandomState(seed)
        img = _planted_image(r, n=3, sig_range=(2.5, 4.5))
        kw = dict(min_sigma=2.0, max_sigma=8.0, num_sigma=7, threshold=0.005)
        exact = blob_doh(img, **kw)
        approx = blob_doh(img, approximate=True, **kw)
        assert len(exact) >= 3 and len(approx) >= 3, (seed, exact, approx)
        pairs = match_sets(exact, approx, max_d=2.0)
        # every planted bump detected by BOTH, centers within 2 px
        assert len(pairs) == min(len(exact), len(approx)) >= 3, \
            (seed, exact, approx)
        for i, j in pairs:
            ratio = approx[j, 2] / exact[i, 2]
            assert 1.2 <= ratio <= 2.4, \
                (seed, exact[i], approx[j])  # measured coarse-scale bias

    # unstructured noise: quantified overlap, not equality
    jaccards = []
    for seed in (1, 2):
        r = np.random.RandomState(seed)
        img = ndi.gaussian_filter(r.rand(72, 72), 1.0).astype(np.float32)
        kw = dict(min_sigma=2.0, max_sigma=6.0, num_sigma=5,
                  threshold=1e-6)
        exact = blob_doh(img, **kw)
        approx = blob_doh(img, approximate=True, **kw)
        pairs = match_sets(exact, approx, max_d=3.0)
        union = len(exact) + len(approx) - len(pairs)
        jaccards.append(len(pairs) / max(union, 1))
        # the box response is smoother: far fewer noise peaks
        assert len(approx) < len(exact)
    print(f"doh exact-vs-approx noise jaccards: {jaccards}")
    assert min(jaccards) >= 0.15, jaccards  # measured 0.21 / 0.26
