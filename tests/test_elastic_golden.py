"""Frozen-golden regression pin for the elastic transform (VERDICT r2
item 9). albumentations is not installed, so the documented >=1.4 semantics
(data/augment.py:13-17) have no external oracle; this pins the exact
displacement-field synthesis (both the full-resolution and coarse-grid
paths) and the sub-pixel remap outputs against constants computed once, so
the behavior cannot drift silently. Regenerate deliberately (only after a
reviewed semantic change) with the recipe in this file's git history.

Match: /root/reference/train_DC_focal.py:188 (ElasticTransform(alpha=1,
sigma=50, p=0.3))."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from unetdc_tpu.data.augment import _elastic_displacement, _remap_subpixel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "elastic_golden.npz")


def test_elastic_displacement_matches_golden():
    g = np.load(GOLDEN)
    dy, dx = _elastic_displacement(jax.random.PRNGKey(1234), (48, 48),
                                   alpha=1.0, sigma=50.0)
    # tolerance: allow compiler-level ulp churn across XLA releases while
    # catching any semantic change (field values are O(1e-3..1e-1))
    np.testing.assert_allclose(np.asarray(dy), g["small_dy"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), g["small_dx"], atol=1e-6)

    dy2, dx2 = _elastic_displacement(jax.random.PRNGKey(5678), (256, 256),
                                     alpha=1.0, sigma=50.0)
    np.testing.assert_allclose(np.asarray(dy2), g["big_dy"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx2), g["big_dx"], atol=1e-6)


def test_elastic_warp_matches_golden():
    g = np.load(GOLDEN)
    dy = jnp.asarray(g["small_dy"])
    dx = jnp.asarray(g["small_dx"])
    img = jnp.asarray(g["img"])
    mask = jnp.asarray(g["mask"])
    warp_img = _remap_subpixel(img, dy, dx, nearest=False)
    warp_mask = _remap_subpixel(mask, dy, dx, nearest=True)
    np.testing.assert_allclose(np.asarray(warp_img), g["warp_img"],
                               atol=1e-6)
    # nearest-path mask warp is a pure selection: must be exact
    np.testing.assert_array_equal(np.asarray(warp_mask), g["warp_mask"])
