"""Run the quantification ops on the reference's real committed predicted
masks (/root/reference/outputs/predicted_masks/*.png) and verify against
scipy on that actual microscopy-derived data."""

import os

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage as ndi

import jax.numpy as jnp

MASK_DIR = "/root/reference/outputs/predicted_masks"

pytestmark = pytest.mark.skipif(not os.path.isdir(MASK_DIR),
                                reason="reference outputs not mounted")

STRUCT_4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)


@pytest.mark.parametrize("fname", ["image17_pred.png", "image153_pred.png"])
def test_quantify_on_real_reference_masks(fname):
    from unetdc_tpu.ops.connected_components import label, quantify_mask

    m = (np.array(Image.open(os.path.join(MASK_DIR, fname))) > 0
         ).astype(np.uint8)
    assert m.shape == (512, 512)

    ref_lab, n_ref = ndi.label(m, structure=STRUCT_4)
    ours_lab, n = label(jnp.asarray(m))
    assert int(n) == n_ref
    np.testing.assert_array_equal(np.asarray(ours_lab), ref_lab)

    stats = quantify_mask(jnp.asarray(m), jnp.int32(5), 4096)
    kept = [k for k in range(1, n_ref + 1) if (ref_lab == k).sum() >= 5]
    assert int(stats["count"]) == len(kept)
    for out_i, k in enumerate(kept):
        ys, xs = np.where(ref_lab == k)
        assert int(stats["area"][out_i]) == len(ys)
        def tot(axis, i):
            lo = int(stats[f"sum-{axis}-lo"][i])
            hi = stats.get(f"sum-{axis}-hi")
            return lo if hi is None else lo + 256 * int(hi[i])
        assert tot(0, out_i) == ys.sum()
        assert tot(1, out_i) == xs.sum()
