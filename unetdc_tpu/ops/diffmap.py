"""Difference maps, overlays and color-region counting — the test-phase
visualization suite of the reference trainer (train_DC_focal.py:42-131),
computed on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unetdc_tpu.ops.connected_components import label

YELLOW = (255, 255, 0)   # TP
GREEN = (0, 255, 0)      # FP (only predicted)
RED = (255, 0, 0)        # FN (only true)


@jax.jit
def create_difference_map(true_mask: jax.Array, pred_mask: jax.Array
                          ) -> jax.Array:
    """(H, W) binary masks -> (H, W, 3) uint8 RGB: yellow=TP, red=FN,
    green=FP, black=TN (train_DC_focal.py:42-77)."""
    t = (true_mask > 0)
    p = (pred_mask > 0)
    common = t & p
    only_pred = p & ~t
    only_true = t & ~p
    h, w = t.shape
    out = jnp.zeros((h, w, 3), jnp.uint8)
    out = jnp.where(common[..., None], jnp.asarray(YELLOW, jnp.uint8), out)
    out = jnp.where(only_pred[..., None], jnp.asarray(GREEN, jnp.uint8), out)
    out = jnp.where(only_true[..., None], jnp.asarray(RED, jnp.uint8), out)
    return out


@jax.jit
def overlay_difference(original_img: jax.Array, diff_map: jax.Array
                       ) -> jax.Array:
    """Non-black diff pixels replace the original (train_DC_focal.py:78-86)."""
    non_black = jnp.any(diff_map != 0, axis=-1, keepdims=True)
    return jnp.where(non_black, diff_map, original_img)


def count_color_regions(diff_map_rgb: jax.Array) -> dict:
    """Count 8-connected blobs per diff color (train_DC_focal.py:92-131:
    thresholded channel masks + cv2.connectedComponentsWithStats
    connectivity=8). Returns python ints."""
    r = diff_map_rgb[..., 0].astype(jnp.int32)
    g = diff_map_rgb[..., 1].astype(jnp.int32)
    b = diff_map_rgb[..., 2].astype(jnp.int32)
    masks = {
        "yellow_blobs": (r > 200) & (g > 200) & (b < 50),   # TP
        "red_blobs": (r > 200) & (g < 50) & (b < 50),       # FN
        "green_blobs": (r < 50) & (g > 200) & (b < 50),     # FP
        "black_blobs": (r < 50) & (g < 50) & (b < 50),      # TN
    }
    return {k: int(label(m, connectivity=2)[1]) for k, m in masks.items()}
