"""ROI-mask generation ops for the heatmap pipelines.

Parity targets: quantify_pipline.py:44-51 (`generate_roi_mask`: gray ->
15x15 Gaussian blur -> Otsu -> 15x15 box close/open) and :133-135 (image
moments centroid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from unetdc_tpu.ops.filters import gaussian_blur
from unetdc_tpu.ops.morphology import morph_close, morph_open
from unetdc_tpu.ops.threshold import otsu_threshold


@jax.jit
def rgb2gray_cv2(img_rgb_u8: jax.Array) -> jax.Array:
    """cv2.cvtColor(..., COLOR_RGB2GRAY) fixed-point arithmetic
    ((R*4899 + G*9617 + B*1868 + 8192) >> 14). NOTE: cv2 5.0's SIMD path
    rounds slightly differently (measured ±1 gray level on ~0.2% of random
    pixels); downstream Otsu/contour thresholds tolerate this."""
    r = img_rgb_u8[..., 0].astype(jnp.int32)
    g = img_rgb_u8[..., 1].astype(jnp.int32)
    b = img_rgb_u8[..., 2].astype(jnp.int32)
    return ((r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
            ).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("blur_kernel",))
def generate_roi_mask(img_rgb_u8: jax.Array, blur_kernel: int = 15
                      ) -> jax.Array:
    """quantify_pipline.py:44-51 -> uint8 0/1 ROI mask."""
    gray = rgb2gray_cv2(img_rgb_u8)
    blurred = jnp.clip(jnp.rint(gaussian_blur(gray, blur_kernel, 0.0)),
                       0, 255).astype(jnp.uint8)
    t = otsu_threshold(blurred)
    mask = (blurred.astype(jnp.int32) > t).astype(jnp.float32) * 255.0
    kern = np.ones((15, 15), np.uint8)
    mask = morph_open(morph_close(mask, kern), kern)
    return (mask > 0).astype(jnp.uint8)


@jax.jit
def moments_centroid(mask: jax.Array):
    """cv2.moments centroid with the reference's int() truncation and
    center fallback (quantify_pipline.py:133-135). Returns (cy, cx) int32."""
    h, w = mask.shape
    m = (mask > 0).astype(jnp.int32)
    m00 = m.sum()
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m10 = jnp.sum(m * xx)
    m01 = jnp.sum(m * yy)
    cx = jnp.where(m00 > 0, m10 // jnp.maximum(m00, 1), w // 2)
    cy = jnp.where(m00 > 0, m01 // jnp.maximum(m00, 1), h // 2)
    return cy.astype(jnp.int32), cx.astype(jnp.int32)
