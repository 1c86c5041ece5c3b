"""Thresholding ops: Otsu (cv2.THRESH_OTSU parity) and two-threshold
hysteresis segmentation.

Reference call sites: quantify_pipline.py:47 (Otsu on blurred grayscale for
the ROI mask), algorithms.py:83-95 (segmentation_two_thresholds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unetdc_tpu.ops.morphology import binary_dilation3x3


@jax.jit
def otsu_threshold(img_u8: jax.Array) -> jax.Array:
    """Otsu threshold of a uint8 image, matching cv2's getThreshVal_Otsu_8u:
    maximize between-class variance q1*q2*(mu1-mu2)^2 over t in 0..255,
    skipping t where either class is (near-)empty; first maximum wins.
    Returns the int32 threshold value t (binarize with img > t).
    """
    flat = img_u8.astype(jnp.int32).reshape(-1)
    hist = jnp.zeros(256, jnp.float32).at[flat].add(1.0)
    n = flat.shape[0]
    p = hist / n
    i = jnp.arange(256, dtype=jnp.float32)
    omega = jnp.cumsum(p)             # q1 at each threshold t (class = <= t)
    mu_t = jnp.cumsum(p * i)
    mu_total = mu_t[-1]
    q1 = omega
    q2 = 1.0 - omega
    valid = (q1 > 1e-7) & (q2 > 1e-7)
    mu1 = jnp.where(valid, mu_t / jnp.maximum(q1, 1e-12), 0.0)
    mu2 = jnp.where(valid, (mu_total - mu_t) / jnp.maximum(q2, 1e-12), 0.0)
    sigma = jnp.where(valid, q1 * q2 * (mu1 - mu2) ** 2, -jnp.inf)
    return jnp.argmax(sigma).astype(jnp.int32)


@jax.jit
def otsu_binarize(img_u8: jax.Array) -> jax.Array:
    """cv2.threshold(img, 0, 255, THRESH_BINARY + THRESH_OTSU) -> bool mask
    (dst = img > t)."""
    t = otsu_threshold(img_u8)
    return img_u8.astype(jnp.int32) > t


@jax.jit
def segmentation_two_thresholds(image: jax.Array, thresh1, thresh2) -> jax.Array:
    """Hysteresis-like segmentation (algorithms.py:83-95): dilate(img >=
    thresh1, 3x3) & (img >= thresh2)."""
    m1 = image >= thresh1
    m2 = image >= thresh2
    return binary_dilation3x3(m1) & m2
