"""Rolling-ball background correction, on device.

Parity target: `rolling_ball_correction_rgb` (utils/data_loader.py:11-24) —
per RGB channel: morphological opening with
cv2.getStructuringElement(MORPH_ELLIPSE, (radius, radius)) (note: the cv2
argument is the kernel SIZE, not a radius), saturating subtract of the
background, then min-max normalization to [0, 255].

This is the per-image preprocessing hot loop of the reference (host OpenCV,
quantify_droplets_batch.py:43); here it runs as windowed min/max reduce ops
on TPU, fused into the inference megastep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unetdc_tpu.ops.morphology import ellipse_kernel, morph_open


def normalize_minmax_u8(x: jax.Array) -> jax.Array:
    """cv2.normalize(..., 0, 255, NORM_MINMAX) on uint8-domain data:
    scale = 255/(max-min) (0 if max==min), out = round_half_even(v*scale+shift).
    """
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf)
    mx = jnp.max(xf)
    span = mx - mn
    scale = jnp.where(span > 1e-12, 255.0 / span, 0.0)
    y = (xf - mn) * scale
    return jnp.clip(jnp.rint(y), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("radius",))
def rolling_ball_correction_rgb(image: jax.Array, radius: int = 50) -> jax.Array:
    """Background-correct an (H, W, 3) uint8 RGB image.

    Matches the reference bit-for-bit up to float rounding: opening with the
    exact cv2 ellipse footprint, cv2.subtract saturation (a no-op here since
    opening <= image pointwise), NORM_MINMAX per channel.
    """
    kernel = ellipse_kernel(radius)

    def one_channel(ch):
        background = morph_open(ch, kernel)
        corrected = jnp.maximum(ch.astype(jnp.float32) - background, 0.0)
        return normalize_minmax_u8(corrected)

    chans = [one_channel(image[..., c]) for c in range(image.shape[-1])]
    return jnp.stack(chans, axis=-1)
