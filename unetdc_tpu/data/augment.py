"""JAX-native training augmentations, PRNG-keyed and fully batched.

Parity target: the albumentations pipeline of train_DC_focal.py:183-190 /
train.py:86-93:
    HorizontalFlip(p=0.5), VerticalFlip(p=0.2), RandomRotate90(p=0.5),
    RandomBrightnessContrast(p=0.2), ElasticTransform(alpha=1, sigma=50,
    p=0.3), ToTensorV2.

Notes:
  - RandomBrightnessContrast uses albumentations defaults
    (brightness/contrast limits ±0.2, brightness_by_max=True):
    img' = clip(img * (1 + c) + b * max_value), max_value = 1.0 for floats.
  - ElasticTransform follows modern albumentations (>=1.4) semantics:
    displacement = gaussian_filter(uniform(-1, 1), sigma) * alpha per axis,
    bilinear remap with REFLECT_101 borders for the image and nearest for
    the mask (the reference pins no version; alpha=1 makes it sub-pixel).
  - Everything is jittable; each batch consumes one PRNG key, so runs are
    exactly reproducible from the training seed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from unetdc_tpu.ops.filters import gaussian_filter_scipy


def _rot90_k(img: jax.Array, k: jax.Array) -> jax.Array:
    """rot90 by traced k in {0,1,2,3} (H == W required, true after resize)."""
    return jax.lax.switch(
        k,
        [lambda x: x,
         lambda x: jnp.rot90(x, 1),
         lambda x: jnp.rot90(x, 2),
         lambda x: jnp.rot90(x, 3)],
        img)


def _elastic_displacement(key, shape: Tuple[int, int], alpha: float,
                          sigma: float):
    h, w = shape
    kx, ky = jax.random.split(key)
    dx = jax.random.uniform(kx, (h, w), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(ky, (h, w), minval=-1.0, maxval=1.0)
    dx = gaussian_filter_scipy(dx, sigma) * alpha
    dy = gaussian_filter_scipy(dy, sigma) * alpha
    return dy, dx


def _reflect101_idx(i: jax.Array, n: int) -> jax.Array:
    """Reflect-101 index fold for |i| < 2n (sufficient for small warps)."""
    i = jnp.abs(i)
    return jnp.where(i >= n, 2 * (n - 1) - i, i)


def _remap_bilinear(img: jax.Array, ys: jax.Array, xs: jax.Array
                    ) -> jax.Array:
    h, w = img.shape[:2]
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = ys - y0
    fx = xs - x0

    def at(yy, xx):
        yy = _reflect101_idx(yy, h)
        xx = _reflect101_idx(xx, w)
        return img[yy, xx]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    return ((v00 * (1 - fy) * (1 - fx)) + (v01 * (1 - fy) * fx)
            + (v10 * fy * (1 - fx)) + (v11 * fy * fx))


def _remap_nearest(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    h, w = img.shape[:2]
    y = _reflect101_idx(jnp.round(ys).astype(jnp.int32), h)
    x = _reflect101_idx(jnp.round(xs).astype(jnp.int32), w)
    return img[y, x]


def _augment_one(key, img: jax.Array, mask: jax.Array,
                 p_hflip: float, p_vflip: float, p_rot90: float,
                 p_bc: float, p_elastic: float,
                 elastic_alpha: float, elastic_sigma: float):
    keys = jax.random.split(key, 9)

    do_h = jax.random.uniform(keys[0]) < p_hflip
    img = jnp.where(do_h, img[:, ::-1], img)
    mask = jnp.where(do_h, mask[:, ::-1], mask)

    do_v = jax.random.uniform(keys[1]) < p_vflip
    img = jnp.where(do_v, img[::-1], img)
    mask = jnp.where(do_v, mask[::-1], mask)

    do_r = jax.random.uniform(keys[2]) < p_rot90
    k = jax.random.randint(keys[3], (), 0, 4)
    k = jnp.where(do_r, k, 0)
    img = _rot90_k(img, k)
    mask = _rot90_k(mask, k)

    do_bc = jax.random.uniform(keys[4]) < p_bc
    contrast = 1.0 + jax.random.uniform(keys[5], minval=-0.2, maxval=0.2)
    brightness = jax.random.uniform(keys[6], minval=-0.2, maxval=0.2)
    bc = jnp.clip(img * contrast + brightness, 0.0, 1.0)
    img = jnp.where(do_bc, bc, img)

    do_el = jax.random.uniform(keys[7]) < p_elastic
    h, w = mask.shape
    dy, dx = _elastic_displacement(keys[8], (h, w), elastic_alpha,
                                   elastic_sigma)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + dy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + dx
    img_el = _remap_bilinear(img, yy, xx)
    mask_el = _remap_nearest(mask, yy, xx)
    img = jnp.where(do_el, img_el, img)
    mask = jnp.where(do_el, mask_el, mask)
    return img, mask


@functools.partial(
    jax.jit,
    static_argnames=("p_hflip", "p_vflip", "p_rot90", "p_bc", "p_elastic",
                     "elastic_alpha", "elastic_sigma"))
def augment_batch(key, images: jax.Array, masks: jax.Array,
                  p_hflip: float = 0.5, p_vflip: float = 0.2,
                  p_rot90: float = 0.5, p_bc: float = 0.2,
                  p_elastic: float = 0.3, elastic_alpha: float = 1.0,
                  elastic_sigma: float = 50.0):
    """Batched augmentation: images (B,H,W,3) f32 in [0,1], masks (B,H,W)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda k, i, m: _augment_one(
            k, i, m, p_hflip, p_vflip, p_rot90, p_bc, p_elastic,
            elastic_alpha, elastic_sigma))(keys, images, masks)
