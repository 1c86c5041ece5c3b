"""Separable Gaussian filtering matching cv2.GaussianBlur and
scipy.ndimage.gaussian_filter semantics.

Reference call sites: quantify_pipline.py:46 (cv2.GaussianBlur 15x15 sigma=0,
BORDER_REFLECT_101), quantify_pipline.py:94-95 (scipy gaussian_filter
sigma=kernel/6, mode='reflect', truncate=4).
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp


def cv2_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel: if sigma <= 0, sigma = 0.3*((ksize-1)*0.5-1)+0.8.
    (For ksize <= 7 cv2 uses fixed small tables that this formula reproduces
    for the default sigma.)"""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def scipy_gaussian_kernel(sigma: float, truncate: float = 4.0,
                          order: int = 0) -> np.ndarray:
    """scipy.ndimage's exact `_gaussian_kernel1d(sigma, order, radius)` with
    radius = int(truncate*sigma + 0.5), already REVERSED for use as a
    convolution tap list (scipy correlates with the reversed kernel, i.e.
    convolves with the unreversed one; for even orders this is a no-op).
    order 0 = normalized Gaussian; order n = n-th Gaussian derivative via
    the Hermite-recurrence polynomial q(x)*phi(x)."""
    radius = int(truncate * float(sigma) + 0.5)
    sigma2 = float(sigma) ** 2
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / sigma2 * x ** 2)
    phi = phi / phi.sum()
    if order > 0:
        expo = np.arange(order + 1)
        q = np.zeros(order + 1)
        q[0] = 1
        D = np.diag(expo[1:].astype(np.float64), 1)   # q -> q'
        P = np.diag(np.ones(order) / -sigma2, -1)     # q -> q * p'
        for _ in range(order):
            q = (D + P).dot(q)
        phi = (x[:, None] ** expo).dot(q) * phi
    # scipy convolves with the unreversed derivative kernel (it reverses
    # before correlate1d); our _separable implements correlation-style
    # indexing, so hand it the reversed taps to match.
    return phi[::-1].astype(np.float32)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jax.Array, ksize: int = 15, sigma: float = 0.0
                  ) -> jax.Array:
    """cv2.GaussianBlur(img, (ksize, ksize), sigma) on a 2D image; float
    output (callers round for uint8 parity). Border: REFLECT_101."""
    k = cv2_gaussian_kernel(ksize, sigma)
    return _separable(img, k, k, reflect101=True)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter_scipy(img: jax.Array, sigma: float, truncate: float = 4.0
                          ) -> jax.Array:
    """scipy.ndimage.gaussian_filter(img, sigma) on a 2D image (mode
    'reflect')."""
    k = scipy_gaussian_kernel(sigma, truncate)
    return _separable(img, k, k, reflect101=False)


@functools.partial(jax.jit,
                   static_argnames=("sigma", "order_y", "order_x", "truncate"))
def gaussian_derivative_scipy(img: jax.Array, sigma: float, order_y: int,
                              order_x: int, truncate: float = 4.0
                              ) -> jax.Array:
    """scipy.ndimage.gaussian_filter(img, sigma, order=(order_y, order_x),
    mode='reflect') on a 2D image — separable true Gaussian-derivative
    filtering, the building block of gaussian_laplace (orders (2,0)+(0,2))
    and the Hessian determinant (adds the (1,1) cross term)."""
    ky = scipy_gaussian_kernel(sigma, truncate, order_y)
    kx = scipy_gaussian_kernel(sigma, truncate, order_x)
    return _separable(img, ky, kx, reflect101=False)


def _separable(img: jax.Array, ky: np.ndarray, kx: np.ndarray,
               reflect101: bool) -> jax.Array:
    ry, rx = len(ky) // 2, len(kx) // 2
    mode = "reflect" if reflect101 else "symmetric"
    x = jnp.pad(img.astype(jnp.float32), ((ry, ry), (rx, rx)), mode=mode)
    # vertical then horizontal 1D convolutions as dots over shifted slices
    h, w = img.shape
    ky_j = jnp.asarray(ky)
    kx_j = jnp.asarray(kx)
    # conv along axis 0
    rows = sum(ky_j[i] * x[i:i + h, :] for i in range(len(ky)))
    out = sum(kx_j[j] * rows[:, j:j + w] for j in range(len(kx)))
    return out
