"""Segmentation losses, formula-exact with the reference
(utils/metrics_DC.py) but jittable/grad-safe.

All losses take *probabilities* (the models apply sigmoid in forward,
models/model_2.py:80) of shape (B, H, W, C) NHWC — the reference uses
NCHW (B, 1, H, W) and reduces dice over dims (2, 3); we reduce over the
spatial dims (1, 2), which is the same per-(batch, channel) reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SPATIAL = (1, 2)  # H, W of NHWC


def _wmean(vals: jax.Array, weights) -> jax.Array:
    """Mean over (B, ...) values with optional per-sample weights (B,):
    sum(vals * w) / (sum(w) * per-sample element count). With weights=None
    this is jnp.mean. Used to exclude DP ragged-tail padding replicas from
    losses/metrics (weight 0)."""
    if weights is None:
        return jnp.mean(vals)
    w = weights.reshape((-1,) + (1,) * (vals.ndim - 1)).astype(vals.dtype)
    return jnp.sum(vals * w) / (jnp.sum(w) * np.prod(vals.shape[1:]))


def dice_loss(pred: jax.Array, target: jax.Array, smooth: float = 1e-7,
              weights: jax.Array = None) -> jax.Array:
    """Soft dice loss (utils/metrics_DC.py:11-17): per-sample dice over
    spatial dims, 1 - mean. `weights` (B,) optionally down-weights samples
    (0 = excluded, e.g. DP tail padding)."""
    intersection = jnp.sum(pred * target, axis=_SPATIAL)
    union = jnp.sum(pred, axis=_SPATIAL) + jnp.sum(target, axis=_SPATIAL)
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return 1.0 - _wmean(dice, weights)


def _bce(pred: jax.Array, target: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Elementwise binary cross-entropy on probabilities (torch BCELoss
    semantics; clamp log terms for stability — torch clamps log at -100)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


def combined_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """0.5 * BCE + 0.5 * dice (utils/metrics_DC.py:19-22)."""
    return 0.5 * jnp.mean(_bce(pred, target)) + 0.5 * dice_loss(pred, target)


def dice_coef(y_true: jax.Array, y_pred: jax.Array, smooth: float = 1e-7,
              weights: jax.Array = None) -> jax.Array:
    """Hard dice: binarize pred at 0.5 internally
    (utils/metrics_DC.py:24-29). `weights` (B,) excludes padded samples."""
    y_pred = (y_pred > 0.5).astype(jnp.float32)
    intersection = jnp.sum(y_true * y_pred, axis=_SPATIAL)
    union = jnp.sum(y_true, axis=_SPATIAL) + jnp.sum(y_pred, axis=_SPATIAL)
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return _wmean(dice, weights)


def focal_loss(pred: jax.Array, target: jax.Array, alpha: float = 1.0,
               gamma: float = 2.0, reduction: str = "mean") -> jax.Array:
    """Binary focal loss on probabilities (utils/metrics_DC.py:31-63):
    bce elementwise, pt = exp(-bce), alpha * (1-pt)^gamma * bce."""
    bce = _bce(pred, target)
    pt = jnp.exp(-bce)
    fl = alpha * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def focal_dice_loss(pred: jax.Array, target: jax.Array, alpha: float = 1.0,
                    gamma: float = 2.0, ratio: float = 0.3) -> jax.Array:
    """ratio*focal + (1-ratio)*dice; production training uses ratio=0.3
    (utils/metrics_DC.py:65-73, train_DC_focal.py:222)."""
    fl = focal_loss(pred, target, alpha=alpha, gamma=gamma, reduction="mean")
    dl = dice_loss(pred, target)
    return ratio * fl + (1.0 - ratio) * dl


# ---------------------------------------------------------------------------
# Logits-space variants for TRAINING. The reference bakes sigmoid into the
# model and feeds probabilities to BCE (utils/metrics_DC.py:49), whose
# gradient -1/p explodes as predictions saturate — we reproduced NaN
# divergence within two epochs doing it that way (in f32 AND bf16). These
# compute the SAME loss values via log-sigmoid identities but with bounded
# gradients (d bce/d z = sigmoid(z) - t), the numerically sound formulation
# on any hardware. The probability-space functions above remain the parity
# surface for evaluation.
# ---------------------------------------------------------------------------

def _bce_from_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise BCE(sigmoid(z), t), computed stably:
    max(z, 0) - z*t + log1p(exp(-|z|))."""
    return (jnp.maximum(logits, 0.0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def combined_loss_from_logits(logits: jax.Array, target: jax.Array,
                              weights: jax.Array = None) -> jax.Array:
    """combined_loss with stable BCE; dice uses sigmoid(logits)."""
    probs = jax.nn.sigmoid(logits)
    return (0.5 * _wmean(_bce_from_logits(logits, target), weights)
            + 0.5 * dice_loss(probs, target, weights=weights))


def focal_loss_from_logits(logits: jax.Array, target: jax.Array,
                           alpha: float = 1.0, gamma: float = 2.0,
                           reduction: str = "mean",
                           weights: jax.Array = None) -> jax.Array:
    """focal_loss with stable elementwise BCE; pt = exp(-bce) as in the
    reference formula. `weights` applies to the mean reduction only."""
    bce = _bce_from_logits(logits, target)
    pt = jnp.exp(-bce)
    fl = alpha * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return _wmean(fl, weights)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def focal_dice_loss_from_logits(logits: jax.Array, target: jax.Array,
                                alpha: float = 1.0, gamma: float = 2.0,
                                ratio: float = 0.3,
                                weights: jax.Array = None) -> jax.Array:
    fl = focal_loss_from_logits(logits, target, alpha=alpha, gamma=gamma,
                                weights=weights)
    dl = dice_loss(jax.nn.sigmoid(logits), target, weights=weights)
    return ratio * fl + (1.0 - ratio) * dl
