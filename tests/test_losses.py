"""Loss/metric parity vs torch oracle implementing the reference formulas
(utils/metrics_DC.py) and closed-form values."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from unetdc_tpu.losses import (
    dice_loss, combined_loss, dice_coef, focal_loss, focal_dice_loss,
    confusion_counts, calculate_metrics,
)


def _pair(rng, shape=(4, 16, 16, 1)):
    pred = rng.rand(*shape).astype(np.float32) * 0.98 + 0.01
    target = (rng.rand(*shape) > 0.5).astype(np.float32)
    return pred, target


def _to_torch(x):  # NHWC -> NCHW
    return torch.from_numpy(x.transpose(0, 3, 1, 2))


def _ref_dice_loss(pred, target, smooth=1e-7):
    intersection = (pred * target).sum(dim=(2, 3))
    union = pred.sum(dim=(2, 3)) + target.sum(dim=(2, 3))
    return float(1 - ((2 * intersection + smooth) / (union + smooth)).mean())


def test_dice_loss(rng):
    pred, target = _pair(rng)
    ref = _ref_dice_loss(_to_torch(pred), _to_torch(target))
    np.testing.assert_allclose(float(dice_loss(jnp.asarray(pred),
                                               jnp.asarray(target))),
                               ref, rtol=1e-5)


def test_combined_loss(rng):
    pred, target = _pair(rng)
    tp, tt = _to_torch(pred), _to_torch(target)
    ref = float(0.5 * torch.nn.BCELoss()(tp, tt) + 0.5 * _ref_dice_loss(tp, tt))
    np.testing.assert_allclose(float(combined_loss(jnp.asarray(pred),
                                                   jnp.asarray(target))),
                               ref, rtol=1e-5)


def test_dice_coef(rng):
    pred, target = _pair(rng)
    tp, tt = _to_torch(pred), _to_torch(target)
    bp = (tp > 0.5).float()
    inter = (tt * bp).sum(dim=(2, 3))
    union = tt.sum(dim=(2, 3)) + bp.sum(dim=(2, 3))
    ref = float(((2 * inter + 1e-7) / (union + 1e-7)).mean())
    np.testing.assert_allclose(float(dice_coef(jnp.asarray(target),
                                               jnp.asarray(pred))),
                               ref, rtol=1e-5)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_focal_loss(rng, reduction):
    pred, target = _pair(rng)
    tp, tt = _to_torch(pred), _to_torch(target)
    bce = tF.binary_cross_entropy(tp, tt, reduction="none")
    pt = torch.exp(-bce)
    fl = 1.0 * (1 - pt) ** 2.0 * bce
    ref = float(fl.mean() if reduction == "mean" else fl.sum())
    ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(target),
                            reduction=reduction))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_focal_dice_loss_ratio(rng):
    pred, target = _pair(rng)
    f = float(focal_loss(jnp.asarray(pred), jnp.asarray(target)))
    d = float(dice_loss(jnp.asarray(pred), jnp.asarray(target)))
    ours = float(focal_dice_loss(jnp.asarray(pred), jnp.asarray(target),
                                 ratio=0.3))
    np.testing.assert_allclose(ours, 0.3 * f + 0.7 * d, rtol=1e-6)


def test_logits_losses_match_probability_formulas(rng):
    """The stable logits-space training losses must equal the reference
    probability-space formulas away from saturation, and stay finite with
    bounded gradients AT saturation (where the prob-space form NaNs)."""
    import jax
    import jax.numpy as jnp

    from unetdc_tpu.losses.losses import (combined_loss_from_logits,
                                          focal_dice_loss_from_logits,
                                          focal_loss_from_logits)

    logits = (rng.rand(2, 16, 16, 1).astype(np.float32) - 0.5) * 8
    target = (rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
    probs = jax.nn.sigmoid(jnp.asarray(logits))

    np.testing.assert_allclose(
        float(focal_loss_from_logits(jnp.asarray(logits), jnp.asarray(target))),
        float(focal_loss(probs, jnp.asarray(target))), rtol=1e-5)
    np.testing.assert_allclose(
        float(combined_loss_from_logits(jnp.asarray(logits),
                                        jnp.asarray(target))),
        float(combined_loss(probs, jnp.asarray(target))), rtol=1e-5)
    np.testing.assert_allclose(
        float(focal_dice_loss_from_logits(jnp.asarray(logits),
                                          jnp.asarray(target), ratio=0.3)),
        float(focal_dice_loss(probs, jnp.asarray(target), ratio=0.3)),
        rtol=1e-5)

    # saturation: logits +-60 (sigmoid == exactly 0/1 in f32) with WRONG
    # targets — loss and gradient must stay finite
    sat = jnp.full((1, 4, 4, 1), 60.0)
    wrong = jnp.zeros((1, 4, 4, 1))
    val, grad = jax.value_and_grad(
        lambda z: focal_dice_loss_from_logits(z, wrong))(sat)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert np.abs(np.asarray(grad)).max() < 10.0  # bounded, not 1e12


def test_calculate_metrics_vs_sklearn(rng):
    from sklearn.metrics import (precision_score, recall_score, f1_score,
                                 confusion_matrix)
    pred, target = _pair(rng, (2, 32, 32, 1))
    yt = target.reshape(-1)
    yp = (pred.reshape(-1) > 0.3).astype(np.float32)
    p, r, f1, sp, cm = calculate_metrics(target, pred, thresh=0.3)
    np.testing.assert_allclose(
        p, precision_score(yt, yp, average="binary", zero_division=1),
        rtol=1e-9)
    np.testing.assert_allclose(
        r, recall_score(yt, yp, average="binary", zero_division=1), rtol=1e-9)
    np.testing.assert_allclose(
        f1, f1_score(yt, yp, average="binary", zero_division=1), rtol=1e-9)
    np.testing.assert_array_equal(cm, confusion_matrix(yt, yp))
    tn, fp = cm[0]
    np.testing.assert_allclose(sp, tn / (tn + fp))


def test_confusion_counts_all_negative():
    z = np.zeros((1, 8, 8, 1), np.float32)
    counts = np.asarray(confusion_counts(jnp.asarray(z), jnp.asarray(z)))
    assert counts.tolist() == [64, 0, 0, 0]


def test_plot_confusion_matrix(tmp_path):
    from unetdc_tpu.losses import plot_binary_confusion_matrix_with_metrics
    cm = np.array([[50, 3], [2, 45]])
    out = tmp_path / "cm.png"
    plot_binary_confusion_matrix_with_metrics(cm, 0.95, str(out))
    assert out.exists() and out.stat().st_size > 0
