"""Pixel metrics with on-device confusion counting.

Parity with utils/metrics_DC.py:75-117: threshold 0.3, binary
precision/recall/F1 with sklearn's zero_division=1 convention, specificity,
2x2 confusion matrix, and the annotated seaborn heatmap artifact
(`confusion_matrix_.png`).

The reference flattens tensors to host numpy and calls sklearn per batch —
its throughput sin. Here TP/FP/FN/TN are four on-device scalar reductions;
only the final 4 numbers cross to host.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def confusion_counts(y_true: jax.Array, y_pred_probs: jax.Array,
                     thresh: float = 0.3,
                     sample_mask: jax.Array = None) -> jax.Array:
    """Returns int64-safe f64-free counts [tn, fp, fn, tp] (int32 on TPU).

    ``sample_mask`` (B,) bool optionally restricts counting to valid samples
    (DP ragged-tail padding replicas are excluded with mask=False)."""
    yp = (y_pred_probs > thresh)
    yt = (y_true > 0.5)
    if sample_mask is not None:
        v = sample_mask.reshape((-1,) + (1,) * (yp.ndim - 1))
        yp, yt = yp & v, yt & v
        tp = jnp.sum(yp & yt)
        fp = jnp.sum(yp & ~yt & v)
        fn = jnp.sum(~yp & yt & v)
        tn = jnp.sum(~yp & ~yt & v)
    else:
        tp = jnp.sum(yp & yt)
        fp = jnp.sum(yp & ~yt)
        fn = jnp.sum(~yp & yt)
        tn = jnp.sum(~yp & ~yt)
    return jnp.stack([tn, fp, fn, tp])


def pixel_metrics(counts) -> Tuple[float, float, float, float]:
    """(precision, recall, f1, specificity) from [tn, fp, fn, tp] with
    sklearn zero_division=1 semantics (utils/metrics_DC.py:79-84)."""
    tn, fp, fn, tp = [float(c) for c in np.asarray(counts)]
    precision = tp / (tp + fp) if (tp + fp) > 0 else 1.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    specificity = tn / (tn + fp) if (tn + fp) > 0 else 0.0
    return precision, recall, f1, specificity


def calculate_metrics(y_true, y_pred_probs, thresh: float = 0.3):
    """Drop-in equivalent of utils/metrics_DC.py:75-85: returns
    (precision, recall, f1, specificity, conf_matrix 2x2 numpy)."""
    counts = np.asarray(confusion_counts(jnp.asarray(y_true),
                                         jnp.asarray(y_pred_probs), thresh))
    precision, recall, f1, specificity = pixel_metrics(counts)
    tn, fp, fn, tp = counts
    cm = np.array([[tn, fp], [fn, tp]], dtype=np.int64)
    return precision, recall, f1, specificity, cm


def plot_binary_confusion_matrix_with_metrics(cm, accuracy,
                                              out_path="confusion_matrix_.png"):
    """Annotated 2x2 heatmap artifact (utils/metrics_DC.py:87-117): per-class
    Pr/Rec/Sp on the diagonal, overall accuracy in the title."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    tn, fp, fn, tp = np.asarray(cm).ravel()
    pr0 = tn / (tn + fn) if (tn + fn) > 0 else 0
    rec0 = tn / (tn + fp) if (tn + fp) > 0 else 0
    sp0 = tp / (tp + fp) if (tp + fp) > 0 else 0
    pr1 = tp / (tp + fp) if (tp + fp) > 0 else 0
    rec1 = tp / (tp + fn) if (tp + fn) > 0 else 0
    sp1 = tn / (tn + fn) if (tn + fn) > 0 else 0

    annot = np.empty((2, 2), dtype=object)
    annot[0, 0] = f"{tn}\nPr={pr0:.2f}\nRec={rec0:.2f}\nSp={sp0:.2f}"
    annot[0, 1] = f"{fp}"
    annot[1, 0] = f"{fn}"
    annot[1, 1] = f"{tp}\nPr={pr1:.2f}\nRec={rec1:.2f}\nSp={sp1:.2f}"

    plt.figure(figsize=(6, 5))
    sns.heatmap(np.asarray(cm), annot=annot, fmt="", cmap="Blues",
                xticklabels=["Negative", "Positive"],
                yticklabels=["Negative", "Positive"])
    plt.title(f"Overall Accuracy: {accuracy:.3f}")
    plt.xlabel("Predicted")
    plt.ylabel("Actual")
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close()
