"""Test-phase visualizations: difference maps + overlays per test image
(train_DC_focal.py:406-449). Masks resize with TRUE nearest (keyword
interpolation at :422-423); the overlay base is the PREPROCESSED model
input (rolling-ball-corrected) scaled back to [0,255] and INTER_LINEAR
resized to original size (:439-444), not the raw file."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from unetdc_tpu.data.dataset import Prefetcher, SegmentationData
from unetdc_tpu.ops.diffmap import create_difference_map, overlay_difference
from unetdc_tpu.ops.resize import resize_linear_u8, resize_nearest


def run_test_phase(trainer, data: SegmentationData, diff_map_dir: str,
                   overlay_dir: str):
    os.makedirs(diff_map_dir, exist_ok=True)
    os.makedirs(overlay_dir, exist_ok=True)
    thresh = trainer.cfg.metric_thresh
    for batch in Prefetcher(data.batches()):
        x, m = trainer._device_batch(batch)
        import jax

        logits = trainer.model.apply(
            {"params": trainer.variables["params"],
             "batch_stats": trainer.variables["batch_stats"]}, x,
            train=False)
        probs = jax.nn.sigmoid(logits)
        oh, ow = batch["orig_size"]
        pred = (np.asarray(probs)[..., 0] > thresh).astype(np.uint8)
        true = np.asarray(m)[..., 0].astype(np.uint8)
        imgs512 = np.asarray(x)
        for j in range(batch["n_valid"]):
            pred_o = np.asarray(resize_nearest(
                jnp.asarray(pred[j]), (oh, ow)))
            true_o = np.asarray(resize_nearest(
                jnp.asarray(true[j]), (oh, ow)))
            diff = np.asarray(create_difference_map(
                jnp.asarray(true_o), jnp.asarray(pred_o)))
            base = os.path.splitext(batch["filenames"][j])[0]
            Image.fromarray(diff).save(
                os.path.join(diff_map_dir, f"{base}_diffmap.png"))
            img512 = np.clip(np.rint(imgs512[j] * 255.0), 0,
                             255).astype(np.uint8)
            img_o = np.asarray(resize_linear_u8(jnp.asarray(img512),
                                                (oh, ow)))
            overlay = np.asarray(overlay_difference(
                jnp.asarray(img_o), jnp.asarray(diff)))
            Image.fromarray(overlay).save(
                os.path.join(overlay_dir, f"{base}_overlay.png"))
            print(f"Saved difference map: "
                  f"{os.path.join(diff_map_dir, base + '_diffmap.png')}")
