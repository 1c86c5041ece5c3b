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


def run_extra_test_visualizations(trainer, data: SegmentationData,
                                  out_dir: str = ".",
                                  masks_dir: str = "predicted_masks_test"):
    """The reference's two extra test-set passes (train_DC_focal.py:506-611):

    1. a second `predicted_masks_test/` dump — threshold 0.3, INTER_NEAREST
       resize to original size, `{base}_pred.png` (:509-537);
    2. 3-panel `prediction_visualization_test_batch{b}_img{i}.png` figures —
       original / true mask / predicted mask at 512 (:541-554), up to 3 per
       batch;
    3. 3-panel `differences_overlay_batch{b}_img{i}.png` figures — original /
       diff map / overlay at original size (:556-611), every image.

    The reference shadows its batch index with the inner loop variable
    (both named ``j``, :513/:519), so its figures all save under the LAST
    image's index (one file per batch, mixing image i's panels with the last
    image's prediction). We implement the intent — per-(batch, image)
    filenames, consistent panels — and note the deviation here."""
    import jax
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from unetdc_tpu.ops.diffmap import create_difference_map, \
        overlay_difference

    os.makedirs(out_dir, exist_ok=True)
    mask_out = os.path.join(out_dir, masks_dir)
    os.makedirs(mask_out, exist_ok=True)
    thresh = 0.3  # hard-coded in the reference pass (:517)
    for bi, batch in enumerate(Prefetcher(data.batches())):
        x, m, _ = trainer._device_batch(batch)
        logits = trainer.model.apply(
            {"params": trainer.variables["params"],
             "batch_stats": trainer.variables["batch_stats"]}, x,
            train=False)
        probs = jax.nn.sigmoid(logits)
        pred = (np.asarray(probs)[..., 0] > thresh).astype(np.uint8)
        true = np.asarray(m)[..., 0].astype(np.uint8)
        imgs512 = np.asarray(x)
        oh, ow = batch["orig_size"]
        for j in range(batch["n_valid"]):
            # pass 1: mask dump (INTER_NEAREST to original, x255)
            pred_o = np.asarray(resize_nearest(jnp.asarray(pred[j]),
                                               (oh, ow))) * 255
            base = os.path.splitext(batch["filenames"][j])[0]
            save_path = os.path.join(mask_out, f"{base}_pred.png")
            Image.fromarray(pred_o.astype(np.uint8)).save(save_path)
            print(f"Saved predicted mask to: {save_path}")
        for i in range(min(3, batch["n_valid"])):
            # pass 2: original / true / predicted triptych at 512
            plt.figure(figsize=(10, 5))
            plt.subplot(1, 3, 1)
            plt.imshow(np.clip(imgs512[i], 0, 1))
            plt.title("Original Image")
            plt.subplot(1, 3, 2)
            plt.imshow(true[i], cmap="gray")
            plt.title("True Mask")
            plt.subplot(1, 3, 3)
            plt.imshow(pred[i], cmap="gray")
            plt.title("Predicted Mask")
            plt.savefig(os.path.join(
                out_dir, f"prediction_visualization_test_batch{bi}_img{i}.png"))
            plt.close()
        for j in range(batch["n_valid"]):
            # pass 3: original / diff map / overlay triptych at orig size
            img512 = np.clip(np.rint(imgs512[j] * 255.0), 0,
                             255).astype(np.uint8)
            diff = np.asarray(create_difference_map(
                jnp.asarray(true[j]), jnp.asarray(pred[j])))
            if (oh, ow) != diff.shape[:2]:
                diff = np.asarray(resize_nearest(jnp.asarray(diff), (oh, ow)))
                img_o = np.asarray(resize_linear_u8(jnp.asarray(img512),
                                                    (oh, ow)))
            else:
                img_o = img512
            overlay = np.asarray(overlay_difference(jnp.asarray(img_o),
                                                    jnp.asarray(diff)))
            plt.figure(figsize=(12, 6))
            for k, (title, panel) in enumerate(
                    (("Original", img_o), ("Diff Map", diff),
                     ("Overlayed", overlay))):
                plt.subplot(1, 3, k + 1)
                plt.title(title)
                plt.imshow(panel)
                plt.axis("off")
            plt.tight_layout()
            plt.savefig(os.path.join(
                out_dir, f"differences_overlay_batch{bi}_img{j}.png"))
            plt.close()


def run_test_phase(trainer, data: SegmentationData, diff_map_dir: str,
                   overlay_dir: str):
    os.makedirs(diff_map_dir, exist_ok=True)
    os.makedirs(overlay_dir, exist_ok=True)
    thresh = trainer.cfg.metric_thresh
    for batch in Prefetcher(data.batches()):
        x, m, _ = trainer._device_batch(batch)
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
