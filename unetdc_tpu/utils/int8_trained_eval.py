"""Train a UNetDC to saturation on synthetic microscopy ON-CHIP, then
measure int8-vs-bf16 mask agreement and droplet-count parity on the
TRAINED checkpoint (VERDICT r4 item 2).

Why this exists: the int8 agreement envelope was previously pinned only on
an adversarial random-init checkpoint (0.845-0.996 across seeds,
ROUND4.md) where threshold-band pixels dominate — logits cluster near the
0.3 probability threshold, so bf16-vs-int8 rounding flips many pixels. A
TRAINED segmentation head is sigmoid-saturated almost everywhere
(losses push logits away from the decision boundary), so the band is
nearly empty and agreement should approach 1. This module produces that
number honestly: a real `Trainer.fit` run (full production path: device
sample bank, step-chunk fusion, focal-dice-from-logits, f32 BN stats) on
a synthetic droplet dataset (the r2 full-cycle recipe scaled down:
realistic brightness, >=100 images — the regime CLAUDE.md documents as
healthy for BatchNorm under augmentation), then both engines on held-out
images.

Reference parity anchor: quantify_droplets_batch.py:52,56 (0.3 threshold
semantics) and train_DC_focal.py (the trainer being exercised).

Used by bench.py (`int8_trained_*` extra keys); runnable standalone:
  python -m unetdc_tpu.utils.int8_trained_eval
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict

import numpy as np


def make_droplet_dataset(root: str, n: int = 128, size: int = 256,
                         seed: int = 0) -> None:
    """`n` synthetic microscopy images + exact masks under root/{images,
    masks}: dark field with realistic brightness + bright droplets."""
    from unetdc_tpu.io.native import encode_png_rgb, encode_png_gray

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    yy, xx = np.mgrid[:size, :size]
    for i in range(n):
        img = (rng.rand(size, size, 3) * 60 + 40).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        for _ in range(rng.randint(12, 24)):
            cy = rng.randint(8, size - 8)
            cx = rng.randint(8, size - 8)
            r = rng.randint(3, 10)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            img[blob] = np.minimum(img[blob] + 170, 255)
            mask |= blob.astype(np.uint8)
        encode_png_rgb(os.path.join(img_dir, f"d{i:04d}.png"), img)
        encode_png_gray(os.path.join(mask_dir, f"d{i:04d}.png"), mask * 255)


def train_and_eval_int8(workdir: str | None = None, n_images: int = 128,
                        size: int = 256, epochs: int = 10,
                        n_eval: int = 16, seed: int = 0,
                        verbose: bool = False) -> Dict[str, float]:
    """Returns {int8_trained_agreement, int8_trained_count_match_rate,
    int8_trained_count_mean_abs_diff, trained_val_dice}."""
    import jax.numpy as jnp

    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    ctx = (tempfile.TemporaryDirectory() if workdir is None else None)
    root = ctx.name if ctx is not None else workdir
    try:
        make_droplet_dataset(root, n=n_images, size=size, seed=seed)
        imgs_l, masks_l = discover_pairs(os.path.join(root, "images"),
                                         os.path.join(root, "masks"))
        n_val = max(len(imgs_l) // 8, 8)
        ckpt = os.path.join(root, "best.msgpack")
        cfg = TrainConfig(num_epochs=epochs, batch_size=8, img_size=size,
                          compute_dtype="bf16", seed=seed, ckpt_path=ckpt,
                          background_radius=25, save_last=False,
                          save_val_masks_dir=None)
        tr = Trainer(cfg)
        mk = lambda il, ml, sh: SegmentationData(
            os.path.join(root, "images"), os.path.join(root, "masks"),
            il, ml, batch_size=8, shuffle=sh, seed=seed)
        hist = tr.fit(mk(imgs_l[n_val:], masks_l[n_val:], True),
                      mk(imgs_l[:n_val], masks_l[:n_val], False))
        val_dice = float(max(hist.get("val_dice", [float("nan")])))

        # held-out eval images, fresh seed
        rng = np.random.RandomState(seed + 1000)
        yy, xx = np.mgrid[:size, :size]
        evals = np.empty((n_eval, size, size, 3), np.uint8)
        for i in range(n_eval):
            img = (rng.rand(size, size, 3) * 60 + 40).astype(np.uint8)
            for _ in range(rng.randint(12, 24)):
                cy = rng.randint(8, size - 8)
                cx = rng.randint(8, size - 8)
                r = rng.randint(3, 10)
                blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
                img[blob] = np.minimum(img[blob] + 170, 255)
            evals[i] = img

        eng_f = load_engine(ckpt, fast=True)
        eng_f.img_size = size
        eng_q = load_engine(ckpt, fast=True, quantize="int8")
        eng_q.img_size = size
        agree = []
        count_match = 0
        count_diff = []
        for i in range(0, n_eval, 8):
            batch = evals[i:i + 8]
            rf = eng_f.run_batch(batch, (size, size),
                                 background_radius=25)
            rq = eng_q.run_batch(batch, (size, size),
                                 background_radius=25)
            agree.append((rf["mask"] == rq["mask"]).mean(axis=(1, 2)))
            cf = np.asarray(rf["count"])
            cq = np.asarray(rq["count"])
            count_match += int((cf == cq).sum())
            count_diff.extend(np.abs(cf - cq).tolist())
        out = {
            "int8_trained_agreement": float(np.concatenate(agree).mean()),
            "int8_trained_agreement_min": float(
                np.concatenate(agree).min()),
            "int8_trained_count_match_rate": count_match / n_eval,
            "int8_trained_count_mean_abs_diff": float(
                np.mean(count_diff)),
            "trained_val_dice": float(val_dice),
        }
        if verbose:
            print(json.dumps(out, indent=2))
        return out
    finally:
        if ctx is not None:
            ctx.cleanup()


if __name__ == "__main__":
    train_and_eval_int8(verbose=True)
