"""144-image training epoch wall vs summed device step time (real chip).

VERDICT r2 item 5 done-bar: a 144-image epoch's wall-clock on TPU must be
<= 2x the summed device step time, proving the host/relay overhead walls
(per-dispatch ~0.1 s latency, ~20 MB/s uploads) are actually amortized by
the trainer's step_chunk scan fusion + device-resident sample bank +
chunked mask-saving eval (train/trainer.py). Reference counterpart: the
epoch loop of /root/reference/train_DC_focal.py:241-358.

Run on the TPU (axon) backend:

    python -m unetdc_tpu.utils.epoch_wall

Prints per-epoch walls (train / val / mask-saving val) and the device-only
denominator measured by looping the SAME fused chunk programs
(_chunk_train_impl / _chunk_eval_impl, preprocess + augment included)
inside one jit, then the wall/device ratio. Exits 0 iff ratio <= 2.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def make_droplet_dataset(out_dir: str, n: int, h: int = 512, w: int = 512,
                         seed: int = 0):
    """Synthetic realistic-brightness microscopy set: mid-gray noisy field
    + bright droplets, masks = droplet disks. (Realistic brightness
    matters: the brightness/contrast augmentation poisons BatchNorm
    running stats on tiny DARK datasets — see CLAUDE.md / ROUND2.md.)"""
    from PIL import Image

    from unetdc_tpu.io.native import encode_png_rgb

    img_dir = os.path.join(out_dir, "images")
    mask_dir = os.path.join(out_dir, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:h, :w]
    names = []
    for i in range(n):
        img = (60 + rng.rand(h, w, 3) * 100).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        for _ in range(40):
            cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
            r = rng.randint(3, 12)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            img[blob] = np.minimum(img[blob].astype(np.int32) + 90,
                                   255).astype(np.uint8)
            mask[blob] = 255
        name = f"sample{i:03d}.png"
        encode_png_rgb(os.path.join(img_dir, name), img)
        Image.fromarray(mask).save(os.path.join(mask_dir, name))
        names.append(name)
    return img_dir, mask_dir, names


def _device_chunk_denominators(tr, size, batch, k, iters=4):
    """Per-image device time of the fused chunk programs themselves:
    loop _chunk_train_impl / _chunk_eval_impl (preprocess + augment + step,
    exactly what an epoch dispatches) inside ONE jit, subtracting the null
    dispatch overhead — the honest 'summed device step time' denominator."""
    import jax
    import jax.numpy as jnp

    from unetdc_tpu.utils.device_profile import _loop_jit, _time_once

    rng = np.random.RandomState(1)
    imgs = jnp.asarray((rng.rand(k, batch, size, size, 3) * 255)
                       .astype(np.uint8))
    masks = jnp.asarray((rng.rand(k, batch, size, size) > 0.97)
                        .astype(np.uint8))
    valid = jnp.ones((k, batch), jnp.float32)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(k)])
    params = tr.variables["params"]
    stats = tr.variables["batch_stats"]
    opt = tr.opt_state

    def train_op(c):
        p, s, o = c
        p, s, o, *_ = tr._chunk_train_impl(
            p, s, o, imgs, masks, valid, keys,
            tr.cfg.background_radius, True)
        return (p, s, o)

    def eval_op(c):
        # return the loss so _loop_jit's carry bump depends on the eval
        # computation (returning the untouched carry would let XLA DCE it)
        p, s = c
        loss, dice, corr, cnt, _ = tr._chunk_eval_impl(
            p, s, imgs, masks, valid, tr.cfg.background_radius, False, None)
        return loss

    null = _loop_jit(lambda c: c + 1, iters)
    zero = jnp.float32(0)
    _time_once(null, zero)
    overhead = min(_time_once(null, zero) for _ in range(3))

    out = {}
    for name, op, carry in (("train", train_op, (params, stats, opt)),
                            ("eval", eval_op, (params, stats))):
        fn = _loop_jit(op, iters)
        _time_once(fn, carry)  # compile
        sec = max(min(_time_once(fn, carry) for _ in range(2)) - overhead,
                  1e-9) / iters
        out[name] = sec / (k * batch)  # seconds per image
    return out


def main(n_train=144, n_val=64, size=512, batch=8, epochs=4):
    from unetdc_tpu.utils.compile_cache import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))

    from unetdc_tpu.data.dataset import SegmentationData
    from unetdc_tpu.train.trainer import Trainer, TrainConfig

    td = tempfile.mkdtemp(prefix="epoch_wall_")
    print(f"building {n_train}+{n_val} synthetic 512^2 images in {td} ...")
    img_dir, mask_dir, names = make_droplet_dataset(
        td, n_train + n_val, size, size)
    tr_names, va_names = names[:n_train], names[n_train:]
    train_data = SegmentationData(img_dir, mask_dir, tr_names, tr_names,
                                  batch_size=batch, shuffle=True, seed=0)
    val_data = SegmentationData(img_dir, mask_dir, va_names, va_names,
                                batch_size=batch)

    tr = Trainer(TrainConfig(model="unetdc", img_size=size,
                             batch_size=batch, compute_dtype="bf16",
                             augment=True))

    walls = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        tr_loss, tr_dice, _ = tr.run_epoch_train(train_data, epoch)
        t1 = time.perf_counter()
        va = tr.run_epoch_eval(val_data)
        t2 = time.perf_counter()
        walls.append({"epoch": epoch, "train_s": t1 - t0, "val_s": t2 - t1})
        print(f"epoch {epoch}: train {t1 - t0:.2f} s "
              f"({n_train / (t1 - t0):.1f} img/s), "
              f"val {t2 - t1:.2f} s ({n_val / (t2 - t1):.1f} img/s), "
              f"loss {tr_loss:.4f} dice {tr_dice:.4f}")

    mask_dir_out = os.path.join(td, "val_masks")
    t0 = time.perf_counter()
    tr.run_epoch_eval(val_data, save_masks_dir=mask_dir_out)
    mask_val_s = time.perf_counter() - t0
    n_saved = len(os.listdir(mask_dir_out))
    print(f"mask-saving val: {mask_val_s:.2f} s "
          f"({n_val / mask_val_s:.1f} img/s, {n_saved} PNGs)")

    print("measuring device-only chunk denominators (looped jit) ...")
    dev = _device_chunk_denominators(tr, size, batch, tr.cfg.step_chunk)
    dev_train_epoch = dev["train"] * n_train
    dev_eval_epoch = dev["eval"] * n_val

    best_train = min(w["train_s"] for w in walls[1:])
    best_val = min(w["val_s"] for w in walls[1:])
    ratio_train = best_train / dev_train_epoch
    ratio_val = best_val / dev_eval_epoch
    result = {
        "n_train": n_train, "n_val": n_val, "size": size, "batch": batch,
        "epoch_walls": walls, "mask_saving_val_s": round(mask_val_s, 3),
        "device_train_s_per_img": round(dev["train"], 5),
        "device_eval_s_per_img": round(dev["eval"], 5),
        "device_train_epoch_s": round(dev_train_epoch, 3),
        "device_eval_epoch_s": round(dev_eval_epoch, 3),
        "best_train_wall_s": round(best_train, 3),
        "best_val_wall_s": round(best_val, 3),
        "wall_over_device_train": round(ratio_train, 3),
        "wall_over_device_val": round(ratio_val, 3),
        "pass": bool(ratio_train <= 2.0),
    }
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
