"""TPU-native training loop reproducing the reference trainers.

Reference behaviors reproduced (train_DC_focal.py / train.py):
  - Adam lr=1e-3 (torch defaults: b1=.9, b2=.999, eps=1e-8)
  - focal_dice_loss(alpha=1, gamma=2, ratio=0.3) for the DC-focal config
    (train_DC_focal.py:222) or combined_loss for the baseline (train.py:124)
  - per-step metrics: loss, hard dice of masks binarized at 0.3
    (dice_coef then re-binarizes at 0.5 — same thing on binary input),
    pixel accuracy — all computed ON DEVICE here (the reference pulls every
    batch to host numpy, its throughput sin, train_DC_focal.py:266-269)
  - per-epoch stdout lines in the exact reference format
    (train_DC_focal.py:342-346) — the GUI treats stdout as an API
  - best-val-dice checkpointing + early-stop patience
    (train_DC_focal.py:348-358)
  - a ReduceLROnPlateau scheduler exists in the reference but
    scheduler.step() is never called (train.py:126, train_DC_focal.py:225),
    so the effective LR is constant; we default to constant and expose
    `plateau_scheduler=True` as an opt-in fix.
  - optional saving of validation/test predicted masks resized to original
    size (the reference saves only the last val batch due to an indentation
    bug, train_DC_focal.py:313-331; we save all and note the difference)

TPU design: one jitted train step (donated params/opt state), device
preprocessing (rolling ball + resize) fused into the step, data-parallel +
spatial sharding over an optional mesh, host only decodes PNGs and logs.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from unetdc_tpu.checkpoint.native import save_checkpoint  # noqa: F401 (re-export)
from unetdc_tpu.data.augment import augment_batch
from unetdc_tpu.data.dataset import Prefetcher, SegmentationData
from unetdc_tpu.losses import confusion_counts, dice_coef
from unetdc_tpu.losses.losses import (combined_loss_from_logits,
                                      focal_dice_loss_from_logits)
from unetdc_tpu.models.unet import UNet, UNetDC, init_params
from unetdc_tpu.ops.resize import resize_linear_u8_cv2exact, resize_nearest
from unetdc_tpu.ops.rolling_ball import rolling_ball_correction_rgb


@dataclasses.dataclass
class TrainConfig:
    model: str = "unetdc"               # 'unet' | 'unetdc'
    loss: str = "focal_dice"            # 'focal_dice' | 'combined'
    focal_ratio: float = 0.3
    lr: float = 1e-3
    num_epochs: int = 15                # train_DC_focal.py:220
    patience: int = 5                   # train_DC_focal.py:230
    batch_size: int = 8
    img_size: int = 512
    metric_thresh: float = 0.3          # train_DC_focal.py:259
    background_radius: int = 50
    seed: int = 0
    ckpt_path: str = "best_UNetDC_focal_model.msgpack"
    export_pth: Optional[str] = None    # also write a torch-format .pth
    save_val_masks_dir: Optional[str] = None
    plateau_scheduler: bool = False     # reference never steps its scheduler
    compute_dtype: str = "bf16"
    augment: bool = True
    resume: bool = False                # resume from ckpt_path if it exists
    # write ckpt_path+'.last'(+.opt) every epoch so --resume continues the
    # exact trajectory; False reverts to best-only (reference semantics)
    save_last: bool = True
    remat: bool = False                 # activation checkpointing
    history_jsonl: Optional[str] = None  # structured per-epoch metrics log
    # additionally shard the image height over the mesh's 'space' axis
    # (XLA inserts conv halo exchanges); the scaling axis for images larger
    # than one chip's HBM (SURVEY §5 spatial axis)
    shard_space: bool = False
    # fuse up to this many train/eval steps into ONE dispatch (lax.scan):
    # on the axon relay each jit call costs ~0.1 s of host latency, so the
    # per-step path tops out near 50 img/s while the device step itself
    # runs 142 img/s. 1 disables. Only full same-shape chunks are fused;
    # leftovers take the per-step path (identical numerics, same PRNG
    # stream). Under a mesh, chunks fuse whenever batch_size divides the
    # 'data' axis (r3: chunk inputs are device_put with chunk_sharding).
    step_chunk: int = 8
    # keep raw uint8 samples resident in device HBM (keyed by the dataset
    # decode cache's stable array identities) so epochs 2+ re-upload
    # nothing: the relay's host->device path runs at ~20 MB/s, which alone
    # caps 512^2 training at ~25 img/s. Byte budget; 0 disables.
    device_cache_bytes: int = 2 << 30


class Trainer:
    def __init__(self, config: TrainConfig, mesh=None):
        self.cfg = config
        self.mesh = mesh
        model_cls = UNetDC if config.model == "unetdc" else UNet
        dtype = jnp.bfloat16 if config.compute_dtype == "bf16" else jnp.float32
        # the trainer drives the model WITHOUT the baked-in sigmoid and
        # computes losses from logits (see losses.losses logits variants —
        # probability-space BCE gradients NaN within epochs); probabilities
        # for metrics/artifacts are taken explicitly in the steps.
        self.model = model_cls(dtype=dtype, apply_sigmoid=False,
                               remat=config.remat)
        self.variables = init_params(
            self.model, jax.random.PRNGKey(config.seed),
            input_shape=(1, 64, 64, 3))
        if config.plateau_scheduler:
            self._lr = optax.inject_hyperparams(optax.adam)(
                learning_rate=config.lr)
            self.tx = self._lr
        else:
            self.tx = optax.adam(config.lr)
        self.opt_state = self.tx.init(self.variables["params"])
        if mesh is not None:
            # data-parallel: replicate params/opt state, shard batches;
            # jit sharding propagation inserts the gradient psum
            from unetdc_tpu.core.mesh import replicate

            self.variables = replicate(mesh, self.variables)
            self.opt_state = replicate(mesh, self.opt_state)
        if config.loss == "focal_dice":
            self.loss_fn = lambda z, t, w: focal_dice_loss_from_logits(
                z, t, alpha=1.0, gamma=2.0, ratio=config.focal_ratio,
                weights=w)
        else:
            self.loss_fn = combined_loss_from_logits

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1, 2))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._preprocess = jax.jit(
            self._preprocess_impl,
            static_argnames=("background_radius", "apply_bg"))
        self._chunk_train = jax.jit(
            self._chunk_train_impl, donate_argnums=(0, 1, 2),
            static_argnames=("background_radius", "do_augment"))
        self._chunk_eval = jax.jit(
            self._chunk_eval_impl,
            static_argnames=("background_radius", "want_masks", "out_hw"))
        self.history: Dict[str, List[float]] = {
            k: [] for k in ("train_loss", "val_loss", "train_dice",
                            "val_dice", "train_acc", "val_acc")}
        # id(host sample array) -> (device copy, host ref) — the host ref
        # pins the array so its id stays valid for the cache's lifetime
        self._devbank: Dict[int, tuple] = {}
        self._devbank_bytes_left = int(config.device_cache_bytes)

    def _stack_batch(self, batch):
        """(imgs, masks) as device arrays, via the device-resident sample
        bank when possible (no re-upload on later epochs). Under a mesh the
        cached copies live on the default device and callers reshard them
        with device_put — a device->device transfer over ICI, still far
        cheaper than re-crossing the host link every epoch."""
        if (self.cfg.device_cache_bytes > 0
                and "sample_images" in batch):
            def dev(arr):
                hit = self._devbank.get(id(arr))
                if hit is not None:
                    return hit[0]
                d = jnp.asarray(arr)
                if arr.flags.writeable is False and \
                        arr.nbytes <= self._devbank_bytes_left:
                    # only cache arrays the dataset itself caches (frozen):
                    # a mutable array's id could be reused after free
                    self._devbank[id(arr)] = (d, arr)
                    self._devbank_bytes_left -= arr.nbytes
                return d
            imgs = jnp.stack([dev(a) for a in batch["sample_images"]])
            masks = jnp.stack([dev(a) for a in batch["sample_masks"]])
            return imgs, masks
        return jnp.asarray(batch["images"]), jnp.asarray(batch["masks"])

    # ------------------------------------------------------------------
    def _preprocess_impl(self, imgs_u8, masks_u8, background_radius: int,
                         apply_bg: bool):
        """Device preprocessing, SegmentationDataset semantics
        (utils/data_loader.py:41-68): rolling ball at original size, resize
        512 (LINEAR image / NEAREST mask, albumentations A.Resize), /255."""
        size = self.cfg.img_size

        def one(img, mask):
            if apply_bg:
                img = rolling_ball_correction_rgb(img, background_radius)
            x = jax.vmap(lambda ch: resize_linear_u8_cv2exact(
                ch, (size, size)), in_axes=-1, out_axes=-1)(img)
            m = resize_nearest(mask, (size, size))
            return x.astype(jnp.float32) / 255.0, m.astype(jnp.float32)

        return jax.vmap(one)(imgs_u8, masks_u8)

    # ------------------------------------------------------------------
    def _metrics(self, probs, masks, valid):
        """valid: (B,) f32 sample weights (0 = DP tail-padding replica)."""
        thresh = self.cfg.metric_thresh
        pred = (probs > thresh).astype(jnp.float32)
        dice = dice_coef(masks, pred, weights=valid)
        w = valid.reshape((-1,) + (1,) * (masks.ndim - 1))
        acc_correct = jnp.sum((pred == masks) * w)
        return dice, acc_correct

    def _train_step_impl(self, params, batch_stats, opt_state, images, masks,
                         valid):
        def loss_of(p):
            logits, mutated = self.model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
                sample_mask=valid > 0.5)
            return (self.loss_fn(logits, masks, valid),
                    (jax.nn.sigmoid(logits), mutated["batch_stats"]))

        (loss, (probs, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        dice, correct = self._metrics(probs, masks, valid)
        return params, new_stats, opt_state, loss, dice, correct

    def _chunk_train_impl(self, params, batch_stats, opt_state, imgs_u8,
                          masks_u8, valid, keys, background_radius: int,
                          do_augment: bool):
        """K preprocess+augment+train steps in ONE dispatch (lax.scan over
        the leading K axis) — amortizes the relay's per-call latency, which
        otherwise dominates the 56 ms device step. Returns new state plus
        the chunk's summed (loss, dice, correct)."""
        def body(carry, xs):
            p, s, o, l, d, c = carry
            img, msk, v, key = xs
            x, m = self._preprocess_impl(img, msk, background_radius, True)
            if do_augment:
                x, m = augment_batch(key, x, m)
            p, s, o, loss, dice, corr = self._train_step_impl(
                p, s, o, x, m[..., None], v)
            return (p, s, o, l + loss, d + dice, c + corr), ()

        zero = jnp.float32(0)
        out, _ = lax.scan(body,
                          (params, batch_stats, opt_state, zero, zero, zero),
                          (imgs_u8, masks_u8, valid, keys))
        return out

    def _chunk_eval_impl(self, params, batch_stats, imgs_u8, masks_u8,
                         valid, background_radius: int,
                         want_masks: bool = False, out_hw=None):
        """K eval steps in one dispatch; summed metrics, plus (when
        `want_masks`) the thresholded pred masks nearest-resized to
        `out_hw` and BIT-PACKED per step — so mask-saving val epochs cost
        one fetch per CHUNK instead of one per batch (r3: mask-saving
        epochs previously fell back to the per-step path entirely). Same
        math as the per-step `_resize_pred_masks`, so the written PNGs are
        bit-identical."""
        def body(carry, xs):
            l, d, c, cnt = carry
            img, msk, v = xs
            x, m = self._preprocess_impl(img, msk, background_radius, True)
            probs, loss, dice, corr, counts = self._eval_step_impl(
                params, batch_stats, x, m[..., None], v)
            ys = ()
            if want_masks:
                pred = (probs[..., 0] > self.cfg.metric_thresh
                        ).astype(jnp.uint8)
                pm = jax.vmap(lambda p: resize_nearest(p, out_hw))(pred)
                ys = jax.vmap(lambda mm: jnp.packbits(mm.reshape(-1)))(pm)
            return (l + loss, d + dice, c + corr, cnt + counts), ys

        zero = jnp.float32(0)
        init = (zero, zero, zero, jnp.zeros(4, jnp.int32))
        out, ys = lax.scan(body, init, (imgs_u8, masks_u8, valid))
        return (*out, ys if want_masks else None)

    def _eval_step_impl(self, params, batch_stats, images, masks, valid):
        logits = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=False)
        probs = jax.nn.sigmoid(logits)
        loss = self.loss_fn(logits, masks, valid)
        dice, correct = self._metrics(probs, masks, valid)
        counts = confusion_counts(masks, probs, self.cfg.metric_thresh,
                                  sample_mask=valid > 0.5)
        return probs, loss, dice, correct, counts

    # ------------------------------------------------------------------
    def _device_batch(self, batch):
        """Returns (x, m, valid): preprocessed images/masks plus (B,) f32
        validity weights. Ragged tail batches are padded to a shardable size
        by replicating the last sample; the padding replicas carry weight 0
        so they are EXCLUDED from loss, gradients, BatchNorm statistics and
        all metrics (losses._wmean / models sample_mask) — padded and
        unpadded runs are numerically identical."""
        imgs, masks = self._stack_batch(batch)
        n_valid = int(batch.get("n_valid", imgs.shape[0]))
        valid = np.ones(imgs.shape[0], np.float32)
        valid[n_valid:] = 0.0
        if self.mesh is not None:
            from unetdc_tpu.core.mesh import DATA_AXIS, batch_sharding

            n_data = self.mesh.shape[DATA_AXIS]
            rem = imgs.shape[0] % n_data
            if rem:
                pad = n_data - rem
                imgs = jnp.concatenate(
                    [imgs, jnp.repeat(imgs[-1:], pad, axis=0)])
                masks = jnp.concatenate(
                    [masks, jnp.repeat(masks[-1:], pad, axis=0)])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            sd = 1 if self.cfg.shard_space else None
            imgs = jax.device_put(
                imgs, batch_sharding(self.mesh, imgs.ndim, space_dim=sd))
            masks = jax.device_put(
                masks, batch_sharding(self.mesh, masks.ndim, space_dim=sd))
            valid = jax.device_put(valid, batch_sharding(self.mesh, 1))
        x, m = self._preprocess(imgs, masks, self.cfg.background_radius, True)
        # mask channel dim (utils/data_loader.py:66-68)
        return x, m[..., None], jnp.asarray(valid)

    def _chunkable(self, batch) -> bool:
        """Full same-size batches fuse into scan chunks; ragged tails and
        odd-sized buckets fall back to the per-step path. Under a mesh the
        batch must split evenly over the 'data' axis (ragged batches are
        padded only on the per-step path)."""
        if not (self.cfg.step_chunk > 1
                and batch["n_valid"] == self.cfg.batch_size
                and batch["images"].shape[0] == self.cfg.batch_size):
            return False
        if self.mesh is not None:
            from unetdc_tpu.core.mesh import DATA_AXIS

            return self.cfg.batch_size % self.mesh.shape[DATA_AXIS] == 0
        return True

    def _shard_chunk(self, imgs, masks, valid):
        """device_put stacked (K, B, ...) chunk inputs with ('data',
        optional 'space') shardings so the scanned train/eval steps run
        SPMD exactly like the per-step path."""
        if self.mesh is None:
            return imgs, masks, valid
        from unetdc_tpu.core.mesh import chunk_sharding

        sd = 2 if self.cfg.shard_space else None
        imgs = jax.device_put(imgs,
                              chunk_sharding(self.mesh, imgs.ndim, sd))
        masks = jax.device_put(masks,
                               chunk_sharding(self.mesh, masks.ndim, sd))
        valid = jax.device_put(valid, chunk_sharding(self.mesh, valid.ndim))
        return imgs, masks, valid

    def run_epoch_train(self, data: SegmentationData, epoch: int):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed * 1000 + epoch)
        # per-step metric scalars stay ON DEVICE until the epoch ends: a
        # float()/int() per step is a blocking relay round trip (~0.1 s)
        # that also serializes dispatch, killing step pipelining
        dev_metrics = []
        tot_px = 0
        n_batches = 0
        px = cfg.img_size * cfg.img_size
        pend = []  # same-shape full batches awaiting one chunk dispatch

        def step_one(batch, sub):
            x, m, valid = self._device_batch(batch)
            if cfg.augment:
                x, m2 = augment_batch(sub, x, m[..., 0])
                m = m2[..., None]
            (self.variables["params"], self.variables["batch_stats"],
             self.opt_state, loss, dice, correct) = self._train_step(
                self.variables["params"], self.variables["batch_stats"],
                self.opt_state, x, m, valid)
            dev_metrics.append((loss, dice, correct))

        def flush(pend):
            if len(pend) == 1:
                step_one(*pend[0])
                return
            stacked = [self._stack_batch(b) for b, _ in pend]
            imgs = jnp.stack([s[0] for s in stacked])
            masks = jnp.stack([s[1] for s in stacked])
            valid = jnp.ones((len(pend), cfg.batch_size), jnp.float32)
            imgs, masks, valid = self._shard_chunk(imgs, masks, valid)
            keys = jnp.stack([k for _, k in pend])
            (self.variables["params"], self.variables["batch_stats"],
             self.opt_state, loss, dice, correct) = self._chunk_train(
                self.variables["params"], self.variables["batch_stats"],
                self.opt_state, imgs, masks, valid, keys,
                cfg.background_radius, cfg.augment)
            dev_metrics.append((loss, dice, correct))

        for batch in Prefetcher(data.batches()):
            # one key split per batch regardless of path: the chunked and
            # per-step loops consume the identical PRNG stream
            key, sub = jax.random.split(key)
            tot_px += batch["n_valid"] * px
            n_batches += 1
            if not self._chunkable(batch):
                for p in pend:
                    step_one(*p)
                pend = []
                step_one(batch, sub)
                continue
            pend.append((batch, sub))
            if (len(pend) == cfg.step_chunk or
                    pend[0][0]["images"].shape != batch["images"].shape):
                same = [p for p in pend
                        if p[0]["images"].shape == pend[0][0]["images"].shape]
                rest = pend[len(same):]
                flush(same)
                pend = rest
        while pend:
            shape = pend[0][0]["images"].shape
            same = [p for p in pend if p[0]["images"].shape == shape]
            flush(same)
            pend = pend[len(same):]
        tot_loss, tot_dice, tot_correct = self._sum_metrics(dev_metrics)
        return (tot_loss / max(n_batches, 1), tot_dice / max(n_batches, 1),
                tot_correct / max(tot_px, 1))

    @staticmethod
    def _sum_metrics(dev_metrics):
        """One stack + one fetch for an epoch's per-step device scalars;
        exact f64 summation happens on the host (on-device f32 accumulation
        would lose pixel-count exactness past 2^24)."""
        if not dev_metrics:
            return tuple(0.0 for _ in range(3))
        stacked = np.asarray(jnp.stack([jnp.stack(t) for t in dev_metrics]))
        return tuple(stacked.astype(np.float64).sum(axis=0))

    def run_epoch_eval(self, data: SegmentationData,
                      save_masks_dir: Optional[str] = None):
        dev_metrics = []
        dev_counts = []
        tot_px = 0
        n_batches = 0
        px = self.cfg.img_size * self.cfg.img_size
        pend = []

        def flush(pend):
            stacked = [self._stack_batch(b) for b in pend]
            imgs = jnp.stack([s[0] for s in stacked])
            masks = jnp.stack([s[1] for s in stacked])
            valid = jnp.ones((len(pend), self.cfg.batch_size), jnp.float32)
            imgs, masks, valid = self._shard_chunk(imgs, masks, valid)
            want_masks = save_masks_dir is not None
            # chunk batches share images.shape, hence one orig_size
            out_hw = tuple(pend[0]["orig_size"]) if want_masks else None
            loss, dice, correct, counts, mask_bits = self._chunk_eval(
                self.variables["params"], self.variables["batch_stats"],
                imgs, masks, valid, self.cfg.background_radius,
                want_masks, out_hw)
            dev_metrics.append((loss, dice, correct))
            dev_counts.append(counts)
            if want_masks:
                bits = np.asarray(mask_bits)  # ONE fetch per chunk
                oh, ow = out_hw
                for i, b in enumerate(pend):
                    m = np.unpackbits(bits[i], axis=-1)[:, :oh * ow]
                    self._write_mask_pngs(
                        m.reshape(-1, oh, ow) * 255, b, save_masks_dir)

        def step_one(batch):
            x, m, valid = self._device_batch(batch)
            probs, loss, dice, correct, counts = self._eval_step(
                self.variables["params"], self.variables["batch_stats"], x, m,
                valid)
            dev_metrics.append((loss, dice, correct))
            dev_counts.append(counts)
            if save_masks_dir is not None:
                self._save_pred_masks(probs, batch, save_masks_dir)

        for batch in Prefetcher(data.batches()):
            tot_px += batch["n_valid"] * px
            n_batches += 1
            if not self._chunkable(batch):
                while pend:
                    shape = pend[0]["images"].shape
                    same = [b for b in pend if b["images"].shape == shape]
                    flush(same)
                    pend = pend[len(same):]
                step_one(batch)
                continue
            pend.append(batch)
            if (len(pend) == self.cfg.step_chunk or
                    pend[0]["images"].shape != batch["images"].shape):
                shape = pend[0]["images"].shape
                same = [b for b in pend if b["images"].shape == shape]
                flush(same)
                pend = pend[len(same):]
        while pend:
            shape = pend[0]["images"].shape
            same = [b for b in pend if b["images"].shape == shape]
            flush(same)
            pend = pend[len(same):]
        tot_loss, tot_dice, tot_correct = self._sum_metrics(dev_metrics)
        counts_sum = (np.asarray(jnp.stack(dev_counts)).astype(np.int64)
                      .sum(axis=0) if dev_counts else np.zeros(4, np.int64))
        return (tot_loss / max(n_batches, 1), tot_dice / max(n_batches, 1),
                tot_correct / max(tot_px, 1), counts_sum)

    def _save_pred_masks(self, probs, batch, out_dir: str):
        """Reference val-mask saving (train_DC_focal.py:313-331): binarize
        at 0.3, resize to original size with TRUE nearest-neighbor (the
        trainer uses keyword interpolation=INTER_NEAREST at :324, unlike
        the inference scripts' dst-slot bug), save {base}_pred.png. (The
        reference only saves its last batch due to an indentation bug; we
        save every batch.)"""
        oh, ow = batch["orig_size"]
        # threshold + nearest-resize the whole batch on device and fetch the
        # uint8 masks in ONE transfer (fetching f32 probs then resizing
        # per image costs several relay round trips per image)
        masks = np.asarray(self._resize_pred_masks(probs, (oh, ow)))
        self._write_mask_pngs(masks, batch, out_dir)

    @staticmethod
    def _write_mask_pngs(masks, batch, out_dir: str):
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        for j in range(batch["n_valid"]):
            base = os.path.splitext(batch["filenames"][j])[0]
            out_path = os.path.join(out_dir, f"{base}_pred.png")
            Image.fromarray(masks[j].astype(np.uint8)).save(out_path)
            print(f"Saved predicted mask: {out_path}")

    @functools.partial(jax.jit, static_argnames=("self", "out_hw"))
    def _resize_pred_masks(self, probs, out_hw):
        pred = (probs[..., 0] > self.cfg.metric_thresh).astype(jnp.uint8)
        return jax.vmap(lambda p: resize_nearest(p, out_hw))(pred) * 255

    # ------------------------------------------------------------------
    def fit(self, train_data: SegmentationData, val_data: SegmentationData):
        """Epoch driver with reference-format stdout and early stopping."""
        from unetdc_tpu.checkpoint.native import BestMetricCheckpointer

        cfg = self.cfg
        gate = BestMetricCheckpointer(cfg.ckpt_path, patience=cfg.patience,
                                      mode="max")
        plateau_best = float("inf")
        plateau_count = 0
        start_epoch = 0
        if cfg.resume and (os.path.exists(cfg.ckpt_path)
                           or os.path.exists(cfg.ckpt_path + ".last")):
            from unetdc_tpu.checkpoint.native import (load_checkpoint,
                                                      load_metadata)
            from flax import serialization

            # Prefer the LAST-epoch checkpoint (saved every epoch alongside
            # best): resuming from it reproduces the uninterrupted run
            # exactly — per-epoch PRNG keys are stateless (seed*1000+epoch)
            # and the Adam moments continue from where they stopped. The
            # best-only fallback (reference semantics,
            # train_DC_focal.py:348-358 saves only on improvement) rewinds
            # the trajectory to the best epoch and says so.
            last_path = cfg.ckpt_path + ".last"
            from_last = os.path.exists(last_path)
            src = last_path if from_last else cfg.ckpt_path
            blob = load_checkpoint(src)
            if from_last and isinstance(blob, dict) and "state" in blob:
                # self-consistent bundle: weights + opt + counters from the
                # SAME epoch by construction (single os.replace)
                self.variables = blob["variables"]
                self.opt_state = serialization.from_state_dict(
                    self.opt_state, blob["opt"])
                st = blob["state"]
                start_epoch = int(st["last_epoch"]) + 1
                bm = float(st["best_metric"])
                if "has_best" in st:
                    gate.best = bm if int(st["has_best"]) else None
                else:  # pre-r5 checkpoints: NaN-as-sentinel heuristic
                    gate.best = None if np.isnan(bm) else bm
                gate.counter = int(st["patience_counter"])
                plateau_best = float(st["plateau_best"])
                plateau_count = int(st["plateau_count"])
            else:
                self.variables = blob
                opt_path = src + ".opt"
                if os.path.exists(opt_path):
                    with open(opt_path, "rb") as f:
                        self.opt_state = serialization.from_bytes(
                            self.opt_state, f.read())
                meta = load_metadata(src) or {}
                state_path = cfg.ckpt_path + ".state.json"
                if os.path.exists(state_path):
                    import json

                    st = json.load(open(state_path))
                    start_epoch = int(st["last_epoch"]) + 1
                    gate.best = (float(st["best_metric"])
                                 if st["best_metric"] is not None else None)
                    gate.counter = int(st["patience_counter"])
                    pb = st.get("plateau_best")
                    plateau_best = (float(pb) if pb is not None
                                    else float("inf"))
                    plateau_count = int(st.get("plateau_count", 0))
                else:  # older checkpoints: best-epoch metadata only
                    start_epoch = int(meta.get("epoch", -1)) + 1
                    # a best-only checkpoint's own val_dice IS the best
                    gate.best = float(meta.get(
                        "best_metric", meta.get("val_dice", 0.0)))
            note = ("" if from_last else
                    " NOTE: weights restored are the BEST checkpoint, not "
                    "the last epoch's.")
            print(f"Resumed from {src} at epoch {start_epoch} "
                  f"(best val dice {(gate.best or 0.0):.4f}).{note}")
        for epoch in range(start_epoch, cfg.num_epochs):
            t0 = time.time()
            tr_loss, tr_dice, tr_acc = self.run_epoch_train(train_data, epoch)
            va_loss, va_dice, va_acc, _ = self.run_epoch_eval(
                val_data, cfg.save_val_masks_dir)
            h = self.history
            h["train_loss"].append(tr_loss)
            h["val_loss"].append(va_loss)
            h["train_dice"].append(tr_dice)
            h["val_dice"].append(va_dice)
            h["train_acc"].append(tr_acc)
            h["val_acc"].append(va_acc)

            # exact reference stdout format (train_DC_focal.py:342-346)
            print(f"Epoch {epoch+1}/{cfg.num_epochs} | "
                  f"Train Loss: {tr_loss:.4f}, Val Loss: {va_loss:.4f}, "
                  f"Train Dice: {tr_dice:.4f}, Val Dice: {va_dice:.4f}")
            print(f"Train Acc: {tr_acc:.4f}, Val Acc: {va_acc:.4f}")
            print("-------------------------------------------------------")
            if cfg.history_jsonl:
                import json

                with open(cfg.history_jsonl, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch + 1, "train_loss": tr_loss,
                        "val_loss": va_loss, "train_dice": tr_dice,
                        "val_dice": va_dice, "train_acc": tr_acc,
                        "val_acc": va_acc,
                        "elapsed_s": time.time() - t0}) + "\n")

            if cfg.plateau_scheduler:
                # ReduceLROnPlateau(mode='min', factor=0.5, patience=5) —
                # the fix the reference configured but never invoked
                if va_loss < plateau_best - 1e-12:
                    plateau_best = va_loss
                    plateau_count = 0
                else:
                    plateau_count += 1
                    if plateau_count > 5:
                        hp = dict(self.opt_state.hyperparams)
                        hp["learning_rate"] = hp["learning_rate"] * 0.5
                        self.opt_state = self.opt_state._replace(
                            hyperparams=hp)
                        plateau_count = 0

            improved = gate.is_improvement(va_dice)
            stop = gate.update(va_dice, self.variables,
                               {"epoch": epoch, "val_dice": va_dice,
                                "elapsed_s": time.time() - t0})
            if improved:
                # optimizer state saved alongside so --resume continues the
                # Adam moments rather than resetting them
                from flax import serialization

                with open(cfg.ckpt_path + ".opt", "wb") as f:
                    f.write(serialization.to_bytes(
                        jax.tree_util.tree_map(np.asarray, self.opt_state)))
                if cfg.export_pth:
                    self._export_pth(cfg.export_pth)
                print("Model saved!")
            import json

            if cfg.save_last:
                # last-epoch weights + optimizer + FULL resume state in ONE
                # atomically-replaced msgpack file, so --resume continues
                # the exact trajectory and an interruption at ANY point
                # leaves a self-consistent epoch boundary (weights, Adam
                # moments and counters can never come from different
                # epochs — they live in the same os.replace)
                from flax import serialization

                save_checkpoint(cfg.ckpt_path + ".last", {
                    "variables": self.variables,
                    "opt": serialization.to_state_dict(
                        jax.tree_util.tree_map(np.asarray, self.opt_state)),
                    "state": {
                        "last_epoch": np.int64(epoch),
                        "val_dice": np.float64(va_dice),
                        "best_metric": np.float64(
                            gate.best if gate.best is not None
                            else np.nan),
                        # explicit flag: NaN is a legal best metric for a
                        # diverged run, so it cannot double as the
                        # "no best yet" sentinel
                        "has_best": np.int64(
                            1 if gate.best is not None else 0),
                        "patience_counter": np.int64(gate.counter),
                        "plateau_best": np.float64(plateau_best),
                        "plateau_count": np.int64(plateau_count),
                    }}, {"epoch": epoch, "val_dice": va_dice})
            # state.json: the resume source for best-only checkpoints (and
            # external tooling); the .last bundle carries its own copy
            tmp = cfg.ckpt_path + ".state.json.tmp"
            with open(tmp, "w") as f:
                json.dump({"last_epoch": epoch,
                           "best_metric": gate.best,
                           "patience_counter": gate.counter,
                           "plateau_best": (plateau_best if plateau_best != float("inf") else None),
                           "plateau_count": plateau_count}, f)
            os.replace(tmp, cfg.ckpt_path + ".state.json")
            if stop:
                print("Early stopping!")
                break
        return self.history

    def _export_pth(self, path: str):
        """Export weights in the reference .pth layout (needs torch)."""
        from unetdc_tpu.checkpoint.convert import variables_to_torch_state_dict

        sd = variables_to_torch_state_dict(
            jax.tree_util.tree_map(np.asarray, self.variables))
        try:
            import torch

            torch.save({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()}, path)
        except ImportError:
            np.savez(path + ".npz", **sd)

    # ------------------------------------------------------------------
    def plot_curves(self, out_path: str = "loss_and_dice_focal_plot.png",
                    acc_path: str = "accuracy_plot.png"):
        """Loss/dice and accuracy curve artifacts
        (train_DC_focal.py:470-504)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        h = self.history
        epochs = range(1, len(h["train_loss"]) + 1)
        plt.figure(figsize=(12, 4))
        plt.subplot(1, 2, 1)
        plt.plot(epochs, h["train_loss"], label="Training Loss", color="red")
        plt.plot(epochs, h["val_loss"], label="Validation Loss",
                 color="green")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.legend()
        plt.title("Training and Validation Loss")
        plt.subplot(1, 2, 2)
        plt.plot(epochs, h["train_dice"], label="Training Dice & focal",
                 color="red")
        plt.plot(epochs, h["val_dice"], label="Validation Dice",
                 color="green")
        plt.xlabel("Epoch")
        plt.ylabel("Dice")
        plt.legend()
        plt.title("Training and Validation Dice_Focal")
        plt.tight_layout()
        plt.savefig(out_path)
        plt.close()

        plt.figure(figsize=(6, 4))
        plt.plot(epochs, h["train_acc"], label="Training Accuracy")
        plt.plot(epochs, h["val_acc"], label="Validation Accuracy")
        plt.xlabel("Epoch")
        plt.ylabel("Accuracy")
        plt.legend()
        plt.title("Training and Validation Accuracy")
        plt.tight_layout()
        plt.savefig(acc_path)
        plt.close()
