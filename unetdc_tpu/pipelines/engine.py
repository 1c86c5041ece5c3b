"""The flagship inference engine: one jitted megastep from raw RGB bytes to
droplet tables, entirely on device.

Reference pipeline (quantify_droplets_batch.py:40-95) round-trips
host<->device per batch and then runs skimage/OpenCV serially on the host:
    PIL decode -> cv2 rolling ball -> cv2 resize -> torch forward ->
    .cpu() -> threshold -> cv2 resize -> skimage label x2 -> regionprops.
Here everything after decode is a single XLA program:
    rolling ball (windowed min/max) -> resize (bit-exact cv2 kernel) ->
    UNetDC (BN-folded, bf16) -> threshold -> cv2-exact mask resize ->
    CC labeling (segmented-scan propagation) -> sieve -> regionprops
    (segment sums into compact tables).
Only uint8 images go in; bit-packed masks + fixed-size droplet property
tables come out (device->host transfer is the scarce resource).

Shapes are static per (batch, input size); the host driver buckets images by
original size and pads the final partial batch (valid-count masked) so each
bucket compiles exactly once.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unetdc_tpu.models.unet import UNetDC, fold_batchnorm
from unetdc_tpu.ops.connected_components import quantify_mask_batch
from unetdc_tpu.ops.resize import resize_linear_u8_cv2exact
from unetdc_tpu.ops.rolling_ball import rolling_ball_correction_rgb
from unetdc_tpu.core.mesh import batch_sharding


class QuantifyEngine:
    """Batch segmentation + quantification on TPU.

    Args:
      variables: model variables ({'params', 'batch_stats'}) of a use_bn
        UNetDC — BatchNorm is folded once at construction.
      model_cls: UNetDC (default) or UNet.
      img_size: network input size (512, quantify_droplets_batch.py:30).
      compute_dtype: jnp.bfloat16 (TPU fast path) or jnp.float32 (parity).
      max_labels: per-image component capacity of the property tables.
      mesh: optional jax.sharding.Mesh for multi-chip batch parallelism.
    """

    # subclasses override to receive the pre-sieve component table
    _want_presieve = False

    def __init__(self, variables, model_cls=UNetDC, img_size: int = 512,
                 compute_dtype: Any = jnp.bfloat16, max_labels: int = 4096,
                 mesh=None, shard_space: bool = False,
                 quantize: str | None = None):
        """`shard_space` additionally splits the image height over the
        mesh's 'space' axis (XLA inserts conv halo exchanges and scan
        collectives automatically) — the scaling axis for images larger
        than one chip's HBM/compute (SURVEY §5 spatial axis).

        `quantize="int8"` selects the post-training-quantized forward
        (models/unet_int8.py; MXU double-rate int8 path): activation scales
        are calibrated on the FIRST batch this engine sees, then every
        batch runs the int8 megastep. Not bit-parity — an opt-in speed
        mode; see the module docstring for the guarantees."""
        self.shard_space = shard_space
        self.model = model_cls(use_bn=False, dtype=compute_dtype)
        self.img_size = img_size
        self.max_labels = max_labels
        self.mesh = mesh
        self._dilations = tuple(self.model.dilations)
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        if quantize == "int8" and (self._dilations[0] != 1 or img_size % 2):
            raise ValueError("int8 path requires undilated enc1 (pair "
                             "layout) and an even img_size")
        self.quantize = quantize
        folded = fold_batchnorm(variables)
        # TPU fast forward: pair-packed 64-channel stages + conv_transpose
        # upconvs (models/unet_fast.py) — same MACs grouped differently,
        # ~16% faster forward on v5e. Auto-enabled for bf16 only: f32 is
        # the parity dtype whose op-for-op order matches the torch
        # reference bit-exactly (tests/test_pipeline_e2e.py), and the fast
        # path's different summation order would break that contract.
        # UNETDC_TPU_FAST_FWD=1/0 forces it on/off for either dtype.
        env = os.environ.get("UNETDC_TPU_FAST_FWD", "auto")
        if env in ("0", "1"):
            want = env == "1"
        else:
            want = jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
        self._use_fast = (quantize is None and want
                          and self._dilations[0] == 1 and img_size % 2 == 0)
        if quantize == "int8":
            # params materialize lazily at first dispatch (calibration
            # needs a representative batch); keep the folded f32 weights
            # host-side for the calibration forward + quantizer.
            self._folded_np = jax.tree_util.tree_map(
                np.asarray, folded["params"])
            self.params = None
        elif self._use_fast:
            from unetdc_tpu.models.unet_fast import build_fast_params
            self.params = build_fast_params(folded["params"],
                                            dtype=compute_dtype)
        else:
            self.params = folded
        if mesh is not None and self.params is not None:
            from unetdc_tpu.core.mesh import replicate
            self.params = replicate(mesh, self.params)
        # params are traced arguments (NOT closed-over constants) so the
        # 31M-weight pytree lives in HBM, not in the compiled HLO
        self._megastep = jax.jit(
            self._megastep_packed_impl,
            static_argnames=("out_hw", "background_radius", "apply_bg",
                             "max_labels"))
        self._layouts: Dict[Any, Any] = {}
        self._forward = jax.jit(self._apply_model)

    def _apply_model(self, params, x):
        """Jittable forward: probabilities (B, S, S, 1) float32."""
        if self.quantize == "int8":
            from unetdc_tpu.models.unet_int8 import forward_int8
            return forward_int8(params, x, self._dilations)
        if self._use_fast:
            from unetdc_tpu.models.unet_fast import forward_folded
            return forward_folded(params, x, self._dilations)
        return self.model.apply(params, x, train=False)

    def _preprocess(self, imgs_u8, background_radius: int, apply_bg: bool):
        """Jittable (B,H,W,3) uint8 -> (B,S,S,3) f32 in [0,1]."""
        size = self.img_size

        def preprocess(img):
            if apply_bg:
                img = rolling_ball_correction_rgb(img, background_radius)
            # reference resize is effectively INTER_LINEAR (see ops.resize);
            # bit-exact uint8 path so model inputs match the reference's
            x = jax.vmap(
                lambda ch: resize_linear_u8_cv2exact(ch, (size, size)),
                in_axes=-1, out_axes=-1)(img)
            return x.astype(jnp.float32) / 255.0

        return jax.vmap(preprocess)(imgs_u8).astype(jnp.float32)

    def _calibrate_int8(self, arr, *, preprocessed: bool = False,
                        background_radius: int = 50, apply_bg: bool = True):
        """Build the int8 params from ONE representative batch (runs once).

        Runs the exact f32 fast forward (`unet_int8.forward_calib`) over the
        batch, fetches the 23 activation maxima as one vector, quantizes on
        the host (`build_int8_params`), and uploads the int8 pytree. The
        calibration program compiles separately from the megastep; both hit
        the persistent compile cache on later runs."""
        from unetdc_tpu.models.unet_fast import build_fast_params
        from unetdc_tpu.models import unet_int8 as qi

        fp32 = build_fast_params(self._folded_np, dtype=jnp.float32)

        def calib(fp, a):
            x = a if preprocessed else self._preprocess(
                a, background_radius, apply_bg)
            return qi.forward_calib(fp, x, self._dilations)[1]

        maxima = np.asarray(jax.jit(calib)(fp32, arr))
        qp = qi.build_int8_params(self._folded_np, maxima, self._dilations)
        self.params = jax.tree_util.tree_map(jnp.asarray, qp)
        if self.mesh is not None:
            from unetdc_tpu.core.mesh import replicate
            self.params = replicate(self.mesh, self.params)

    # ------------------------------------------------------------------
    def _megastep_impl(self, params, imgs_u8: jax.Array, thresh: jax.Array,
                       min_area: jax.Array, out_hw: Tuple[int, int],
                       background_radius: int, apply_bg: bool,
                       max_labels: int = None) -> Dict[str, jax.Array]:
        """(B, H, W, 3) uint8 -> masks + per-droplet property tables.
        `max_labels` (static; default: the engine's) is an explicit arg so
        the overflow-rescue path can recompile at a larger cap without
        mutating engine state under the jit cache's feet."""
        if max_labels is None:
            max_labels = self.max_labels
        x = self._preprocess(imgs_u8, background_radius, apply_bg)
        probs = self._apply_model(params, x)  # (B,S,S,1)
        mask512 = (probs[..., 0] > thresh).astype(jnp.uint8)

        masks = jax.vmap(
            lambda m512: resize_linear_u8_cv2exact(m512, out_hw))(mask512)
        # subclasses that also need the pre-sieve component table set
        # _want_presieve so the (expensive) propagation runs only once
        stats = quantify_mask_batch(masks, min_area, max_labels,
                                    connectivity=1,
                                    want_presieve=self._want_presieve)
        # pack masks to bits: device->host links are the pipeline's
        # scarcest resource; host unpacks with np.unpackbits
        packed = jax.vmap(lambda m: jnp.packbits(m.reshape(-1)))(masks)
        out = {"mask_bits": packed, "count": stats["count"],
               "total": stats["total"], "area": stats["area"]}
        for k in ("sum-0-lo", "sum-0-hi", "sum-1-lo", "sum-1-hi",
                  "sum-0-lo16", "sum-0-hi16", "sum-1-lo16", "sum-1-hi16"):
            if k in stats:  # key set depends on the image-size plan
                out[k] = stats[k]
        if self._want_presieve:
            for k in ("all_area", "all_sum-0", "all_sum-1", "all_count"):
                out[k] = stats[k]
        return out

    def _megastep_packed_impl(self, params, imgs_u8, thresh, min_area,
                              out_hw, background_radius, apply_bg,
                              max_labels: int = None) -> jax.Array:
        """Megastep + flatten every output into ONE (B, bytes) uint8 buffer.

        The axon relay charges ~0.1 s dispatch latency PER transfer call;
        fetching the ~8 output arrays separately costs ~0.8 s/batch of pure
        latency, dwarfing the 38 ms of compute. Concatenating (device-side
        bitcast to uint8) makes the device->host fetch a single call. The
        host splits the buffer by the static layout (`_layout_for`)."""
        out = self._megastep_impl(params, imgs_u8, thresh, min_area, out_hw,
                                  background_radius, apply_bg, max_labels)
        b = imgs_u8.shape[0]
        parts = []
        for k in sorted(out):
            v = out[k]
            u8 = (v if v.dtype == jnp.uint8
                  else jax.lax.bitcast_convert_type(v, jnp.uint8))
            parts.append(u8.reshape(b, -1))
        return jnp.concatenate(parts, axis=1)

    def _layout_for(self, batch: int, in_hw: Tuple[int, int],
                    out_hw: Tuple[int, int], max_labels: int = None):
        """[(key, np.dtype, shape, byte_offset, row_bytes)] for the packed
        buffer — derived via eval_shape (no compile, no device traffic).
        Only shapes matter: thresh/min_area/radius don't affect them."""
        if max_labels is None:
            max_labels = self.max_labels
        cache_key = (batch, in_hw, out_hw, max_labels)
        if cache_key not in self._layouts:
            imgs = jax.ShapeDtypeStruct((batch, *in_hw, 3), jnp.uint8)
            out = jax.eval_shape(
                lambda p, x: self._megastep_impl(
                    p, x, jnp.float32(0.3), jnp.int32(1), out_hw, 50, True,
                    max_labels),
                self.params, imgs)
            layout, off = [], 0
            for k in sorted(out):
                sh, dt = out[k].shape, np.dtype(out[k].dtype)
                nb = int(np.prod(sh[1:], dtype=np.int64)) * dt.itemsize
                layout.append((k, dt, tuple(sh), off, nb))
                off += nb
            self._layouts[cache_key] = layout
        return self._layouts[cache_key]

    # ------------------------------------------------------------------
    def dispatch_batch(self, imgs_u8: np.ndarray, out_hw: Tuple[int, int],
                       prob_thresh: float = 0.3, min_area: int = 1,
                       background_radius: int = 50, apply_bg: bool = True):
        """Asynchronously enqueue one megastep; returns device arrays.
        JAX dispatch is async, so callers can enqueue batch k+1 before
        fetching batch k — overlapping device compute with host IO."""
        from unetdc_tpu.utils.profiling import stage_timer

        with stage_timer("h2d_upload"):
            x = jnp.asarray(imgs_u8)
        if self.mesh is not None:
            space_dim = 1 if self.shard_space else None
            x = jax.device_put(
                x, batch_sharding(self.mesh, x.ndim, space_dim=space_dim))
        if self.quantize == "int8" and self.params is None:
            self._calibrate_int8(x, background_radius=int(background_radius),
                                 apply_bg=bool(apply_bg))
        packed = self._megastep(
            self.params, x, jnp.float32(prob_thresh), jnp.int32(min_area),
            tuple(out_hw), int(background_radius), bool(apply_bg))
        layout = self._layout_for(imgs_u8.shape[0], imgs_u8.shape[1:3],
                                  tuple(out_hw))
        # the device input rides along so fetch_batch can transparently
        # re-run the batch at a larger table cap on component overflow
        retry_ctx = (x, float(prob_thresh), int(min_area),
                     int(background_radius), bool(apply_bg))
        return packed, layout, retry_ctx

    def fetch_batch(self, out, out_hw: Tuple[int, int]
                    ) -> Dict[str, np.ndarray]:
        """Transfer a dispatched batch to host + unpack masks (ONE device
        transfer: the handle is a packed uint8 buffer + its layout)."""
        retry_ctx = None
        if isinstance(out, dict):  # already-split arrays (tests, library)
            host = jax.tree_util.tree_map(np.asarray, out)
        else:
            packed, layout, retry_ctx = out
            buf = np.asarray(packed)  # the single device->host transfer
            # Guard the _layout_for invariant (shapes independent of
            # thresh/min_area/radius/apply_bg): if a future megastep change
            # makes a shape depend on one of them, fail loudly here instead
            # of silently mis-slicing the buffer.
            expect = layout[-1][3] + layout[-1][4] if layout else 0
            if buf.shape[1] != expect:
                raise RuntimeError(
                    f"packed megastep buffer is {buf.shape[1]} bytes/row but "
                    f"the static layout expects {expect}: an output shape "
                    "now depends on a non-shape arg — update _layout_for")
            host = {}
            for k, dt, sh, off, nb in layout:
                seg = np.ascontiguousarray(buf[:, off:off + nb])
                host[k] = seg.view(dt).reshape(sh)
        total_max = int(host["total"].max())
        if total_max > self.max_labels:
            if retry_ctx is None:
                # split-dict callers carry no inputs to re-run (tests,
                # library one-shots): fail loudly rather than truncate
                raise RuntimeError(
                    f"image has {total_max} components, exceeding "
                    f"max_labels={self.max_labels}; rebuild the engine "
                    "with a larger max_labels")
            # Degrade-to-correct (the reference's host skimage path has no
            # component cap, quantify_droplets_batch.py:82): transparently
            # re-run THIS batch at the next power-of-two cap that fits.
            # Costs one extra compile + step — correctness over speed.
            host = self._rerun_with_cap(total_max, retry_ctx, out_hw)
        b = host["mask_bits"].shape[0]
        oh, ow = out_hw
        host["mask"] = np.unpackbits(
            host.pop("mask_bits"), axis=-1)[:, :oh * ow].reshape(b, oh, ow)
        return host

    def _rerun_with_cap(self, total_max: int, retry_ctx, out_hw):
        """Overflow rescue: re-run one batch with the table cap raised to
        the next power of two >= the exact component count (`total` is
        exact regardless of the cap — it is counted from the propagation
        roots, not the table). The larger-cap program compiles once and is
        cached per cap, so repeated dense batches pay the compile once."""
        import sys

        x, prob_thresh, min_area, background_radius, apply_bg = retry_ctx
        cap = max(2 * self.max_labels, 2)
        while cap < total_max:
            cap *= 2
        print(f"unetdc_tpu: batch has an image with {total_max} components "
              f"(> max_labels={self.max_labels}); re-running it at cap "
              f"{cap} (one-off recompile)", file=sys.stderr)
        packed = self._megastep(
            self.params, x, jnp.float32(prob_thresh), jnp.int32(min_area),
            tuple(out_hw), int(background_radius), bool(apply_bg),
            max_labels=cap)
        layout = self._layout_for(x.shape[0], x.shape[1:3], tuple(out_hw),
                                  max_labels=cap)
        buf = np.asarray(packed)
        host = {}
        for k, dt, sh, off, nb in layout:
            seg = np.ascontiguousarray(buf[:, off:off + nb])
            host[k] = seg.view(dt).reshape(sh)
        assert int(host["total"].max()) <= cap  # exact count, cap fits
        return host

    def run_batch(self, imgs_u8: np.ndarray, out_hw: Tuple[int, int],
                  prob_thresh: float = 0.3, min_area: int = 1,
                  background_radius: int = 50, apply_bg: bool = True
                  ) -> Dict[str, np.ndarray]:
        """Synchronous host entry: uint8 (B, H, W, 3) -> numpy results."""
        out = self.dispatch_batch(imgs_u8, out_hw, prob_thresh, min_area,
                                  background_radius, apply_bg)
        return self.fetch_batch(out, out_hw)

    # ------------------------------------------------------------------
    def forward_probs(self, x_f32: jax.Array) -> jax.Array:
        """Plain jitted forward on preprocessed (B, S, S, 3) in [0,1] —
        used by benchmarks and the library API."""
        if self.quantize == "int8" and self.params is None:
            self._calibrate_int8(x_f32, preprocessed=True)
        return self._forward(self.params, x_f32)


def load_engine(ckpt_path: str, mesh=None, fast: bool = True,
                model_cls=UNetDC, max_labels: int = 4096,
                quantize: str | None = None) -> QuantifyEngine:
    """Build an engine from a reference .pth or native msgpack checkpoint.
    `fast` selects the bf16 dtype policy (core.dtypes.default_policy);
    `quantize="int8"` the calibrated int8 forward (models/unet_int8.py)."""
    from unetdc_tpu.checkpoint import (
        load_pth_state_dict, torch_state_dict_to_variables, load_checkpoint)
    from unetdc_tpu.core.dtypes import default_policy

    if ckpt_path.endswith(".pth"):
        variables = torch_state_dict_to_variables(
            load_pth_state_dict(ckpt_path))
    else:
        variables = load_checkpoint(ckpt_path)
    return QuantifyEngine(
        variables, model_cls=model_cls,
        compute_dtype=default_policy(fast).compute_dtype,
        max_labels=max_labels, mesh=mesh, quantize=quantize)
