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


def grayscale_view(imgs_u8: np.ndarray):
    """Return a (B,H,W) single-channel view when every pixel of the
    (B,H,W,3) batch has all channels equal, else the input unchanged.

    Host-side half of the grayscale upload fast path: microscopy sources
    are typically grayscale saved as RGB (measured true of the reference's
    own committed data — see QuantifyEngine._preprocess), and the
    host->device link is the e2e bottleneck, so uploading one channel is a
    3x cut of the dominant cost. The equality check streams ~2 bytes/pixel
    of numpy compare (~10 ms per 6 MB batch on this host) and runs inside
    the pipeline's dispatch thread, so it overlaps the link anyway.
    Exactness: the engine broadcasts the channel back to 3 on device before
    the model, so results are bit-identical to the RGB upload."""
    if imgs_u8.ndim != 4 or imgs_u8.shape[-1] != 3:
        return imgs_u8
    c0 = imgs_u8[..., 0]
    if np.array_equal(c0, imgs_u8[..., 1]) and \
            np.array_equal(c0, imgs_u8[..., 2]):
        return np.ascontiguousarray(c0)
    return imgs_u8


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
                 quantize: str | None = None, calib_path=None):
        """`shard_space` additionally splits the image height over the
        mesh's 'space' axis (XLA inserts conv halo exchanges and scan
        collectives automatically) — the scaling axis for images larger
        than one chip's HBM/compute (SURVEY §5 spatial axis).

        `quantize="int8"` selects the post-training-quantized forward
        (models/unet_int8.py; MXU double-rate int8 path): activation scales
        come from `calib_path` (a `unet_int8.save_calibration` sidecar) when
        that file exists, from an explicit `calibrate_int8(...)` call, or —
        fallback — from the FIRST batch this engine sees. When calibration
        runs and `calib_path` is set, the scales are saved there, so every
        later run over the same checkpoint produces identical masks
        regardless of dataset order. Not bit-parity — an opt-in speed
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
        # Fused Pallas kernels for the thin-channel stages
        # (ops/pallas_conv.py: enc1.conv1+pool1 and upconv1+dec1+out_conv
        # fused; measured r5 forward 23.7 -> 21.6 ms/batch-8 same-process
        # interleaved A/B). Single-chip only — pallas_call has no GSPMD
        # partitioning rule, so any mesh keeps the pure-XLA path.
        # UNETDC_TPU_PALLAS=0 disables; =interp runs the kernels in
        # interpreter mode (CPU tests).
        penv = os.environ.get("UNETDC_TPU_PALLAS", "auto")
        self._pallas_interp = penv == "interp"
        _pallas_want = (self._use_fast and penv != "0"
                        and (penv in ("1", "interp")
                             or jax.default_backend() == "tpu"))
        self._use_pallas = _pallas_want and mesh is None
        # under a mesh the same kernels run inside shard_map islands with
        # ppermute halo exchange (unet_fast.forward_folded_pallas_spmd) —
        # bit-identical to the single-chip pallas path, so single- and
        # multi-chip TPU inference stay bit-equal. _apply_model still
        # falls back to the XLA pair path per-shape when the batch/height
        # don't divide over the mesh axes.
        self._use_pallas_spmd = _pallas_want and mesh is not None
        self.calib_path = calib_path
        self.calib_maxima = None  # (len(TAGS),) f32 once calibrated
        if quantize == "int8":
            # params materialize lazily at first dispatch (calibration
            # needs a representative batch) unless a calibration sidecar
            # already pins the scales; keep the folded f32 weights
            # host-side for the calibration forward + quantizer.
            self._folded_np = jax.tree_util.tree_map(
                np.asarray, folded["params"])
            self.params = None
            self._calib_fp32 = None
            self._calib_jit = jax.jit(
                self._calib_impl,
                static_argnames=("preprocessed", "background_radius",
                                 "apply_bg"))
            if calib_path is not None and os.path.exists(calib_path):
                from unetdc_tpu.models import unet_int8 as qi
                self._finalize_int8(qi.load_calibration(calib_path))
        elif self._use_fast:
            from unetdc_tpu.models.unet_fast import (build_fast_params,
                                                     build_pallas_head_params)
            self.params = build_fast_params(folded["params"],
                                            dtype=compute_dtype)
            if self._use_pallas or self._use_pallas_spmd:
                self.params["_pa"] = build_pallas_head_params(
                    folded["params"], dtype=compute_dtype)
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
            from unetdc_tpu.models.unet_fast import (
                forward_folded, forward_folded_pallas,
                forward_folded_pallas_spmd)
            if self._use_pallas:
                return forward_folded_pallas(params, x, self._dilations,
                                             interpret=self._pallas_interp)
            if self._use_pallas_spmd:
                from unetdc_tpu.core.mesh import DATA_AXIS, SPACE_AXIS
                nd = int(self.mesh.shape[DATA_AXIS])
                ns = (int(self.mesh.shape[SPACE_AXIS])
                      if self.shard_space else 1)
                # shard_map needs exact divisibility. For the meshes this
                # framework builds (space <= 8) the height condition is
                # implied by the UNet's own H % 16 == 0 constraint — this
                # guards exotic meshes, falling back to the XLA pair path
                if x.shape[0] % nd == 0 and x.shape[1] % (2 * ns) == 0:
                    return forward_folded_pallas_spmd(
                        params, x, self._dilations, mesh=self.mesh,
                        shard_space=self.shard_space,
                        interpret=self._pallas_interp)
            return forward_folded(params, x, self._dilations)
        return self.model.apply(params, x, train=False)

    def _preprocess(self, imgs_u8, background_radius: int, apply_bg: bool):
        """Jittable (B,H,W,3) uint8 -> (B,S,S,3) f32 in [0,1].

        Also accepts (B,H,W) GRAYSCALE uint8 — the channel is preprocessed
        ONCE and broadcast to 3 at the end. Bit-exact vs uploading the
        replicated (B,H,W,3): rolling ball (NORM_MINMAX is per channel,
        rolling_ball.py:47-52), resize, and /255 are all channel-
        independent, so equal channels in => equal channels out. This is
        the device half of the grayscale upload fast path: the axon relay
        link (~25 MB/s both ways) is the e2e wall, and the reference's
        microscopy data is exactly grayscale stored as RGB (every
        non-annotation pixel of /root/reference/outputs/overlays/*.png has
        all three channels equal), so uploading one channel cuts the
        dominant cost 3x — and saves 3x the preprocess compute."""
        size = self.img_size
        gray = imgs_u8.ndim == 3

        def preprocess(img):
            if apply_bg:
                img = rolling_ball_correction_rgb(img, background_radius)
            # reference resize is effectively INTER_LINEAR (see ops.resize);
            # bit-exact uint8 path so model inputs match the reference's
            x = jax.vmap(
                lambda ch: resize_linear_u8_cv2exact(ch, (size, size)),
                in_axes=-1, out_axes=-1)(img)
            return x.astype(jnp.float32) / 255.0

        x = jax.vmap(preprocess)(
            imgs_u8[..., None] if gray else imgs_u8).astype(jnp.float32)
        if gray:
            x = jnp.broadcast_to(x, (*x.shape[:-1], 3))
        return x

    def _calib_impl(self, fp, a, preprocessed: bool,
                    background_radius: int, apply_bg: bool):
        """Jittable: exact f32 fast forward -> per-tag activation maxima
        vector (unet_int8.forward_calib; one device fetch per batch)."""
        from unetdc_tpu.models import unet_int8 as qi

        x = a if preprocessed else self._preprocess(
            a, background_radius, apply_bg)
        return qi.forward_calib(fp, x, self._dilations)[1]

    def _finalize_int8(self, maxima: np.ndarray):
        """Quantize on the host from per-tag maxima + upload the int8
        pytree. Records `calib_maxima` so callers can persist the scales."""
        from unetdc_tpu.models import unet_int8 as qi

        maxima = np.asarray(maxima, np.float32)
        qp = qi.build_int8_params(self._folded_np, maxima, self._dilations)
        self.params = jax.tree_util.tree_map(jnp.asarray, qp)
        if self.mesh is not None:
            from unetdc_tpu.core.mesh import replicate
            self.params = replicate(self.mesh, self.params)
        self.calib_maxima = maxima

    def calibrate_int8(self, batches, *, preprocessed: bool = False,
                       background_radius: int = 50, apply_bg: bool = True,
                       save: bool = True):
        """Calibrate the int8 activation scales from one or more batches.

        `batches`: a (B,H,W,3) uint8 array (or preprocessed f32 with
        `preprocessed=True`), or a list of them — per-tag maxima accumulate
        elementwise across batches, so calibrating over K batches guards
        against an unrepresentative first batch (a dark batch would
        otherwise make later activations clip at 127). Same-shape batches
        reuse one compiled calibration program. When `save` and the engine
        has a `calib_path`, the maxima are persisted there so later runs
        are input-order-independent."""
        from unetdc_tpu.models.unet_fast import build_fast_params
        from unetdc_tpu.models import unet_int8 as qi

        if self.quantize != "int8":
            raise ValueError("calibrate_int8 requires quantize='int8'")
        if self._calib_fp32 is None:
            self._calib_fp32 = build_fast_params(self._folded_np,
                                                 dtype=jnp.float32)
        if hasattr(batches, "shape"):
            batches = [batches]
        mx = None
        for a in batches:
            m = np.asarray(self._calib_jit(
                self._calib_fp32, jnp.asarray(a), preprocessed=preprocessed,
                background_radius=int(background_radius),
                apply_bg=bool(apply_bg)))
            mx = m if mx is None else np.maximum(mx, m)
        if mx is None:
            raise ValueError("calibrate_int8 needs at least one batch")
        self._finalize_int8(mx)
        self._calib_fp32 = None  # free the f32 copy
        if save and self.calib_path is not None:
            qi.save_calibration(self.calib_path, mx)

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
        fetching batch k — overlapping device compute with host IO.

        `imgs_u8` is (B,H,W,3) RGB or (B,H,W) grayscale uint8 — the
        grayscale form uploads 3x fewer bytes over the relay link (the e2e
        bottleneck) with bit-identical results; use `grayscale_view` to
        downcast channel-equal batches automatically. Each form compiles
        its own megastep once (shape-keyed jit cache)."""
        from unetdc_tpu.utils.profiling import stage_timer

        with stage_timer("h2d_upload"):
            x = jnp.asarray(imgs_u8)
        if self.mesh is not None:
            space_dim = 1 if self.shard_space else None
            x = jax.device_put(
                x, batch_sharding(self.mesh, x.ndim, space_dim=space_dim))
        if self.quantize == "int8" and self.params is None:
            # fallback: calibrate on the first batch seen (order-dependent;
            # pipelines calibrate explicitly on a canonical sorted subset)
            self.calibrate_int8(x, background_radius=int(background_radius),
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
        """Synchronous host entry: uint8 (B,H,W,3) RGB or (B,H,W)
        grayscale -> numpy results (bit-identical either way)."""
        out = self.dispatch_batch(imgs_u8, out_hw, prob_thresh, min_area,
                                  background_radius, apply_bg)
        return self.fetch_batch(out, out_hw)

    # ------------------------------------------------------------------
    def forward_probs(self, x_f32: jax.Array) -> jax.Array:
        """Plain jitted forward on preprocessed (B, S, S, 3) in [0,1] —
        used by benchmarks and the library API."""
        if self.quantize == "int8" and self.params is None:
            self.calibrate_int8(x_f32, preprocessed=True)
        return self._forward(self.params, x_f32)


def load_engine(ckpt_path: str, mesh=None, fast: bool = True,
                model_cls=UNetDC, max_labels: int = 4096,
                quantize: str | None = None,
                calib_path=None) -> QuantifyEngine:
    """Build an engine from a reference .pth or native msgpack checkpoint.
    `fast` selects the bf16 dtype policy (core.dtypes.default_policy);
    `quantize="int8"` the calibrated int8 forward (models/unet_int8.py),
    with scales loaded from / persisted to the `calib_path` sidecar."""
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
        max_labels=max_labels, mesh=mesh, quantize=quantize,
        calib_path=calib_path)
