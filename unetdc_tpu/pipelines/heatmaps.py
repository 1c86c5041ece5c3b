"""Heatmap pipelines v1 and v2 — device engines + host drivers.

v1 (reference quantify_pipline.py): batch quantification PLUS, per image,
an Otsu-based ROI mask of the original image, a radial ring map counting
droplet centroids (nb_layers=10), and a Gaussian-ratio spatial density map;
both saved as min-max-normalized 'hot' heatmap PNGs.

v2 (reference quantify.py, BlobInspector style): contour-scan ROI with
min-size filtering, droplet labeling within the ROI, concentric-ring
(`get_targets`) and sliding-window (`density_maps`) percentage heatmaps at
fixed color scales (YlOrBr vmax=35, hot vmax=15).

All per-pixel math runs in the device megastep; hosts decode PNGs and write
matplotlib artifacts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from unetdc_tpu.ops.connected_components import quantify_mask_batch
from unetdc_tpu.ops.contours import calculate_contours_centroid, contour_scan
from unetdc_tpu.ops.density import (density_maps, gaussian_density_map,
                                    get_targets, radial_centroid_count_map)
from unetdc_tpu.ops.roi import generate_roi_mask, moments_centroid
from unetdc_tpu.pipelines.engine import QuantifyEngine
from unetdc_tpu.pipelines.quantify_batch import BatchQuantifyPipeline


def _normalize01(x):
    """quantify_pipline.py:53-57."""
    mn, mx = jnp.min(x), jnp.max(x)
    return jnp.where(mx > mn, (x - mn) / jnp.maximum(mx - mn, 1e-30), x)


def _combine_sums(stats, axis: int) -> jax.Array:
    """f32-combined coordinate sums from the hi/lo byte split (hi absent on
    the small-image exact path)."""
    lo = stats[f"sum-{axis}-lo"].astype(jnp.float32)
    hi = stats.get(f"sum-{axis}-hi")
    return lo if hi is None else hi.astype(jnp.float32) * 256.0 + lo


def _centroid_size_from_stats(stats, hw, max_labels: int) -> jax.Array:
    """centroid_size_image (algorithms.py:561-576) from compact component
    stats: component size written at int(centroid + 0.5), via one cap-sized
    scatter (no per-pixel label image needed)."""
    h, w = hw
    area = stats["area"].astype(jnp.float32)
    valid = area > 0
    safe = jnp.maximum(area, 1.0)
    cy = jnp.floor(_combine_sums(stats, 0) / safe + 0.5).astype(jnp.int32)
    cx = jnp.floor(_combine_sums(stats, 1) / safe + 0.5).astype(jnp.int32)
    cy = jnp.clip(cy, 0, h - 1)
    cx = jnp.clip(cx, 0, w - 1)
    flat = jnp.where(valid, cy * w + cx, h * w)
    img = jnp.zeros(h * w + 1, jnp.float32).at[flat].set(
        jnp.where(valid, area, 0.0))
    return img[:-1].reshape(h, w)


class HeatmapV1Engine(QuantifyEngine):
    """QuantifyEngine + radial/spatial density maps (quantify_pipline.py).

    The radial map needs UNSIEVED component centroids (quantify_pipline.py:
    66-68 labels the mask fresh without min_area), so the engine requests
    the pre-sieve table from the base megastep — the expensive propagation
    runs once, not twice."""

    _want_presieve = True

    def _megastep_impl(self, params, imgs_u8, thresh, min_area, out_hw,
                       background_radius, apply_bg, max_labels=None):
        if max_labels is None:
            max_labels = self.max_labels
        out = super()._megastep_impl(params, imgs_u8, thresh, min_area,
                                     out_hw, background_radius, apply_bg,
                                     max_labels)
        oh, ow = out_hw
        masks = jax.vmap(lambda p: jnp.unpackbits(p)[:oh * ow].reshape(
            oh, ow))(out["mask_bits"])

        def per_image(img, mask, all_area, all_s0, all_s1, all_count):
            roi = generate_roi_mask(img)
            cy, cx = moments_centroid(roi)
            area = jnp.maximum(all_area.astype(jnp.float32), 1.0)
            cys = all_s0 / area
            cxs = all_s1 / area
            # table length follows the EFFECTIVE cap (overflow rescue may
            # re-run this program at a doubled max_labels)
            valid = (jnp.arange(max_labels) < all_count) \
                & (all_area > 0)
            radial = radial_centroid_count_map(
                roi, cys, cxs, valid, 10, cy.astype(jnp.float32),
                cx.astype(jnp.float32))
            spatial = gaussian_density_map(mask, roi, 21)
            rad_u8 = jnp.clip(jnp.rint(_normalize01(radial) * 255), 0, 255
                              ).astype(jnp.uint8)
            spa_u8 = jnp.clip(jnp.rint(_normalize01(spatial) * 255), 0, 255
                              ).astype(jnp.uint8)
            return rad_u8, spa_u8

        rad, spa = jax.vmap(per_image)(
            imgs_u8, masks, out["all_area"], out["all_sum-0"],
            out["all_sum-1"], out["all_count"])
        out["radial_u8"] = rad
        out["spatial_u8"] = spa
        # pre-sieve tables were consumed on device; don't transfer them
        for k in ("all_area", "all_sum-0", "all_sum-1", "all_count"):
            del out[k]
        return out


class HeatmapV1Pipeline(BatchQuantifyPipeline):
    """quantify_pipline.py driver: batch artifacts + per-image radial /
    spatial density heatmap PNGs ({name}_radial_density.png,
    {name}_spatial_density.png, cmap 'hot', quantify_pipline.py:141-142)."""

    def _write_batch_outputs(self, out, paths, n_valid, rgbs=None):
        super()._write_batch_outputs(out, paths, n_valid, rgbs)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for i in range(n_valid):
            name = paths[i].stem
            plt.imsave(self.out_dir / f"{name}_radial_density.png",
                       out["radial_u8"][i], cmap="hot")
            plt.imsave(self.out_dir / f"{name}_spatial_density.png",
                       out["spatial_u8"][i], cmap="hot")


class BlobInspectorEngine(QuantifyEngine):
    """QuantifyEngine + contour-scan ROI, ring and windowed density maps
    (reference quantify.py:68-90)."""

    def __init__(self, *args, kernel_size: int = 55, nb_layers: int = 3,
                 contour_thresh: int = 0, contour_min_size: int = 20,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.kernel_size = kernel_size
        self.nb_layers = nb_layers
        self.contour_thresh = contour_thresh
        self.contour_min_size = contour_min_size

    def _megastep_impl(self, params, imgs_u8, thresh, min_area, out_hw,
                       background_radius, apply_bg, max_labels=None):
        from unetdc_tpu.ops.connected_components import (quantify_mask_batch,
                                                         remove_small_batch)
        from unetdc_tpu.ops.roi import rgb2gray_cv2

        if max_labels is None:
            max_labels = self.max_labels
        out = super()._megastep_impl(params, imgs_u8, thresh, min_area,
                                     out_hw, background_radius, apply_bg,
                                     max_labels)
        oh, ow = out_hw
        masks = jax.vmap(lambda p: jnp.unpackbits(p)[:oh * ow].reshape(
            oh, ow))(out["mask_bits"])

        # ROI: contour scan + 8-connected min-size filter (quantify.py:69-71)
        gray = jax.vmap(rgb2gray_cv2)(imgs_u8)
        roi0 = jax.vmap(
            lambda g: contour_scan(g, self.contour_thresh))(gray)
        roi = remove_small_batch(roi0, self.contour_min_size,
                                 max_labels, connectivity=2)
        m = (masks > 0) & roi
        # component sizes/centroids (8-conn, quantify.py:76-78) without a
        # label image: centroid-size image scattered from compact stats
        stats = quantify_mask_batch(m, jnp.int32(1), max_labels,
                                    connectivity=2)

        def per_image(roi_i, m_i, st):
            csi = _centroid_size_from_stats(st, (oh, ow), max_labels)
            cy, cx = calculate_contours_centroid(roi_i)
            target_pct, _, _, _ = get_targets(m_i, roi_i, csi,
                                              self.nb_layers, cy, cx)
            conv_pct, _, _, _ = density_maps(m_i, roi_i, csi,
                                             self.kernel_size)
            return (jnp.packbits(roi_i.reshape(-1)),
                    target_pct.astype(jnp.float16),
                    conv_pct.astype(jnp.float16))

        roi_bits, target, conv = jax.vmap(per_image)(roi, m, stats)
        out["roi_bits"] = roi_bits
        out["target_pct"] = target
        out["conv_pct"] = conv
        return out


def save_heatmap(img, out_path, cmap, vmin, vmax):
    """quantify.py:60-66."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(5, 5))
    plt.imshow(img, cmap=cmap, vmin=vmin, vmax=vmax)
    plt.colorbar(fraction=0.046, pad=0.04)
    plt.axis("off")
    plt.savefig(out_path, bbox_inches="tight", pad_inches=0)
    plt.close()


class BlobInspectorPipeline(BatchQuantifyPipeline):
    """quantify.py driver: per-image masks, droplet CSVs, ROI debug PNG and
    the two fixed-scale heatmaps (YlOrBr vmax=35 / hot vmax=15,
    quantify.py:89-90). No master summary artifacts (the reference v2 CLI
    writes none)."""

    def _write_batch_outputs(self, out, paths, n_valid, rgbs=None):
        oh, ow = out["mask"].shape[1:]
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from PIL import Image

        from unetdc_tpu.pipelines.quantify_batch import (draw_overlay,
                                                         props_to_dataframe)

        for i in range(n_valid):
            fpath = paths[i]
            name = fpath.stem
            mask = out["mask"][i]
            from unetdc_tpu.io.native import encode_png_gray

            encode_png_gray(self.mask_dir / f"{name}_pred.png", mask * 255)
            roi = np.unpackbits(out["roi_bits"][i])[:oh * ow].reshape(oh, ow)
            plt.imsave(self.mask_dir / f"{name}_mask_contour_debug.png",
                       roi, cmap="gray")
            save_heatmap(
                out["target_pct"][i].astype(np.float32),
                self.mask_dir / f"{name}_target_density_heatmap_percentage.png",
                cmap="YlOrBr", vmin=0, vmax=35)
            save_heatmap(
                out["conv_pct"][i].astype(np.float32),
                self.mask_dir /
                f"{name}_convoluted_density_heatmap_percentage.png",
                cmap="hot", vmin=0, vmax=15)

            props_i = {k: out[k][i] for k in ("area", "sum-0-lo",
                                  "sum-0-hi", "sum-1-lo", "sum-1-hi",
                                  "sum-0-lo16", "sum-0-hi16",
                                  "sum-1-lo16", "sum-1-hi16") if k in out}
            df = props_to_dataframe(props_i, out["count"][i],
                                    self.px_per_micron)
            df.insert(0, "filename", fpath.name)
            from unetdc_tpu.io.fastcsv import write_csv

            write_csv(self.out_dir / f"{name}_droplets.csv", df)
            if self.overlay_dir is not None:
                import cv2

                img = cv2.imread(str(fpath))
                if img is not None:
                    cv2.imwrite(str(self.overlay_dir / f"{name}_overlay.png"),
                                draw_overlay(img, mask))
