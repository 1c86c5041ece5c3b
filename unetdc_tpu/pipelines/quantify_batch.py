"""Host driver for the batch quantification pipeline — produces the exact
artifact set of the reference CLI (quantify_droplets_batch.py:100-201):

    out_dir/predicted_masks/{stem}_pred.png      mask * 255
    out_dir/{stem}_droplets.csv                  per-image droplet table
    out_dir/overlays/{stem}_overlay.png          optional green contours
    out_dir/summary_per_image.csv                filename,droplet_count,total_area_px
    out_dir/all_droplets.csv                     concatenated droplet tables
    out_dir/all_droplets.xlsx | all_droplets_noexcel.csv (fallback)
    out_dir/droplet_size_stats.csv               mean/median/std of size col
    out_dir/size_histogram.png                   40-bin histogram, 6x4in @300dpi

CSV schemas and stdout lines are kept stable: the reference GUIs treat the
CLI's stdout as an API (gui_qt.py:113-116).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from unetdc_tpu.pipelines.engine import QuantifyEngine

IMG_SUFFIXES = {".png", ".jpg", ".jpeg", ".tif", ".tiff"}


def list_images(img_dir: str) -> List[Path]:
    """Sorted image listing (quantify_droplets_batch.py:143-144)."""
    return sorted(p for p in Path(img_dir).iterdir()
                  if p.suffix.lower() in IMG_SUFFIXES)


def decode_rgb(path: Path) -> np.ndarray:
    from unetdc_tpu.io.native import decode_rgb as _native_decode

    return _native_decode(path)


def props_to_dataframe(props: Dict[str, np.ndarray], count: int,
                       px_per_um: Optional[float]) -> pd.DataFrame:
    """Slice the fixed-size device property table to a reference-schema
    droplet DataFrame (label, area, equivalent_diameter, centroid-0/1
    [, area_sqmicron, eq_diam_micron])."""
    n = int(count)
    if n == 0:
        return pd.DataFrame()
    area = np.asarray(props["area"][:n], np.int64)
    # f64 on host from exact integer device sums (hi/lo byte split) ==
    # skimage's f64 results bit-for-bit
    def _sum(axis):
        # three device contracts by image size (ops/connected_components
        # _assemble_quantify): bare lo (total fits int32), lo/hi base 256,
        # lo16/hi16 base 65536 (giant images past ~8192^2)
        if f"sum-{axis}-lo16" in props:
            lo = np.asarray(props[f"sum-{axis}-lo16"][:n], np.int64)
            return np.asarray(props[f"sum-{axis}-hi16"][:n],
                              np.int64) * 65536 + lo
        lo = np.asarray(props[f"sum-{axis}-lo"][:n], np.int64)
        hi = props.get(f"sum-{axis}-hi")
        return lo if hi is None else np.asarray(hi[:n], np.int64) * 256 + lo

    sum0 = _sum(0)
    sum1 = _sum(1)
    df = pd.DataFrame({
        "label": np.arange(1, n + 1, dtype=np.int64),
        "area": area,
        "equivalent_diameter": np.sqrt(4.0 * area.astype(np.float64) / np.pi),
        "centroid-0": sum0.astype(np.float64) / area,
        "centroid-1": sum1.astype(np.float64) / area,
    })
    if px_per_um is not None:
        df["area_sqmicron"] = df["area"] / (px_per_um ** 2)
        df["eq_diam_micron"] = df["equivalent_diameter"] / px_per_um
    return df


def draw_overlay(orig_bgr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Green external contours, thickness 2 (quantify_droplets_batch.py:77-78).
    Uses cv2 on host (report layer only — device path never needs it)."""
    import cv2

    cnts, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                               cv2.CHAIN_APPROX_SIMPLE)
    out = orig_bgr.copy()
    cv2.drawContours(out, cnts, -1, (0, 255, 0), 2)
    return out


class BatchQuantifyPipeline:
    """Groups images by original size (one compilation per size bucket),
    pads the trailing partial batch, runs the device megastep, writes
    reference-format artifacts."""

    def __init__(self, engine: QuantifyEngine, out_dir: str,
                 batch: int = 8, prob_thresh: float = 0.3, min_area: int = 1,
                 px_per_micron: Optional[float] = None,
                 save_overlays: bool = False, background_radius: int = 50):
        self.engine = engine
        self.out_dir = Path(out_dir)
        self.mask_dir = self.out_dir / "predicted_masks"
        self.overlay_dir = self.out_dir / "overlays" if save_overlays else None
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.mask_dir.mkdir(exist_ok=True)
        if self.overlay_dir:
            self.overlay_dir.mkdir(exist_ok=True)
        self.batch = batch
        self.prob_thresh = prob_thresh
        self.min_area = min_area
        self.px_per_micron = px_per_micron
        self.background_radius = background_radius
        self.per_image_rows: List[dict] = []
        self.all_props: List[pd.DataFrame] = []
        self._pool = None
        self._pending_writes: List = []

    # queue depth 2: dispatch k+1 and k+2 before fetching k — measured
    # optimal on this host link (deeper queues degrade)
    _MAX_INFLIGHT = 2

    @property
    def _dispatcher(self):
        """Single dispatch thread: `jnp.asarray` blocks ~[25 MB/s .. 300
        MB/s]×6 MB per batch on the relay but releases the GIL for most of
        the wire time (measured: a busy Python thread keeps ~44% of its
        baseline rate during an upload on this 1-vCPU host), so uploading
        from a thread overlaps the link with decode/CSV/PNG host work. One
        worker keeps device dispatch order deterministic."""
        if getattr(self, "_dispatch_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._dispatch_pool = ThreadPoolExecutor(max_workers=1)
        return self._dispatch_pool

    # --------------------------------------------------------------
    def _flush(self, imgs: List[np.ndarray], paths: List[Path],
               size_hw: Tuple[int, int]):
        """Dispatch one batch asynchronously, keeping up to _MAX_INFLIGHT
        batches queued on device; compute overlaps host artifact writing."""
        n_valid = len(imgs)
        if n_valid == 0:
            return
        # keep the already-decoded RGB for overlay drawing (the reference
        # re-reads the file with cv2.imread, quantify_droplets_batch.py:76 —
        # a second decode of data we just had in memory)
        rgbs = list(imgs[:n_valid]) if self.overlay_dir is not None else None
        # pad to full batch so every bucket reuses one compiled program
        while len(imgs) < self.batch:
            imgs.append(np.zeros_like(imgs[0]))
        if len(getattr(self, "_inflight", [])) >= self._MAX_INFLIGHT:
            self._drain(one=True)
        if not hasattr(self, "_inflight"):
            self._inflight = []
        batch_imgs = list(imgs)

        def _dispatch():
            from unetdc_tpu.pipelines.engine import grayscale_view

            # channel-equal batches (typical microscopy: grayscale saved as
            # RGB) upload ONE channel — 3x fewer bytes over the relay link,
            # the pipeline's bottleneck; bit-identical results. The check
            # runs here, in the dispatch thread, overlapping the link.
            return self.engine.dispatch_batch(
                grayscale_view(np.stack(batch_imgs)), size_hw,
                self.prob_thresh, self.min_area, self.background_radius)

        self._inflight.append((self._dispatcher.submit(_dispatch),
                               list(paths), n_valid, size_hw, rgbs))

    def _drain(self, one: bool = False):
        from unetdc_tpu.utils.profiling import stage_timer

        inflight = getattr(self, "_inflight", [])
        while inflight:
            fut, paths, n_valid, size_hw, rgbs = inflight.pop(0)
            with stage_timer("device_fetch"):
                host = self.engine.fetch_batch(fut.result(), size_hw)
            with stage_timer("host_write_artifacts"):
                self._write_batch_outputs(host, paths, n_valid, rgbs)
            if one:
                break

    @property
    def _writer_pool(self):
        """Small thread pool for PNG encodes: libpng/libjpeg release the
        GIL, so encodes overlap with the next batch's device fetch (the
        relay link is the pipeline's idle time)."""
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=2)
        return self._pool

    def _submit_write(self, fn, *args):
        fut = self._writer_pool.submit(fn, *args)
        self._pending_writes.append(fut)
        # bound the queue; surface encoder errors promptly
        while len(self._pending_writes) > 16:
            self._pending_writes.pop(0).result()

    def finish_writes(self):
        for f in self._pending_writes:
            f.result()
        self._pending_writes = []

    def _write_batch_outputs(self, out, paths, n_valid, rgbs=None):
        from unetdc_tpu.io.native import encode_png_gray
        from unetdc_tpu.utils.profiling import stage_timer

        for i in range(n_valid):
            fpath = paths[i]
            name = fpath.stem
            mask = out["mask"][i]
            self._submit_write(encode_png_gray,
                               self.mask_dir / f"{name}_pred.png", mask * 255)
            props_i = {k: out[k][i] for k in ("area", "sum-0-lo",
                                  "sum-0-hi", "sum-1-lo", "sum-1-hi",
                                  "sum-0-lo16", "sum-0-hi16",
                                  "sum-1-lo16", "sum-1-hi16") if k in out}
            with stage_timer("host_csv"):
                from unetdc_tpu.io.fastcsv import write_csv

                df = props_to_dataframe(props_i, out["count"][i],
                                        self.px_per_micron)
                df.insert(0, "filename", fpath.name)
                # bytes-identical to df.to_csv (tests/test_fastcsv.py), ~5x
                # faster on the 1-vCPU host — this is per-image hot path
                write_csv(self.out_dir / f"{name}_droplets.csv", df)
            self.all_props.append(df)
            self.per_image_rows.append({
                "filename": fpath.name,
                "droplet_count": len(df),
                "total_area_px": int(df["area"].sum()) if not df.empty else 0,
            })
            if self.overlay_dir is not None:
                import cv2

                # reuse the decoded RGB (cv2 wants BGR); reference re-decodes
                bgr = (rgbs[i][..., ::-1] if rgbs is not None
                       else cv2.imread(str(fpath)))
                if bgr is not None:
                    self._submit_write(
                        cv2.imwrite,
                        str(self.overlay_dir / f"{name}_overlay.png"),
                        draw_overlay(np.ascontiguousarray(bgr), mask))

    # --------------------------------------------------------------
    def _maybe_calibrate(self, paths: List[Path]):
        """Int8 engines calibrate on a CANONICAL subset — the first
        `batch` images (sorted filename order) that share the first
        image's size — not on whatever batch happens to be dispatched
        first. This makes the activation scales (hence every mask)
        independent of dataset traversal order, and accumulating maxima
        over several images guards against one unrepresentative image
        setting the scales (ADVICE r3). No-op when a calibration sidecar
        already pinned the scales at engine construction."""
        eng = self.engine
        if getattr(eng, "quantize", None) != "int8" or eng.params is not None:
            return
        imgs, size = [], None
        for p in paths:
            arr = decode_rgb(p)
            if size is None:
                size = arr.shape[:2]
            if arr.shape[:2] != size:
                continue
            imgs.append(arr)
            if len(imgs) == self.batch:
                break
        if imgs:
            eng.calibrate_int8(np.stack(imgs),
                               background_radius=self.background_radius)

    # --------------------------------------------------------------
    def run(self, img_dir: str, progress: bool = True):
        from unetdc_tpu.data.dataset import Prefetcher

        images = list_images(img_dir)
        self._maybe_calibrate(images)
        if progress:
            try:
                from tqdm import tqdm
                images = tqdm(images, desc="Inference")
            except ImportError:  # pragma: no cover
                pass

        # background-thread decode overlaps PNG IO with device compute
        from unetdc_tpu.utils.profiling import stage_timer

        def _decode_all():
            for p in images:
                with stage_timer("host_decode"):
                    arr = decode_rgb(p)
                yield p, arr

        images_iter = Prefetcher(_decode_all(), depth=4)

        pend_imgs: List[np.ndarray] = []
        pend_paths: List[Path] = []
        pend_size: Optional[Tuple[int, int]] = None
        for p, arr in images_iter:
            hw = arr.shape[:2]
            if pend_size is not None and (hw != pend_size or
                                          len(pend_imgs) == self.batch):
                self._flush(pend_imgs, pend_paths, pend_size)
                pend_imgs, pend_paths = [], []
            pend_size = hw
            pend_imgs.append(arr)
            pend_paths.append(p)
            if len(pend_imgs) == self.batch:
                self._flush(pend_imgs, pend_paths, pend_size)
                pend_imgs, pend_paths = [], []
        if pend_imgs:
            self._flush(pend_imgs, pend_paths, pend_size)
        self._drain()
        self.finish_writes()
        if getattr(self, "_dispatch_pool", None) is not None:
            self._dispatch_pool.shutdown(wait=True)
            self._dispatch_pool = None
        return self

    # --------------------------------------------------------------
    def write_reports(self, skip_excel: bool = False,
                      skip_histogram: bool = False):
        """Master CSV/Excel + size stats + histogram
        (quantify_droplets_batch.py:162-199)."""
        from unetdc_tpu.io.fastcsv import write_csv

        out_dir = self.out_dir
        summary_df = pd.DataFrame(self.per_image_rows)
        write_csv(out_dir / "summary_per_image.csv", summary_df)
        if not self.all_props:
            return
        combined = pd.concat(self.all_props, ignore_index=True)
        write_csv(out_dir / "all_droplets.csv", combined)

        if not skip_excel:
            try:
                import xlsxwriter  # noqa: F401
                with pd.ExcelWriter(out_dir / "all_droplets.xlsx",
                                    engine="xlsxwriter") as xw:
                    combined.to_excel(xw, index=False, sheet_name="droplets")
                    summary_df.to_excel(xw, index=False,
                                        sheet_name="per_image")
            except (ImportError, AttributeError):
                write_csv(out_dir / "all_droplets_noexcel.csv", combined)
                print("⚠️  Skipped Excel file; install 'xlsxwriter<3.1.0' or "
                      "use Python ≥3.7 if you need .xlsx output.")

        if combined.empty:
            return
        size_col = ("eq_diam_micron" if "eq_diam_micron" in combined.columns
                    else "equivalent_diameter")
        stats = combined[size_col].describe()[["mean", "50%", "std"]].rename(
            {"50%": "median"})
        stats.to_csv(out_dir / "droplet_size_stats.csv")

        if not skip_histogram:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(6, 4))
            plt.hist(combined[size_col], bins=40)
            plt.xlabel("Diameter (µm)" if "micron" in size_col
                       else "Diameter (pixels)")
            plt.ylabel("Count")
            plt.title("Droplet size distribution")
            plt.tight_layout()
            plt.savefig(out_dir / "size_histogram.png", dpi=300)
            plt.close()
