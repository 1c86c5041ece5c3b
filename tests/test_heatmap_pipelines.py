"""End-to-end tests of the two heatmap pipeline CLIs (quantify_pipline v1,
quantify v2) on synthetic data with a decisive checkpoint: artifact sets and
numeric parity of the ROI/heatmap math vs reference oracles."""

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402
from scipy import ndimage as ndi  # noqa: E402

from tests.torch_reference import make_decisive_checkpoint

IMG_SIZE = 128


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "ref.pth"
    make_decisive_checkpoint(str(path))
    return str(path)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    rng = np.random.RandomState(11)
    d = tmp_path_factory.mktemp("imgs")
    for i in range(2):
        img = (rng.rand(96, 112, 3) * 50).astype(np.uint8)
        yy, xx = np.mgrid[:96, :112]
        # bright ROI disk with droplets inside
        disk = (yy - 48) ** 2 + (xx - 56) ** 2 <= 40 ** 2
        img[disk] = np.minimum(img[disk] + 90, 255)
        for _ in range(5):
            cy, cx = rng.randint(20, 76), rng.randint(25, 87)
            r = rng.randint(3, 7)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            img[blob & disk] = 255
        Image.fromarray(img).save(d / f"img{i:02d}.png")
    return str(d)


def _mk_engine(cls, ckpt, **kw):
    from unetdc_tpu.checkpoint import (load_pth_state_dict,
                                       torch_state_dict_to_variables)

    variables = torch_state_dict_to_variables(load_pth_state_dict(ckpt))
    eng = cls(variables, compute_dtype=jnp.float32, **kw)
    eng.img_size = IMG_SIZE
    return eng


def test_heatmap_v1_pipeline(ckpt, image_dir, tmp_path):
    from unetdc_tpu.pipelines.heatmaps import (HeatmapV1Engine,
                                               HeatmapV1Pipeline)
    from unetdc_tpu.pipelines.quantify_batch import list_images

    engine = _mk_engine(HeatmapV1Engine, ckpt)
    out = tmp_path / "o1"
    pipe = HeatmapV1Pipeline(engine, str(out), batch=2, prob_thresh=0.3,
                             min_area=1, background_radius=20)
    pipe.run(image_dir, progress=False)
    pipe.write_reports()
    for p in list_images(image_dir):
        assert (out / "predicted_masks" / f"{p.stem}_pred.png").exists()
        assert (out / f"{p.stem}_droplets.csv").exists()
        assert (out / f"{p.stem}_radial_density.png").exists()
        assert (out / f"{p.stem}_spatial_density.png").exists()
    assert (out / "summary_per_image.csv").exists()
    assert (out / "all_droplets.csv").exists()


def test_generate_roi_mask_matches_cv2(rng):
    from unetdc_tpu.ops.roi import generate_roi_mask, moments_centroid

    img = (rng.rand(96, 112, 3) * 40).astype(np.uint8)
    yy, xx = np.mgrid[:96, :112]
    disk = (yy - 48) ** 2 + (xx - 56) ** 2 <= 35 ** 2
    img[disk] = np.minimum(img[disk] + 120, 255)

    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    blurred = cv2.GaussianBlur(gray, (15, 15), 0)
    _, ref = cv2.threshold(blurred, 0, 255,
                           cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    kern = np.ones((15, 15), np.uint8)
    ref = cv2.morphologyEx(ref, cv2.MORPH_CLOSE, kern)
    ref = cv2.morphologyEx(ref, cv2.MORPH_OPEN, kern)
    ref = (ref > 0).astype(np.uint8)

    ours = np.asarray(generate_roi_mask(jnp.asarray(img)))
    # GaussianBlur rounding can flip Otsu boundary pixels; demand near-exact
    assert (ours != ref).mean() < 0.002

    m = cv2.moments(ref)
    cx_ref = int(m["m10"] / m["m00"])
    cy_ref = int(m["m01"] / m["m00"])
    cy, cx = moments_centroid(jnp.asarray(ref))
    assert abs(int(cy) - cy_ref) <= 1 and abs(int(cx) - cx_ref) <= 1


def test_blobinspector_pipeline(ckpt, image_dir, tmp_path):
    from unetdc_tpu.pipelines.heatmaps import (BlobInspectorEngine,
                                               BlobInspectorPipeline)
    from unetdc_tpu.pipelines.quantify_batch import list_images

    engine = _mk_engine(BlobInspectorEngine, ckpt, kernel_size=15,
                        nb_layers=3, contour_thresh=60, contour_min_size=20)
    out = tmp_path / "o2"
    pipe = BlobInspectorPipeline(engine, str(out), batch=2, prob_thresh=0.3,
                                 min_area=1, px_per_micron=3.45,
                                 background_radius=20)
    pipe.run(image_dir, progress=False)
    for p in list_images(image_dir):
        md = out / "predicted_masks"
        assert (md / f"{p.stem}_pred.png").exists()
        assert (md / f"{p.stem}_mask_contour_debug.png").exists()
        assert (md / f"{p.stem}_target_density_heatmap_percentage.png"
                ).exists()
        assert (md / f"{p.stem}_convoluted_density_heatmap_percentage.png"
                ).exists()
        df = pd.read_csv(out / f"{p.stem}_droplets.csv")
        if not df.empty:
            assert "area_sqmicron" in df.columns


def test_remove_small_batch_matches_scipy(rng):
    from unetdc_tpu.ops.connected_components import remove_small_batch

    m = (rng.rand(3, 48, 48) > 0.72).astype(np.uint8)
    ours = np.asarray(remove_small_batch(jnp.asarray(m), 4, 1024,
                                         connectivity=2))
    for i in range(3):
        lab, n = ndi.label(m[i], structure=np.ones((3, 3)))
        ref = np.zeros_like(m[i], bool)
        for k in range(1, n + 1):
            if (lab == k).sum() >= 4:
                ref |= lab == k
        np.testing.assert_array_equal(ours[i], ref, err_msg=f"img {i}")


def test_label_batch_matches_scipy(rng):
    from unetdc_tpu.ops.connected_components import label_batch

    m = (rng.rand(4, 32, 40) > 0.6).astype(np.uint8)
    labs, ns = label_batch(jnp.asarray(m), connectivity=1)
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
    for i in range(4):
        ref, n_ref = ndi.label(m[i], structure=s4)
        assert int(ns[i]) == n_ref
        np.testing.assert_array_equal(np.asarray(labs)[i], ref)
