"""End-to-end golden test: full TPU pipeline vs a torch+cv2+scipy oracle of
the reference `quantify_droplets_batch.py`, on synthetic images with a
decisive (sigmoid-saturated) random checkpoint so masks are bit-stable.

Uses img_size=128 (the model is fully convolutional; 512 is just the
reference's constant) to keep CPU runtime sane."""

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from tests.torch_reference import (
    make_decisive_checkpoint, reference_pipeline_one_image)

IMG_SIZE = 128
PX_PER_UM = 3.45


@pytest.fixture(scope="module", params=[0, 11])
def ckpt_and_model(tmp_path_factory, request):
    """Two independent random decisive checkpoints: the bit-exactness claim
    must hold across different mask geometries."""
    path = tmp_path_factory.mktemp("ckpt") / f"ref{request.param}.pth"
    model = make_decisive_checkpoint(str(path), seed=request.param)
    return str(path), model


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    rng = np.random.RandomState(7)
    d = tmp_path_factory.mktemp("imgs")
    for i in range(3):
        img = (rng.rand(96, 112, 3) * 60).astype(np.uint8)
        # paint bright blobs
        yy, xx = np.mgrid[:96, :112]
        for _ in range(6):
            cy, cx = rng.randint(10, 86), rng.randint(10, 102)
            r = rng.randint(3, 9)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            img[blob] = np.minimum(img[blob] + 180, 255)
        Image.fromarray(img).save(d / f"img{i:02d}.png")
    return str(d)


def test_pipeline_end_to_end(ckpt_and_model, image_dir, tmp_path):
    ckpt, tmodel = ckpt_and_model

    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.pipelines.quantify_batch import (
        BatchQuantifyPipeline, list_images)

    engine = load_engine(ckpt, fast=False)
    engine.img_size = IMG_SIZE
    out_dir = tmp_path / "out"
    pipe = BatchQuantifyPipeline(
        engine, str(out_dir), batch=2, prob_thresh=0.3, min_area=2,
        px_per_micron=PX_PER_UM, save_overlays=True, background_radius=20)
    pipe.run(image_dir, progress=False)
    pipe.write_reports()

    # ---- artifact set matches the reference output tree -----------------
    assert (out_dir / "summary_per_image.csv").exists()
    assert (out_dir / "all_droplets.csv").exists()
    assert (out_dir / "droplet_size_stats.csv").exists()
    assert (out_dir / "size_histogram.png").exists()
    for p in list_images(image_dir):
        assert (out_dir / "predicted_masks" / f"{p.stem}_pred.png").exists()
        assert (out_dir / f"{p.stem}_droplets.csv").exists()
        assert (out_dir / "overlays" / f"{p.stem}_overlay.png").exists()
    # xlsxwriter is absent in this image -> reference fallback file
    assert (out_dir / "all_droplets_noexcel.csv").exists()

    # ---- numeric parity with the oracle pipeline ------------------------
    from PIL import Image

    all_ref = []
    for p in list_images(image_dir):
        img = np.array(Image.open(p).convert("RGB"))
        ref_mask, ref_df = reference_pipeline_one_image(
            tmodel, img, IMG_SIZE, 0.3, 2, PX_PER_UM, background_radius=20)
        ours_mask = np.array(Image.open(
            out_dir / "predicted_masks" / f"{p.stem}_pred.png")) // 255
        mism = (ours_mask != ref_mask).mean()
        assert mism == 0.0, f"mask mismatch {mism} for {p.name}"
        ours_df = pd.read_csv(out_dir / f"{p.stem}_droplets.csv")
        ref_df = ref_df.copy()
        ref_df.insert(0, "filename", p.name)
        assert list(ours_df.columns) == list(ref_df.columns)
        assert len(ours_df) == len(ref_df), p.name
        np.testing.assert_array_equal(ours_df["label"], ref_df["label"])
        np.testing.assert_array_equal(ours_df["area"], ref_df["area"])
        for col in ["equivalent_diameter", "centroid-0", "centroid-1",
                    "area_sqmicron", "eq_diam_micron"]:
            np.testing.assert_allclose(ours_df[col], ref_df[col], rtol=1e-12,
                                       err_msg=f"{p.name}:{col}")
        all_ref.append(ref_df)

    # ---- summary + stats files -------------------------------------------
    summary = pd.read_csv(out_dir / "summary_per_image.csv")
    assert list(summary.columns) == ["filename", "droplet_count",
                                     "total_area_px"]
    ref_concat = pd.concat(all_ref, ignore_index=True)
    for i, p in enumerate(list_images(image_dir)):
        sub = ref_concat[ref_concat.filename == p.name]
        assert summary.loc[i, "droplet_count"] == len(sub)
        assert summary.loc[i, "total_area_px"] == sub["area"].sum()

    stats = pd.read_csv(out_dir / "droplet_size_stats.csv", index_col=0)
    ref_stats = ref_concat["eq_diam_micron"].describe()[["mean", "50%", "std"]]
    np.testing.assert_allclose(
        stats.iloc[:, 0].values,
        ref_stats.values, rtol=1e-9)


def test_segmentation_deep_learning_library_call(ckpt_and_model):
    """Library API (algorithms.py:61-80 intent): single-call image->mask,
    grayscale input, 0.3 threshold, x255 output at original size."""
    from unetdc_tpu import library

    ckpt, _ = ckpt_and_model
    rng = np.random.RandomState(5)
    img = (rng.rand(96, 80) * 255).astype(np.uint8)
    mask = library.segmentation_deep_learning(img, ckpt_path=ckpt)
    assert mask.shape == (96, 80)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}


def test_trainer_pth_export_roundtrip(tmp_path):
    """Natively-trained weights export to the reference .pth layout and load
    back through torch + our converter to identical values."""
    import jax

    from unetdc_tpu.models.unet import UNetDC, init_params
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    trainer = Trainer(TrainConfig(model="unetdc", compute_dtype="f32"))
    pth = tmp_path / "export.pth"
    trainer._export_pth(str(pth))
    sd = torch.load(str(pth), map_location="cpu")
    assert "enc1.0.weight" in sd and sd["enc1.0.weight"].shape == (64, 3, 3, 3)
    assert "upconv4.weight" in sd and sd["upconv4.weight"].shape == (1024, 512, 2, 2)

    from unetdc_tpu.checkpoint.convert import torch_state_dict_to_variables

    back = torch_state_dict_to_variables(
        {k: v.numpy() for k, v in sd.items()})
    orig = trainer.variables["params"]["enc1"]["conv0"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(back["params"]["enc1"]["conv0"]["kernel"]),
        np.asarray(orig))


def test_mixed_image_sizes_bucketing(ckpt_and_model, tmp_path):
    """Directories with multiple original sizes must produce per-size
    correct artifacts (size-bucketed compilation, padded tail batches)."""
    from PIL import Image

    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.pipelines.quantify_batch import BatchQuantifyPipeline

    ckpt, _ = ckpt_and_model
    rng = np.random.RandomState(9)
    d = tmp_path / "imgs"
    d.mkdir()
    sizes = {"a": (60, 72), "b": (96, 80), "c": (60, 72)}
    for name, (h, w) in sizes.items():
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"{name}.png")

    engine = load_engine(ckpt, fast=False)
    engine.img_size = IMG_SIZE
    out = tmp_path / "out"
    pipe = BatchQuantifyPipeline(engine, str(out), batch=2, prob_thresh=0.3,
                                 background_radius=10)
    pipe.run(str(d), progress=False)
    pipe.write_reports(skip_excel=True, skip_histogram=True)
    for name, (h, w) in sizes.items():
        mask = np.array(Image.open(out / "predicted_masks"
                                   / f"{name}_pred.png"))
        assert mask.shape == (h, w), name
    summary = pd.read_csv(out / "summary_per_image.csv")
    assert list(summary.filename) == ["a.png", "b.png", "c.png"]


@pytest.mark.slow
def test_empty_image_produces_empty_tables(ckpt_and_model, tmp_path):
    """All-dark image -> no droplets -> header-only droplets CSV and zero
    summary row (reference behavior for empty DataFrames)."""
    from PIL import Image

    ckpt, _ = ckpt_and_model
    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(d / "dark.png")

    from unetdc_tpu.pipelines.engine import load_engine
    from unetdc_tpu.pipelines.quantify_batch import BatchQuantifyPipeline

    engine = load_engine(ckpt, fast=False)
    engine.img_size = IMG_SIZE
    out = tmp_path / "out"
    pipe = BatchQuantifyPipeline(engine, str(out), batch=2, prob_thresh=0.99,
                                 min_area=100000)
    pipe.run(str(d), progress=False)
    pipe.write_reports()
    summary = pd.read_csv(out / "summary_per_image.csv")
    assert summary.loc[0, "droplet_count"] == 0
    assert summary.loc[0, "total_area_px"] == 0


@pytest.mark.slow
def test_component_overflow_rescued(ckpt_and_model):
    """Exceeding max_labels on the REAL dispatch/fetch path must
    degrade-to-correct: fetch_batch re-runs the batch at a doubled table
    cap (reference parity — skimage labels are unbounded,
    quantify_droplets_batch.py:82). Results must equal a large-cap engine's
    bit for bit."""
    from unetdc_tpu.checkpoint import (load_pth_state_dict,
                                       torch_state_dict_to_variables)
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    ckpt, _ = ckpt_and_model
    variables = torch_state_dict_to_variables(load_pth_state_dict(ckpt))
    rng = np.random.RandomState(9)
    imgs = (rng.rand(2, 96, 112, 3) * 60).astype(np.uint8)
    yy, xx = np.mgrid[:96, :112]
    for b in range(2):
        for _ in range(8):
            cy, cx = rng.randint(10, 86), rng.randint(10, 102)
            r = rng.randint(3, 9)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            imgs[b][blob] = np.minimum(imgs[b][blob] + 180, 255)

    small = QuantifyEngine(variables, compute_dtype=jnp.float32,
                           max_labels=2, img_size=IMG_SIZE)
    big = QuantifyEngine(variables, compute_dtype=jnp.float32,
                         max_labels=4096, img_size=IMG_SIZE)
    kw = dict(prob_thresh=0.3, min_area=1, background_radius=20)
    out_big = big.run_batch(imgs, (96, 112), **kw)
    assert int(out_big["total"].max()) > 2  # precondition: overflows cap 2
    out_small = small.run_batch(imgs, (96, 112), **kw)  # rescue path

    np.testing.assert_array_equal(out_small["mask"], out_big["mask"])
    np.testing.assert_array_equal(out_small["count"], out_big["count"])
    np.testing.assert_array_equal(out_small["total"], out_big["total"])
    for i in range(2):
        n = int(out_big["count"][i])
        for k in ("area", "sum-0-lo", "sum-1-lo"):
            np.testing.assert_array_equal(out_small[k][i][:n],
                                          out_big[k][i][:n], err_msg=k)


def test_component_overflow_raises(ckpt_and_model):
    """Split-dict fetches (no inputs to re-run) must still raise with a
    clear message, not silently truncate droplet tables."""
    from unetdc_tpu.checkpoint import (load_pth_state_dict,
                                       torch_state_dict_to_variables)
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    ckpt, _ = ckpt_and_model
    variables = torch_state_dict_to_variables(load_pth_state_dict(ckpt))
    engine = QuantifyEngine(variables, compute_dtype=jnp.float32,
                            max_labels=4, img_size=IMG_SIZE)
    fake = {"mask_bits": np.zeros((1, 512), np.uint8),
            "count": np.array([4]), "total": np.array([10]),
            "area": np.zeros((1, 4), np.int32),
            "sum-0-lo": np.zeros((1, 4), np.int32),
            "sum-1-lo": np.zeros((1, 4), np.int32)}
    with pytest.raises(RuntimeError, match="max_labels"):
        engine.fetch_batch(fake, (64, 64))


def test_packed_fetch_matches_direct_megastep(ckpt_and_model):
    """dispatch/fetch round the outputs through ONE bitcast-packed uint8
    buffer (the axon relay charges ~0.1 s latency per transfer call); the
    unpacked results must be bit-identical to the unpacked megastep dict."""
    import jax

    from unetdc_tpu.checkpoint import (load_pth_state_dict,
                                       torch_state_dict_to_variables)
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    ckpt, _ = ckpt_and_model
    variables = torch_state_dict_to_variables(load_pth_state_dict(ckpt))
    engine = QuantifyEngine(variables, compute_dtype=jnp.float32,
                            img_size=IMG_SIZE, max_labels=1024)
    rng = np.random.RandomState(3)
    imgs = (rng.rand(2, 96, 80, 3) * 255).astype(np.uint8)
    out = engine.run_batch(imgs, (96, 80), background_radius=10)

    ref = jax.jit(engine._megastep_impl,
                  static_argnames=("out_hw", "background_radius",
                                   "apply_bg"))(
        engine.params, jnp.asarray(imgs), jnp.float32(0.3), jnp.int32(1),
        (96, 80), 10, True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    mask_ref = np.unpackbits(ref.pop("mask_bits"), axis=-1)[
        :, :96 * 80].reshape(2, 96, 80)
    assert np.array_equal(out["mask"], mask_ref)
    for k in ref:
        assert np.array_equal(out[k], ref[k]), k


def test_mixed_size_training_batches(tmp_path):
    """SegmentationData groups same-size samples into batches."""
    from PIL import Image

    from unetdc_tpu.data.dataset import SegmentationData

    rng = np.random.RandomState(2)
    img_dir = tmp_path / "i"
    mask_dir = tmp_path / "m"
    img_dir.mkdir()
    mask_dir.mkdir()
    sizes = [(32, 40), (48, 48), (32, 40), (32, 40)]
    names = []
    for i, (h, w) in enumerate(sizes):
        name = f"s{i}.png"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            img_dir / name)
        Image.fromarray(((rng.rand(h, w) > 0.5) * 255).astype(np.uint8)
                        ).save(mask_dir / name)
        names.append(name)
    data = SegmentationData(str(img_dir), str(mask_dir), names, names,
                            batch_size=4)
    batches = list(data.batches())
    for b in batches:
        assert b["images"].shape[1:3] == b["orig_size"]
    total = sum(b["n_valid"] for b in batches)
    assert total == 4
