"""Training subsystem tests: exact split semantics, augmentations,
diff maps, and an end-to-end smoke train run on synthetic data."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_split_matches_sklearn_reference():
    """60/20/20 via two train_test_split(random_state=42) calls
    (train_DC_focal.py:155-175)."""
    from sklearn.model_selection import train_test_split
    from unetdc_tpu.data.dataset import split_dataset

    names = [f"img{i:03d}.png" for i in range(50)]
    (tr, trm), (va, vam), (te, tem) = split_dataset(names, names)
    pairs = list(zip(names, names))
    tv_ref, te_ref = train_test_split(pairs, test_size=0.2, random_state=42)
    tr_ref, va_ref = train_test_split(tv_ref, test_size=0.25, random_state=42)
    assert tr == [p[0] for p in tr_ref]
    assert va == [p[0] for p in va_ref]
    assert te == [p[0] for p in te_ref]
    assert len(tr) + len(va) + len(te) == 50


def test_augment_deterministic_and_shapes(rng):
    from unetdc_tpu.data.augment import augment_batch

    imgs = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    masks = jnp.asarray((rng.rand(4, 64, 64) > 0.5), jnp.float32)
    key = jax.random.PRNGKey(7)
    i1, m1 = augment_batch(key, imgs, masks)
    i2, m2 = augment_batch(key, imgs, masks)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert i1.shape == imgs.shape and m1.shape == masks.shape
    # masks stay binary through flips/rot90/nearest-remap
    assert set(np.unique(np.asarray(m1))) <= {0.0, 1.0}
    # a different key gives different output
    i3, _ = augment_batch(jax.random.PRNGKey(8), imgs, masks)
    assert not np.array_equal(np.asarray(i1), np.asarray(i3))


def test_hflip_applies(rng):
    """With p=1 the flip must be exact."""
    from unetdc_tpu.data.augment import augment_batch

    imgs = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    masks = jnp.zeros((2, 16, 16), jnp.float32)
    i1, _ = augment_batch(jax.random.PRNGKey(0), imgs, masks,
                          p_hflip=1.0, p_vflip=0.0, p_rot90=0.0, p_bc=0.0,
                          p_elastic=0.0)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(imgs)[:, :, ::-1])


def test_rot90_matches_numpy_convention(rng):
    """albumentations RandomRotate90 applies np.rot90(img, factor); with
    p=1 and a fixed key the chosen k must act like np.rot90."""
    from unetdc_tpu.data.augment import augment_batch

    img = jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(1, 8, 8) > 0.5, jnp.float32)
    for key_i in range(6):
        i1, m1 = augment_batch(jax.random.PRNGKey(key_i), img, mask,
                               p_hflip=0.0, p_vflip=0.0, p_rot90=1.0,
                               p_bc=0.0, p_elastic=0.0)
        outs = [np.rot90(np.asarray(img)[0], k) for k in range(4)]
        assert any(np.allclose(np.asarray(i1)[0], o) for o in outs), key_i
        # mask rotated consistently with image
        mouts = [np.rot90(np.asarray(mask)[0], k) for k in range(4)]
        k_img = next(k for k in range(4)
                     if np.allclose(np.asarray(i1)[0], outs[k]))
        np.testing.assert_allclose(np.asarray(m1)[0], mouts[k_img])


def test_brightness_contrast_formula(rng):
    """albumentations RandomBrightnessContrast float semantics:
    clip(img * (1 + c) + b, 0, 1); verify the transform stays within the
    ±0.2 envelope and is exact for the sampled (c, b)."""
    from unetdc_tpu.data.augment import augment_batch

    img = jnp.asarray(rng.rand(1, 16, 16, 3) * 0.5 + 0.25, jnp.float32)
    mask = jnp.zeros((1, 16, 16), jnp.float32)
    i1, _ = augment_batch(jax.random.PRNGKey(3), img, mask,
                          p_hflip=0.0, p_vflip=0.0, p_rot90=0.0, p_bc=1.0,
                          p_elastic=0.0)
    a = np.asarray(img)[0]
    b = np.asarray(i1)[0]
    # solve for (contrast, brightness) from two pixels; check global fit
    x1, y1 = a[0, 0, 0], b[0, 0, 0]
    x2, y2 = a[8, 8, 1], b[8, 8, 1]
    alpha = (y1 - y2) / (x1 - x2)
    beta = y1 - alpha * x1
    assert 0.8 <= alpha <= 1.2 and -0.2 <= beta <= 0.2, (alpha, beta)
    np.testing.assert_allclose(b, np.clip(a * alpha + beta, 0, 1), atol=1e-5)


def test_elastic_displacement_is_subpixel_at_alpha1(rng):
    """ElasticTransform(alpha=1, sigma=50): displacement magnitude must be
    well below one pixel (smoothing normalizes the field)."""
    from unetdc_tpu.data.augment import _elastic_displacement

    dy, dx = _elastic_displacement(jax.random.PRNGKey(0), (64, 64), 1.0, 50.0)
    assert float(jnp.abs(dy).max()) < 1.0
    assert float(jnp.abs(dx).max()) < 1.0


def test_diffmap_and_counts(rng):
    from unetdc_tpu.ops.diffmap import (create_difference_map,
                                        overlay_difference,
                                        count_color_regions)

    t = np.zeros((32, 32), np.uint8)
    p = np.zeros((32, 32), np.uint8)
    t[2:6, 2:6] = 1          # FN block
    p[10:14, 10:14] = 1      # FP block
    t[20:24, 20:24] = 1      # TP block
    p[20:24, 20:24] = 1
    d = np.asarray(create_difference_map(jnp.asarray(t), jnp.asarray(p)))
    assert tuple(d[3, 3]) == (255, 0, 0)
    assert tuple(d[11, 11]) == (0, 255, 0)
    assert tuple(d[21, 21]) == (255, 255, 0)
    assert tuple(d[0, 0]) == (0, 0, 0)
    counts = count_color_regions(jnp.asarray(d))
    assert counts["red_blobs"] == 1
    assert counts["green_blobs"] == 1
    assert counts["yellow_blobs"] == 1
    assert counts["black_blobs"] == 1
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    ov = np.asarray(overlay_difference(jnp.asarray(img), jnp.asarray(d)))
    np.testing.assert_array_equal(ov[3, 3], (255, 0, 0))
    np.testing.assert_array_equal(ov[0, 0], img[0, 0])


@pytest.fixture
def tiny_dataset(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(3)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(6):
        img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        mask = ((rng.rand(40, 40) > 0.6) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"s{i}.png")
        Image.fromarray(mask).save(mask_dir / f"s{i}.png")
    return str(img_dir), str(mask_dir)


def test_trainer_smoke(tiny_dataset, tmp_path, monkeypatch):
    """Two epochs on tiny data: loss finite, checkpoint written, stdout
    format matches the reference pattern."""
    import re

    from unetdc_tpu.data.dataset import (SegmentationData, discover_pairs,
                                         split_dataset)
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)
    ckpt = tmp_path / "best.msgpack"
    cfg = TrainConfig(model="unetdc", loss="focal_dice", num_epochs=2,
                      patience=5, batch_size=2, img_size=32,
                      ckpt_path=str(ckpt), compute_dtype="f32",
                      background_radius=10, augment=True)
    trainer = Trainer(cfg)
    data = SegmentationData(img_dir, mask_dir, images, masks, batch_size=2,
                            shuffle=True)
    val = SegmentationData(img_dir, mask_dir, images[:2], masks[:2],
                           batch_size=2)

    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hist = trainer.fit(data, val)
    out = buf.getvalue()
    assert re.search(r"Epoch 1/2 \| Train Loss: \d+\.\d{4}, "
                     r"Val Loss: \d+\.\d{4}", out), out
    assert "Model saved!" in out
    assert ckpt.exists()
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])
    # dice improves or at least is a number in [0, 1]
    assert 0.0 <= hist["val_dice"][-1] <= 1.0

    trainer.plot_curves(str(tmp_path / "curves.png"),
                        str(tmp_path / "acc.png"))
    assert (tmp_path / "curves.png").exists()


def test_trainer_resume(tiny_dataset, tmp_path):
    """Resume restores best metric + epoch counter from checkpoint meta."""
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)
    ckpt = tmp_path / "best.msgpack"
    hist = tmp_path / "hist.jsonl"
    kw = dict(model="unetdc", loss="focal_dice", patience=50, batch_size=2,
              img_size=32, ckpt_path=str(ckpt), compute_dtype="f32",
              background_radius=10, augment=False,
              history_jsonl=str(hist))
    data = SegmentationData(img_dir, mask_dir, images, masks, batch_size=2)
    t1 = Trainer(TrainConfig(num_epochs=1, **kw))
    t1.fit(data, data)
    assert ckpt.exists()

    import io
    import contextlib

    t2 = Trainer(TrainConfig(num_epochs=2, resume=True, **kw))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        h = t2.fit(data, data)
    assert "Resumed from" in buf.getvalue()
    assert len(h["train_loss"]) == 1  # only epoch 2 ran
    lines = hist.read_text().strip().splitlines()
    assert len(lines) == 2  # one from each fit
    import json

    rec = json.loads(lines[-1])
    assert rec["epoch"] == 2 and "val_dice" in rec


@pytest.mark.slow
def test_trainer_resume_from_last_is_exact(tiny_dataset, tmp_path):
    """VERDICT r3 item 6 'done' criterion: an interrupted + resumed run
    reproduces the uninterrupted run's epoch metrics EXACTLY. Works because
    ckpt+'.last'(+.opt) snapshots the trajectory every epoch and per-epoch
    PRNG keys are stateless (trainer.py seed*1000+epoch) — augmentation ON
    to pin the stream continuity too. Reference is save-on-best-only
    (train_DC_focal.py:348-358); ours must resume without rewinding."""
    import json

    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)
    data = SegmentationData(img_dir, mask_dir, images, masks, batch_size=2)

    def run(tag, epochs, resume=False):
        ckpt = tmp_path / f"{tag}.msgpack"
        hist = tmp_path / f"{tag}.jsonl"
        cfg = TrainConfig(num_epochs=epochs, resume=resume,
                          model="unetdc", loss="focal_dice", patience=50,
                          batch_size=2, img_size=32, ckpt_path=str(ckpt),
                          compute_dtype="f32", background_radius=10,
                          augment=True, history_jsonl=str(hist))
        import io
        import contextlib

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            Trainer(cfg).fit(data, data)
        return hist, buf.getvalue()

    hist_full, _ = run("full", 3)
    hist_part, _ = run("part", 2)
    # resume the interrupted run: same ckpt/jsonl tag, 3 total epochs
    _, out = run("part", 3, resume=True)
    assert "Resumed from" in out and ".last" in out
    assert "NOTE" not in out  # resumed the LAST epoch, no rewind warning

    full = [json.loads(l) for l in hist_full.read_text().splitlines()]
    part = [json.loads(l) for l in hist_part.read_text().splitlines()]
    assert len(full) == 3 and len(part) == 3
    for a, b in zip(full, part):
        for k in ("epoch", "train_loss", "val_loss", "train_dice",
                  "val_dice", "train_acc", "val_acc"):
            assert a[k] == b[k], (k, a, b)


def test_contour_shrinking_box_matches_reference(rng):
    """Direct numpy port of algorithms.py:316-352 as oracle."""
    from scipy import ndimage as ndi

    from unetdc_tpu.library import contour_shrinking_box

    def ref_shrinking_box(image, threshold):
        mask = np.zeros_like(image, dtype=bool)
        beginx, beginy = 0, 0
        height, width = image.shape
        endy, endx = image.shape
        outer = np.zeros_like(image, dtype=bool)
        outer[beginy:endy, beginx] = image[beginy:endy, beginx] <= threshold
        outer[beginy:endy, endx - 1] = image[beginy:endy, endx - 1] <= threshold
        outer[beginy, beginx:endx] = image[beginy, beginx:endx] <= threshold
        outer[endy - 1, beginx:endx] = image[endy - 1, beginx:endx] <= threshold
        beginx += 1
        beginy += 1
        endx -= 1
        endy -= 1
        while endx - beginx > 1 and endy - beginy > 1:
            inner = np.zeros_like(image, dtype=bool)
            inner[0:beginy, 0:width] = image[0:beginy, 0:width] <= threshold
            inner[0:height, endx:width] = image[0:height, endx:width] <= threshold
            inner[endy:height, 0:width] = image[endy:height, 0:width] <= threshold
            inner[0:height, 0:beginx] = image[0:height, 0:beginx] <= threshold
            dil = ndi.binary_dilation(outer, structure=np.ones((3, 3)))
            mask = dil & inner
            if mask.any():
                outer = outer | mask
            else:
                return ~outer
            beginx += 1
            beginy += 1
            endx -= 1
            endy -= 1
        return ~outer

    img = (rng.rand(40, 44) * 40).astype(np.uint8)
    yy, xx = np.mgrid[:40, :44]
    disk = (yy - 20) ** 2 + (xx - 22) ** 2 <= 14 ** 2
    img[disk] += 120
    for t in (30, 60):
        ref = ref_shrinking_box(img, t)
        ours = contour_shrinking_box(img, t)
        np.testing.assert_array_equal(ours, ref, err_msg=f"t={t}")


def test_prefetcher_propagates_and_orders():
    from unetdc_tpu.data.dataset import Prefetcher

    items = list(Prefetcher(iter(range(10))))
    assert items == list(range(10))

    def boom():
        yield 1
        raise ValueError("decode failed")

    with pytest.raises(ValueError):
        list(Prefetcher(boom()))


@pytest.mark.slow
def test_chunked_training_matches_per_step(tiny_dataset):
    """step_chunk>1 fuses K steps into one lax.scan dispatch.

    Eval chunking (fixed params, no Adam amplification) must match the
    per-step path to f32 fusion noise; a trained epoch is compared at a
    loose tolerance because per-step rounding differences between the two
    XLA programs amplify chaotically through Adam's normalized updates."""
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)

    def make(chunk):
        cfg = TrainConfig(model="unetdc", num_epochs=1, batch_size=2,
                          img_size=32, compute_dtype="f32",
                          background_radius=10, augment=True,
                          step_chunk=chunk, seed=5)
        return Trainer(cfg)

    def val_data():
        return SegmentationData(img_dir, mask_dir, images, masks,
                                batch_size=2)

    # --- eval chunk: same params, must agree tightly -------------------
    e1 = make(1).run_epoch_eval(val_data())
    e2 = make(4).run_epoch_eval(val_data())
    np.testing.assert_allclose(e1[:3], e2[:3], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(e1[3]), np.asarray(e2[3]))

    # --- train epoch: 3 batches -> one 2-chunk + leftover --------------
    def run(chunk):
        tr = make(chunk)
        data = SegmentationData(img_dir, mask_dir, images, masks,
                                batch_size=2, shuffle=True, seed=1)
        metrics = tr.run_epoch_train(data, epoch=0)
        return metrics, tr.variables["params"]

    m1, p1 = run(1)
    m2, p2 = run(2)
    np.testing.assert_allclose(m1, m2, rtol=5e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3), p1, p2)


def test_chunked_eval_mask_saving_matches_per_step(tiny_dataset, tmp_path):
    """r3: mask-saving val epochs fuse into chunked dispatches (one packed
    fetch per chunk) instead of falling back per-step. The written PNGs and
    metrics must be identical to the per-step path."""
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)
    results = []
    for chunk in (1, 4):
        out_dir = tmp_path / f"masks_chunk{chunk}"
        cfg = TrainConfig(model="unetdc", batch_size=2, img_size=32,
                          compute_dtype="f32", background_radius=10,
                          augment=False, step_chunk=chunk, seed=5)
        t = Trainer(cfg)
        data = SegmentationData(img_dir, mask_dir, images, masks,
                                batch_size=2)
        ev = t.run_epoch_eval(data, save_masks_dir=str(out_dir))
        files = sorted(p.name for p in out_dir.iterdir())
        assert len(files) == len(images)
        results.append((ev, out_dir, files))
    (ev1, d1, f1), (ev2, d2, f2) = results
    assert f1 == f2
    np.testing.assert_allclose(ev1[:3], ev2[:3], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ev1[3]), np.asarray(ev2[3]))
    for name in f1:
        assert (d1 / name).read_bytes() == (d2 / name).read_bytes(), name


def test_dataset_decode_cache(tiny_dataset):
    """Second epoch serves decoded samples from RAM (no re-decode)."""
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)
    data = SegmentationData(img_dir, mask_dir, images, masks, batch_size=2)
    b1 = [b["images"].copy() for b in data.batches()]
    assert len(data._cache) == len(images)
    calls = {"n": 0}

    import unetdc_tpu.io.native as nat
    real_decode = nat.decode_rgb

    def counting(path):
        calls["n"] += 1
        return real_decode(path)

    nat.decode_rgb = counting
    try:
        b2 = [b["images"] for b in data.batches()]
    finally:
        nat.decode_rgb = real_decode
    assert calls["n"] == 0
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)

    # cap 0 disables caching
    data0 = SegmentationData(img_dir, mask_dir, images, masks, batch_size=2,
                             cache_bytes=0)
    list(data0.batches())
    assert not data0._cache


def test_fast_remap_matches_gather_path(rng):
    """_remap_subpixel (gather-free 9-shift select) must reproduce
    _remap_bilinear/_remap_nearest exactly for sub-pixel displacements."""
    from unetdc_tpu.data.augment import (_remap_bilinear, _remap_nearest,
                                         _remap_subpixel)

    img = jnp.asarray(rng.rand(33, 41, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(33, 41) > 0.5, jnp.float32)
    dy = jnp.asarray(rng.uniform(-0.999, 0.999, (33, 41)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-0.999, 0.999, (33, 41)), jnp.float32)
    yy = jnp.arange(33, dtype=jnp.float32)[:, None] + dy
    xx = jnp.arange(41, dtype=jnp.float32)[None, :] + dx
    np.testing.assert_allclose(
        np.asarray(_remap_bilinear(img, yy, xx)),
        np.asarray(_remap_subpixel(img, dy, dx, nearest=False)), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(_remap_nearest(mask, yy, xx)),
        np.asarray(_remap_subpixel(mask, dy, dx, nearest=True)))


def test_elastic_coarse_field_subpixel():
    """The coarse-grid elastic field (large images) stays sub-pixel and
    smooth, like the exact small-image path."""
    from unetdc_tpu.data.augment import _elastic_displacement

    dy, dx = _elastic_displacement(jax.random.PRNGKey(0), (512, 512),
                                   1.0, 50.0)
    assert dy.shape == (512, 512) and dx.shape == (512, 512)
    assert float(jnp.abs(dy).max()) < 1.0
    assert float(jnp.abs(dx).max()) < 1.0
    # smoothness: neighboring displacement deltas are tiny
    assert float(jnp.abs(jnp.diff(dy, axis=0)).max()) < 0.02


@pytest.mark.slow
def test_chunked_training_mixed_sizes(tmp_path):
    """Chunk grouping flushes correctly at image-size boundaries: a dataset
    with two original sizes must train without error and count every batch
    once (metrics from chunked == per-step)."""
    from PIL import Image
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    rng = np.random.RandomState(5)
    img_dir = tmp_path / "img"
    mask_dir = tmp_path / "msk"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i, size in enumerate([40, 40, 48, 48, 40, 40, 48, 48]):
        Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)
                        ).save(img_dir / f"m{i}.png")
        Image.fromarray(((rng.rand(size, size) > 0.5) * 255).astype(np.uint8)
                        ).save(mask_dir / f"m{i}.png")
    images, masks = discover_pairs(str(img_dir), str(mask_dir))

    def run(chunk):
        cfg = TrainConfig(model="unetdc", batch_size=2, img_size=32,
                          compute_dtype="f32", background_radius=10,
                          augment=False, step_chunk=chunk, seed=2)
        tr = Trainer(cfg)
        data = SegmentationData(str(img_dir), str(mask_dir), images, masks,
                                batch_size=2)  # no shuffle: sizes alternate
        return tr.run_epoch_train(data, 0)

    m1 = run(1)
    m4 = run(4)  # forces flush at each 40<->48 boundary
    np.testing.assert_allclose(m1, m4, rtol=5e-3)


def test_device_bank_byte_cap(tiny_dataset):
    """device_cache_bytes caps the HBM sample bank; 0 disables it."""
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_dataset
    images, masks = discover_pairs(img_dir, mask_dir)
    data = SegmentationData(img_dir, mask_dir, images, masks, batch_size=2)
    batches = list(data.batches())

    tr = Trainer(TrainConfig(model="unetdc", batch_size=2, img_size=32,
                             compute_dtype="f32", device_cache_bytes=0))
    tr._stack_batch(batches[0])
    assert not tr._devbank

    one_sample = batches[0]["sample_images"][0].nbytes + \
        batches[0]["sample_masks"][0].nbytes
    tr2 = Trainer(TrainConfig(model="unetdc", batch_size=2, img_size=32,
                              compute_dtype="f32",
                              device_cache_bytes=one_sample + 1))
    a, b = tr2._stack_batch(batches[0])
    # only what fits was cached, and re-stacking reuses it
    n_before = len(tr2._devbank)
    assert 0 < n_before < 4
    tr2._stack_batch(batches[0])
    assert len(tr2._devbank) == n_before
    np.testing.assert_array_equal(np.asarray(a), batches[0]["images"])
