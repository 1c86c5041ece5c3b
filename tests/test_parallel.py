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
        if mesh is not None:
            from unetdc_tpu.core.mesh import batch_sharding

            x = jax.device_put(x, batch_sharding(mesh, 4))
            m = jax.device_put(m, batch_sharding(mesh, 4))
        (_, _, _, loss, dice, _) = t._train_step(
            t.variables["params"], t.variables["batch_stats"],
            t.opt_state, x, m)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
