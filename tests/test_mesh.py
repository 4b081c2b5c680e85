"""Mesh/sharding layer tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from arvae_tpu.parallel import create_mesh, shard_batch


def test_mesh_shape_default():
    ctx = create_mesh()
    assert ctx.n_data == len(jax.devices())
    assert ctx.n_model == 1


def test_shard_batch_even():
    ctx = create_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    y = shard_batch(ctx, {"x": x})["x"]
    assert y.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(y), x)
    assert len(y.sharding.device_set) == ctx.n_data


def test_shard_batch_pads_uneven():
    ctx = create_mesh()
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = shard_batch(ctx, x)
    assert y.shape[0] % ctx.n_data == 0
    np.testing.assert_array_equal(np.asarray(y)[:10], x)


def test_sharded_computation_matches_single_device():
    ctx = create_mesh()
    rng = np.random.RandomState(0)
    x = rng.randn(32, 8).astype(np.float32)
    w = rng.randn(8, 4).astype(np.float32)

    @jax.jit
    def f(xx, ww):
        return jnp.mean(jnp.tanh(xx @ ww))

    xs = shard_batch(ctx, x)
    ws = jax.device_put(w, ctx.replicated)
    np.testing.assert_allclose(f(xs, ws), f(x, w), rtol=1e-6)
