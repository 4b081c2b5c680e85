"""Mesh/sharding layer tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.parallel import (
    create_mesh,
    masked_mean,
    shard_batch,
    shard_batch_padded,
    shard_batch_truncated,
)

pytestmark = pytest.mark.fast


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


def test_shard_batch_raises_on_uneven():
    # silent repeat-padding biased downstream means; non-divisible
    # batches must now pick explicit semantics
    ctx = create_mesh()
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    with pytest.raises(ValueError, match="does not divide"):
        shard_batch(ctx, x)


def test_shard_batch_padded_mask_gives_unbiased_mean():
    # regression: the mean of a non-divisible batch through the
    # pad+mask path equals the plain numpy mean exactly
    ctx = create_mesh()
    rng = np.random.RandomState(0)
    x = rng.randn(13, 4).astype(np.float32)  # 13 % 8 != 0
    (xp,), mask = shard_batch_padded(ctx, (x,))
    assert xp.shape[0] % ctx.n_data == 0
    assert mask.shape == (xp.shape[0],)

    @jax.jit
    def mean_fn(v, m):
        return masked_mean(v, m)

    np.testing.assert_allclose(
        float(mean_fn(xp, mask)), float(x.mean()), rtol=1e-6
    )


def test_shard_batch_truncated_drops_remainder():
    ctx = create_mesh()
    x = np.arange(13, dtype=np.float32).reshape(13, 1)
    y = shard_batch_truncated(ctx, x)
    keep = (13 // ctx.n_data) * ctx.n_data
    assert y.shape[0] == keep
    np.testing.assert_array_equal(np.asarray(y), x[:keep])


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


def test_shard_batch_truncated_zero_rows_returns_none():
    """A final partial batch smaller than the data axis must be skipped
    by the caller, not silently become a zero-row batch (0/0 NaNs in
    downstream means)."""
    ctx = create_mesh()
    if ctx.n_data < 2:
        return
    x = np.arange(ctx.n_data - 1, dtype=np.float32).reshape(-1, 1)
    assert shard_batch_truncated(ctx, x) is None
