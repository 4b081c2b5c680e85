"""Row-sharded device-resident splits (VERDICT r2 item 3).

On a d-device data axis each chip must store only N/d rows, while the
batch gather returns bit-identical batches to the replicated path (the
global epoch permutation is unchanged; the shard_map + psum_scatter
gather is just a distributed realisation of the same jnp.take).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.data.device_data import DeviceEpochRunner, DeviceSplit
from arvae_tpu.parallel import create_mesh

N, D, L, B = 1003, 64, 3, 32  # N deliberately not divisible by 8


@pytest.fixture(scope="module")
def ctx():
    return create_mesh()  # (8, 1) on the test mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    rows = rng.randint(0, 256, (N, D)).astype(np.uint8)
    labels = rng.randn(N, L).astype(np.float32)
    return rows, labels


def _splits(ctx, data, kind):
    rows, labels = data
    if kind == "tokens":
        rows = rows.astype(np.int32)
        labels = rows
    shape = (D * 8,) if kind == "packed" else (D,)
    sharded = DeviceSplit(rows, labels, shape, kind, ctx, row_sharded=True)
    repl = DeviceSplit(rows, labels, shape, kind, ctx, row_sharded=False)
    return sharded, repl


@pytest.mark.parametrize("kind", ["packed", "bytes", "tokens"])
def test_sharded_gather_matches_replicated(ctx, data, kind):
    sharded, repl = _splits(ctx, data, kind)
    assert sharded.row_sharded and not repl.row_sharded
    rng = np.random.RandomState(1)
    for _ in range(3):
        idx = jnp.asarray(rng.permutation(N)[:B].astype(np.int32))
        got = jax.jit(sharded.gather_batch)(
            sharded.images, sharded.labels, idx
        )
        want = jax.jit(repl.gather_batch)(repl.images, repl.labels, idx)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sharded_storage_is_actually_sharded(ctx, data):
    sharded, repl = _splits(ctx, data, "bytes")
    d = ctx.n_data
    # replicated: every device holds all N rows; sharded: ceil(N/d)
    repl_rows = {s.data.shape[0] for s in repl.images.addressable_shards}
    shard_rows = {s.data.shape[0] for s in sharded.images.addressable_shards}
    assert repl_rows == {N}
    assert shard_rows == {-(-N // d)}


def test_epoch_runner_losses_identical(ctx, data):
    """A toy training loop produces identical per-epoch metric totals
    through the sharded and replicated splits."""
    rows, labels = data

    def run(row_sharded):
        tr = DeviceSplit(rows, labels, (D,), "bytes", ctx,
                         row_sharded=row_sharded)
        va = DeviceSplit(rows[:256], labels[:256], (D,), "bytes", ctx,
                         row_sharded=row_sharded)
        w0 = jnp.zeros((D,), jnp.float32)

        def train_step(w, batch, key):
            imgs, labs = batch
            loss = jnp.mean((imgs @ w - labs[:, 0]) ** 2)
            g = jax.grad(lambda w: jnp.mean((imgs @ w - labs[:, 0]) ** 2))(w)
            return w - 1e-3 * g, {"loss": loss}

        def eval_step(w, batch, key):
            imgs, labs = batch
            return {"loss": jnp.mean((imgs @ w - labs[:, 0]) ** 2)}

        runner = DeviceEpochRunner(
            tr, va, B, train_step, eval_step,
            jax.random.PRNGKey(0), steps_per_call=8,
        )
        w, totals, steps, first = runner.train_epoch(w0, 0)
        ev, _ = runner.eval_epoch(w, 0)
        return float(totals["loss"]), float(ev["loss"]), np.asarray(w)

    t_s, e_s, w_s = run(True)
    t_r, e_r, w_r = run(False)
    np.testing.assert_allclose(t_s, t_r, rtol=1e-6)
    np.testing.assert_allclose(e_s, e_r, rtol=1e-6)
    np.testing.assert_allclose(w_s, w_r, rtol=1e-6)


@pytest.mark.parametrize("b", [5, 12, 13])
def test_nondivisible_batch_stays_shard_local(ctx, data, b):
    """Batches that don't divide the data axis ride the padded
    shard_map gather (no dataset all-gather) and still match the
    replicated result."""
    sharded, repl = _splits(ctx, data, "bytes")
    idx = jnp.asarray(np.random.RandomState(4).permutation(N)[:b]
                      .astype(np.int32))
    got = jax.jit(sharded.gather_batch)(sharded.images, sharded.labels, idx)
    want = jax.jit(repl.gather_batch)(repl.images, repl.labels, idx)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sharded_gather_on_4x2_mesh(data):
    """Row sharding + psum_scatter gather with a nontrivial model axis:
    rows shard over data=4, replicate over model=2."""
    ctx42 = create_mesh(devices=jax.devices()[:8], data_parallel=4,
                        model_parallel=2)
    rows, labels = data
    sharded = DeviceSplit(rows, labels, (D,), "bytes", ctx42,
                          row_sharded=True)
    repl = DeviceSplit(rows, labels, (D,), "bytes", ctx42,
                       row_sharded=False)
    idx = jnp.asarray(np.random.RandomState(2).permutation(N)[:B]
                      .astype(np.int32))
    got = jax.jit(sharded.gather_batch)(sharded.images, sharded.labels, idx)
    want = jax.jit(repl.gather_batch)(repl.images, repl.labels, idx)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    per_dev = {s.data.shape[0] for s in sharded.images.addressable_shards}
    assert per_dev == {-(-N // 4)}  # N/4 rows per chip, replicated on model
