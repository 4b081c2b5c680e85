"""Data-parallel correctness: the sharded train step must match the
single-device computation exactly (same grads → same params)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from arvae_tpu.models import DspritesVAE
from arvae_tpu.ops.losses import kld_loss, reconstruction_loss, total_reg_loss
from arvae_tpu.parallel import create_mesh, shard_batch

REG_PAIRS = tuple((d, d) for d in (1, 2, 3, 4, 5))


def _setup():
    model = DspritesVAE()
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 1, 64, 64)), train=False,
    )["params"]
    rng = np.random.RandomState(0)
    images = (rng.rand(16, 1, 64, 64) > 0.7).astype(np.float32)
    labels = rng.rand(16, 6).astype(np.float32)

    def loss_fn(p, imgs, labs, key):
        out = model.apply({"params": p}, imgs, train=False,
                          rngs={"sample": key})
        l = reconstruction_loss(out.logits, imgs)
        l += kld_loss(out.z_mean, out.z_log_std, 1.0)
        l += total_reg_loss(out.z_tilde, labs, REG_PAIRS, 10.0, 1.0)
        return l

    return model, params, images, labels, loss_fn


def test_sharded_loss_and_grads_match_single_device():
    model, params, images, labels, loss_fn = _setup()
    key = jax.random.key(7)

    vg = jax.jit(jax.value_and_grad(loss_fn))

    # single device
    l1, g1 = vg(params, jnp.asarray(images), jnp.asarray(labels), key)

    # 8-device mesh, batch sharded
    ctx = create_mesh()
    assert ctx.n_data == 8
    p_r = jax.device_put(params, ctx.replicated)
    imgs_s, labs_s = shard_batch(ctx, (images, labels))
    l8, g8 = vg(p_r, imgs_s, labs_s, key)

    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g8, g1,
    )


def test_sharded_adam_step_matches():
    model, params, images, labels, loss_fn = _setup()
    opt = optax.adam(1e-3)
    key = jax.random.key(3)

    @jax.jit
    def step(p, o, imgs, labs):
        grads = jax.grad(loss_fn)(p, imgs, labs, key)
        u, o = opt.update(grads, o, p)
        return optax.apply_updates(p, u), o

    p1, _ = step(params, opt.init(params), jnp.asarray(images),
                 jnp.asarray(labels))

    ctx = create_mesh()
    p_r = jax.device_put(params, ctx.replicated)
    o_r = jax.device_put(opt.init(params), ctx.replicated)
    imgs_s, labs_s = shard_batch(ctx, (images, labels))
    p8, _ = step(p_r, o_r, imgs_s, labs_s)

    # adam's g/(sqrt(v)+eps) amplifies reduction-order noise for params
    # with tiny grads; observed max deviation ~1.4e-5 on lr=1e-3 steps
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        p8, p1,
    )
