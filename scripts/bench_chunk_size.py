"""Dispatch-amortization sweep: dSprites train throughput vs K
(steps per lax.scan chunk). Informs DeviceEpochRunner's default."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
N_ROWS = 131_072


def measure(k_steps: int, measure_steps: int = 2048) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from arvae_tpu.data.device_data import DeviceSplit
    from arvae_tpu.models import DspritesVAE
    from arvae_tpu.ops.losses import (kld_loss, reconstruction_loss,
                                      total_reg_loss)
    from arvae_tpu.parallel import create_mesh

    ctx = create_mesh()
    model = DspritesVAE()
    reg_pairs = tuple((d, d) for d in (1, 2, 3, 4, 5))
    optimizer = optax.adam(1e-4)
    rng = np.random.RandomState(0)
    packed = rng.randint(0, 256, (N_ROWS, 512)).astype(np.uint8)
    labels = rng.rand(N_ROWS, 6).astype(np.float32)
    split = DeviceSplit(packed, labels, (1, 64, 64), "packed", ctx)

    def loss_fn(p, batch, key):
        images, labs = batch
        k1, k2 = jax.random.split(key)
        out = model.apply({"params": p}, images, train=True,
                          rngs={"dropout": k1, "sample": k2})
        loss = reconstruction_loss(out.logits, images, "bernoulli")
        loss += kld_loss(out.z_mean, out.z_log_std, 1.0, 0.0)
        loss += total_reg_loss(out.z_tilde, labs, reg_pairs, 10.0, 1.0)
        return loss

    @jax.jit
    def chunk(state, images, labels, perm, i0, key):
        def body(st, k):
            params, opt_state = st
            idx = jax.lax.dynamic_slice(perm, ((i0 + k) * BATCH,), (BATCH,))
            batch = split.gather_batch(images, labels, idx)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, jax.random.fold_in(key, k))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        state, losses = jax.lax.scan(body, state, jnp.arange(k_steps))
        return state, losses[-1]

    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sample": jax.random.key(2)},
        jnp.zeros((1, 1, 64, 64), jnp.float32), train=True)["params"]
    state = (jax.device_put(params, ctx.replicated),
             jax.device_put(optimizer.init(params), ctx.replicated))
    perm = jax.random.permutation(jax.random.key(1), N_ROWS).astype(jnp.int32)
    # Chunk starts advance by k_steps (matching DeviceEpochRunner) and
    # wrap on a whole-chunk boundary so every dynamic_slice start stays
    # inside the permutation.
    n_chunk_starts = (N_ROWS // BATCH // k_steps) * k_steps

    i = 0
    while i < 4 * k_steps:  # warmup
        state, last = chunk(state, split.images, split.labels, perm,
                            i % n_chunk_starts,
                            jax.random.fold_in(jax.random.key(2), i))
        i += k_steps
    float(last)

    t0 = time.perf_counter()
    n = 0
    while n < measure_steps:
        state, last = chunk(state, split.images, split.labels, perm,
                            n % n_chunk_starts,
                            jax.random.fold_in(jax.random.key(3), n))
        n += k_steps
    float(last)
    return n / (time.perf_counter() - t0)


def main():
    for k in (16, 32, 64, 128):
        sps = measure(k)
        print(json.dumps({"k_steps": k, "steps_per_sec": round(sps, 1)}))


if __name__ == "__main__":
    main()
