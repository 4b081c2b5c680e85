"""Benchmark: AR-VAE training steps/sec on the flagship recipe.

Measures the full dSprites AR-VAE training step (recon + KLD + 5-dim
pairwise AR reg, batch 128 — the reference training recipe from
``train_image_vae.py:15-19`` with the paper's AR-VAE hyperparameters)
in steps/sec on whatever backend JAX selects (TPU under the driver).

Baseline: the same model+objective in PyTorch on this machine's CPU
(the reference is torch-CPU/single-GPU; this host has no GPU), measured
by ``scripts/measure_baseline_torch.py`` and cached in
``BASELINE_MEASURED.json``. vs_baseline = ours / reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import os
import time

import numpy as np

BATCH = 128
WARMUP = 20  # first iterations absorb compile + device warmup
ITERS = 100


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from arvae_tpu.models import DspritesVAE
    from arvae_tpu.ops.losses import kld_loss, reconstruction_loss, total_reg_loss
    from arvae_tpu.parallel import create_mesh, shard_batch

    ctx = create_mesh()
    model = DspritesVAE()
    reg_pairs = tuple((d, d) for d in (1, 2, 3, 4, 5))
    # XLA fuses the pairwise reg block as fast as the Pallas kernel at
    # this size (measured: both launch-bound, ops/losses.py); the env
    # toggle keeps the kernel benchmarkable.
    use_pallas = bool(os.environ.get("ARVAE_BENCH_PALLAS"))

    def loss_fn(params, images, labels, key):
        k_drop, k_sample = jax.random.split(key)
        out = model.apply(
            {"params": params}, images, train=True,
            rngs={"dropout": k_drop, "sample": k_sample},
        )
        loss = reconstruction_loss(out.logits, images, "bernoulli")
        loss += kld_loss(out.z_mean, out.z_log_std, beta=1.0, c=0.0)
        loss += total_reg_loss(out.z_tilde, labels, reg_pairs, 10.0, 1.0,
                               use_pallas=use_pallas)
        return loss

    optimizer = optax.adam(1e-4)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images, labels, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.RandomState(0)
    images = (rng.rand(BATCH, 1, 64, 64) > 0.7).astype(np.float32)
    labels = rng.rand(BATCH, 6).astype(np.float32)

    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sample": jax.random.key(2)},
        jnp.zeros((1, 1, 64, 64), jnp.float32), train=True,
    )["params"]
    params = jax.device_put(params, ctx.replicated)
    opt_state = jax.device_put(optimizer.init(params), ctx.replicated)
    imgs, labs = shard_batch(ctx, (images, labels))

    key = jax.random.key(0)
    for i in range(WARMUP):
        params, opt_state, loss = train_step(params, opt_state, imgs, labs,
                                             jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(ITERS):
        params, opt_state, loss = train_step(params, opt_state, imgs, labs,
                                             jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return ITERS / dt


def baseline_steps_per_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["dsprites_arvae_steps_per_sec"])
    return float("nan")


def main():
    ours = measure_ours()
    base = baseline_steps_per_sec()
    vs = ours / base if base == base else float("nan")
    print(json.dumps({
        "metric": "dsprites_arvae_train_steps_per_sec_b128",
        "value": round(ours, 2),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
