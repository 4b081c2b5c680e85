"""MeasureVAE training-throughput bench (real TPU).

Measures steps/sec of the full music AR-VAE objective (token CE +
beta-KLD + 4-dim pairwise AR reg with attribute labels computed inside
jit) at the reference recipe: B=256, hidden 128, latent 32, 2 layers
(``train_measure_vae.py`` defaults; reference hot loop
``measurevae/decoder.py:469-525``). Synthetic token corpus so no
dataset files are needed; dispatch amortized 32 steps/call like the
real training loop (arvae_tpu/data/device_data.py).

Usage: python scripts/bench_measure_vae.py [--decoder hier|sr|sr-no-input]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
N_ROWS = 65_536
WARMUP_STEPS = 128
MEASURE_STEPS = 1024
VOCAB_SIZE = 130


def build_vocab(n: int):
    """Realistic folk-scale vocab: specials + slurred/plain pitches."""
    names = ["__", "START", "END", "rest"]
    midi = 36
    while len(names) < n:
        octave, pc = divmod(midi, 12)
        letter = ["C", "C#", "D", "E-", "E", "F", "F#", "G", "A-", "A",
                  "B-", "B"][pc]
        names.append(f"{letter}{octave - 1}")
        midi += 1
    return {i: s for i, s in enumerate(names[:n])}


def measure(decoder_type: str = "hier", batch: int = BATCH,
            measure_steps: int = MEASURE_STEPS, ablate: str = "none",
            unroll: int = 1) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from arvae_tpu.data.attributes import MusicAttributes
    from arvae_tpu.models.measure_vae import MEASURE_SEQ_LEN, MeasureVAE
    from arvae_tpu.ops.losses import (
        kld_loss,
        token_accuracy,
        token_cross_entropy_loss,
        total_reg_loss,
    )
    from arvae_tpu.parallel import create_mesh

    ctx = create_mesh()
    attrs = MusicAttributes(build_vocab(VOCAB_SIZE))
    model = MeasureVAE(
        num_notes=VOCAB_SIZE,
        note_embedding_dim=10,
        num_encoder_layers=2,
        encoder_hidden_size=128,
        latent_space_dim=32,
        num_decoder_layers=2,
        decoder_hidden_size=128,
        decoder_type=decoder_type,
    )
    optimizer = optax.adam(1e-4)
    reg_pairs = tuple((d, d) for d in range(4))

    K = 32  # steps per dispatch chunk (matches data/device_data.py)

    rng = np.random.RandomState(0)
    # corpus must hold at least one K-step chunk at this batch size
    # (B=4096 × K=32 exceeds the 65k default)
    n_rows = max(N_ROWS, batch * K)
    scores_np = rng.randint(0, VOCAB_SIZE, (n_rows, MEASURE_SEQ_LEN)
                            ).astype(np.int32)
    scores = jax.device_put(scores_np, ctx.replicated)

    def loss_fn(p, score, key):
        if ablate == "encoder":
            # encoder + reparam only
            z_mean, z_log_std = model.apply(
                {"params": p}, score, train=True,
                method=model.encode,
                rngs={"dropout": jax.random.fold_in(key, 1)},
            )
            loss = kld_loss(z_mean, z_log_std, 0.001, 0.0) + jnp.mean(z_mean)
            return loss, loss
        out = model.apply({"params": p}, score, train=True, rng_key=key)
        loss = token_cross_entropy_loss(out.weights, score)
        loss += kld_loss(out.z_mean, out.z_log_std, 0.001, 0.0)
        if ablate != "noreg":
            labels = attrs.compute_labels(score)
            loss += total_reg_loss(out.z_tilde, labels, reg_pairs, 1.0, 10.0)
        return loss, token_accuracy(out.weights, score)

    def train_step(state, score, key):
        params, opt_state = state
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, score, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), {"loss": loss, "accuracy": acc}

    @jax.jit
    def chunk(state, scores, perm, i0, key):
        def body(st, k):
            idx = jax.lax.dynamic_slice(perm, ((i0 + k) * batch,), (batch,))
            score = jnp.take(scores, idx, axis=0)
            return train_step(st, score, jax.random.fold_in(key, k))
        # unroll>1 inlines that many consecutive train steps into one
        # scan iteration — XLA then schedules across the step boundary
        # (the "dispatch 2+ steps per trace segment" composition
        # experiment against the ~0.4 ms launch/fusion-barrier gap,
        # docs/design.md "Where the remaining 0.66 ms goes")
        state, stacked = jax.lax.scan(body, state, jnp.arange(K),
                                      unroll=unroll)
        return state, jax.tree_util.tree_map(lambda m: m[-1], stacked)

    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1),
         "dropout": jax.random.key(2)},
        jnp.zeros((1, MEASURE_SEQ_LEN), jnp.int32), train=True,
    )["params"]
    params = jax.device_put(params, ctx.replicated)
    opt_state = jax.device_put(optimizer.init(params), ctx.replicated)
    state = (params, opt_state)
    perm = jax.random.permutation(jax.random.key(1), n_rows).astype(jnp.int32)

    # i0 is a STEP index (the scan slices at (i0 + k) * batch); keep it
    # K-aligned and inside the permutation so successive chunks cover
    # disjoint batch windows with no clamped out-of-range slices.
    n_chunk_starts = (n_rows // batch // K) * K
    if n_chunk_starts == 0:
        raise ValueError(
            f"batch={batch} too large: the {n_rows}-row corpus holds "
            f"fewer than one K={K} step chunk ({n_rows // batch} batches)"
        )

    i = 0
    while i < WARMUP_STEPS:
        state, last = chunk(state, scores, perm, i % n_chunk_starts,
                            jax.random.fold_in(jax.random.key(2), i))
        i += K
    float(last["loss"])  # value-pull sync (see bench.py)

    # Median of 3 windows: the tunneled transport adds run-to-run
    # variance (~±10%) that a single window inherits wholesale.
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        n = 0
        while n < measure_steps:
            state, last = chunk(state, scores, perm, n % n_chunk_starts,
                                jax.random.fold_in(jax.random.key(3 + w), n))
            n += K
        float(last["loss"])
        rates.append(n / (time.perf_counter() - t0))
    return sorted(rates)[1]


def analytic_matmul_flops(batch: int = BATCH, hidden: int = 128,
                          vocab: int = VOCAB_SIZE, emb: int = 10,
                          latent: int = 32, seq: int = 24) -> float:
    """Matmul FLOPs of ONE training step (fwd + ~2x for bwd), counted
    from the model architecture (the XLA cost model cannot see inside
    the Pallas custom calls, so this is done by hand).

    Dominant terms are the recurrent (B,H)@(H,3H) matmuls: encoder
    2 layers x 2 dirs x T, decoder tick 24 x (gh0 + gi1 + gh1), beat
    GRU 4 x 2 layers x (gi+gh); plus projections/heads and the
    (B,V)@(V,E) one-hot embedding lookups.
    """
    B, H, V, E, L, T = batch, hidden, vocab, emb, latent, seq
    mm = lambda m, k, n: 2.0 * m * k * n  # noqa: E731
    fwd = 0.0
    # encoder: input projections (hoisted) + recurrences, 2 layers x 2 dirs
    fwd += 2 * mm(B * T, E, 3 * H) + 2 * mm(B * T, 2 * H, 3 * H)
    fwd += 2 * 2 * T * mm(B, H, 3 * H)
    # encoder heads: flatten(4H) -> 2H -> 2 x latent
    fwd += mm(B, 4 * H, 2 * H) + 2 * mm(B, 2 * H, L)
    # decoder: z2beat, beat GRU (4 steps, 2 layers), beat->tick heads
    fwd += mm(B, L, 2 * H)
    fwd += 4 * 2 * 2 * mm(B, H, 3 * H)  # beat gi+gh per layer-step
    fwd += mm(4 * B, H, 2 * H) + mm(4 * B, H, H) + mm(4 * B, H, 3 * H)
    # tick loop: 24 x (emb proj + gh0 + gi1 + gh1 + head + onehot-embed)
    fwd += T * (mm(B, E, 3 * H) + 3 * mm(B, H, 3 * H)
                + mm(B, H, V) + mm(B, V, E))
    return 3.0 * fwd  # bwd ~ 2x fwd


def measure_peak_matmul_tflops(n: int = 4096, iters: int = 128) -> float:
    """Measured dense-matmul speed of light on this chip (f32), via the
    slope of two chain lengths (cancels dispatch cost)."""
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.key(0), (n, n))
    b = jax.random.normal(jax.random.key(1), (n, n))

    def chain(k):
        @jax.jit
        def go(a):
            def body(x, _):
                y = x @ b
                return y * (1.0 / jnp.max(jnp.abs(y))), 0.0
            x, _ = jax.lax.scan(body, a, jnp.arange(k))
            return x.mean()
        out = go(a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = go(a)
            float(np.asarray(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    t_short, t_long = chain(iters // 4), chain(iters)
    per = (t_long - t_short) / (iters - iters // 4)
    return 2.0 * n ** 3 / per / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", default="hier",
                    choices=["hier", "sr", "sr-no-input"])
    ap.add_argument("--steps", type=int, default=MEASURE_STEPS)
    ap.add_argument("--ablate", default="none",
                    choices=["none", "noreg", "encoder"])
    ap.add_argument("--unroll", type=int, default=1,
                    help="train steps inlined per scan iteration")
    args = ap.parse_args()
    sps = measure(args.decoder, measure_steps=args.steps,
                  ablate=args.ablate, unroll=args.unroll)
    tag = "" if args.ablate == "none" else f"_{args.ablate}"
    if args.unroll != 1:
        tag += f"_unroll{args.unroll}"
    print(json.dumps({
        "metric": f"measure_vae_{args.decoder}{tag}_train_steps_per_sec_b{BATCH}",
        "value": round(sps, 2),
        "unit": "steps/sec",
    }))


if __name__ == "__main__":
    main()
