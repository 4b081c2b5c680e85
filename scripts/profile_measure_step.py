"""Attribute the MeasureVAE train step's time (VERDICT r2 item 5).

The fused step runs at ~0.91 ms (B=256, H=128) against a ~0.25 ms
matmul floor. This script breaks the step into components and times
each as a 64-iteration dependency chain inside one jit (so dispatch is
amortized exactly like the training loop's chunked scan):

  enc_kernel      gru_chain fwd+bwd alone (2 layers x 2 dirs)
  dec_kernel      hier_tick_chain fwd+bwd alone
  encode          model.encode fwd+bwd (kernels + projections + heads)
  full            full train step (loss + labels + adam)
  glue            full - encode - (full decode path):  derived

Run on the real TPU: python scripts/profile_measure_step.py [--batch 256]
Optionally --trace /tmp/jaxtrace to dump a profiler trace of one chunk.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)  # bench_measure_vae lives next to this script

from bench_measure_vae import VOCAB_SIZE, build_vocab  # noqa: E402

T = 24
H = 128
E = 10
LAT = 32
ITERS = 64


def _time_chain(fn, *args, reps=20):
    """Median wall time of fn(*args) (jitted, ITERS-iteration chain)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # value-pull sync (tunneled transport: block_until_ready can
        # return before the queue drains)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        # (chains return scalars, so this pull is cheap)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / ITERS


def profile(batch: int):
    import jax
    import jax.numpy as jnp
    import optax

    from arvae_tpu.data.attributes import MusicAttributes
    from arvae_tpu.models.measure_vae import MEASURE_SEQ_LEN, MeasureVAE
    from arvae_tpu.ops.gru_pallas import gru_chain
    from arvae_tpu.ops.hier_decoder_pallas import hier_tick_chain
    from arvae_tpu.ops.losses import (kld_loss, token_cross_entropy_loss,
                                      total_reg_loss)

    B = batch
    V = VOCAB_SIZE
    key = jax.random.key(0)
    results = {}

    # --- encoder chain kernel alone (one layer, both dirs batched) -----
    gi = jax.random.normal(key, (T, 2, B, 3 * H))
    w_hh = jax.random.normal(key, (2, H, 3 * H)) * 0.05
    b_hh = jnp.zeros((2, 3 * H))
    h0 = jnp.zeros((2, B, H))

    @jax.jit
    def enc_fwd_chain(gi):
        def body(g, _):
            outs = gru_chain(g, w_hh, b_hh, h0)
            return g + 1e-6 * outs.mean(), outs[-1, 0, 0, 0]
        g, _ = jax.lax.scan(body, gi, jnp.arange(ITERS))
        return g.mean()

    @jax.jit
    def enc_fwdbwd_chain(gi):
        def loss(g):
            return gru_chain(g, w_hh, b_hh, h0).sum()
        def body(g, _):
            val, grad = jax.value_and_grad(loss)(g)
            return g + 1e-9 * grad, val
        g, _ = jax.lax.scan(body, gi, jnp.arange(ITERS))
        return g.mean()

    results["enc_layer_kernel_fwd_ms"] = _time_chain(enc_fwd_chain, gi) * 1e3
    results["enc_layer_kernel_fwdbwd_ms"] = (
        _time_chain(enc_fwdbwd_chain, gi) * 1e3)

    # --- decoder tick kernel alone -------------------------------------
    kk = jax.random.split(key, 16)
    gi_beat = jax.random.normal(kk[0], (4, B, 3 * H))
    tick_h0 = jax.random.normal(kk[1], (4, 2, B, H)) * 0.1
    x0 = jnp.zeros((B, E))
    emb = jax.random.normal(kk[2], (V, E)) * 0.1
    w_ih0e = jax.random.normal(kk[3], (E, 3 * H)) * 0.1
    w_hh0 = jax.random.normal(kk[4], (H, 3 * H)) * 0.05
    b_hh0 = jnp.zeros((3 * H,))
    w_ih1 = jax.random.normal(kk[5], (H, 3 * H)) * 0.05
    b_ih1 = jnp.zeros((3 * H,))
    w_hh1 = jax.random.normal(kk[6], (H, 3 * H)) * 0.05
    b_hh1 = jnp.zeros((3 * H,))
    out_w = jax.random.normal(kk[7], (H, V)) * 0.1
    out_b = jnp.zeros((V,))
    score_t = jnp.zeros((T, B), jnp.int32)

    def dec_call(gi_beat, tick_h0):
        w, s = hier_tick_chain(
            T, True, 0.5, 6, "argmax",
            jnp.asarray(1, jnp.int32), jnp.asarray(7, jnp.int32), score_t,
            gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0,
            w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b,
        )
        return w

    @jax.jit
    def dec_fwd_chain(gi_beat, tick_h0):
        def body(c, _):
            gb, th = c
            w = dec_call(gb, th)
            return (gb + 1e-6 * w.mean(), th), w[0, 0, 0]
        c, _ = jax.lax.scan(body, (gi_beat, tick_h0), jnp.arange(ITERS))
        return c[0].mean()

    @jax.jit
    def dec_fwdbwd_chain(gi_beat, tick_h0):
        def loss(gb, th):
            return dec_call(gb, th).sum()
        def body(c, _):
            gb, th = c
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(gb, th)
            return (gb + 1e-9 * grads[0], th + 1e-9 * grads[1]), val
        c, _ = jax.lax.scan(body, (gi_beat, tick_h0), jnp.arange(ITERS))
        return c[0].mean()

    results["dec_kernel_fwd_ms"] = (
        _time_chain(dec_fwd_chain, gi_beat, tick_h0) * 1e3)
    results["dec_kernel_fwdbwd_ms"] = (
        _time_chain(dec_fwdbwd_chain, gi_beat, tick_h0) * 1e3)

    # --- model-level components ----------------------------------------
    attrs = MusicAttributes(build_vocab(V))
    model = MeasureVAE(
        num_notes=V, note_embedding_dim=E, num_encoder_layers=2,
        encoder_hidden_size=H, latent_space_dim=LAT,
        num_decoder_layers=2, decoder_hidden_size=H,
    )
    optimizer = optax.adam(1e-4)
    reg_pairs = tuple((d, d) for d in range(4))
    score = jnp.zeros((B, MEASURE_SEQ_LEN), jnp.int32)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1),
         "dropout": jax.random.key(2)},
        score[:1], train=True,
    )["params"]
    opt_state = optimizer.init(params)

    def enc_loss(p, score, k):
        z_mean, z_log_std = model.apply(
            {"params": p}, score, train=True, method=model.encode,
            rngs={"dropout": jax.random.fold_in(k, 1)},
        )
        return kld_loss(z_mean, z_log_std, 0.001, 0.0) + z_mean.sum()

    def full_loss(p, score, k):
        out = model.apply({"params": p}, score, train=True, rng_key=k)
        loss = token_cross_entropy_loss(out.weights, score)
        loss += kld_loss(out.z_mean, out.z_log_std, 0.001, 0.0)
        labels = attrs.compute_labels(score)
        loss += total_reg_loss(out.z_tilde, labels, reg_pairs, 1.0, 10.0)
        return loss

    def make_step_chain(loss_fn):
        @jax.jit
        def run(params, opt_state, score, key):
            def body(st, k):
                p, o = st
                _, grads = jax.value_and_grad(loss_fn)(
                    p, score, jax.random.fold_in(key, k))
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), 0.0
            st, _ = jax.lax.scan(body, (params, opt_state),
                                 jnp.arange(ITERS))
            return jax.tree_util.tree_leaves(st[0])[0].mean()
        return run

    results["encode_step_ms"] = _time_chain(
        make_step_chain(enc_loss), params, opt_state, score, key) * 1e3
    results["full_step_ms"] = _time_chain(
        make_step_chain(full_loss), params, opt_state, score, key) * 1e3

    # --- glue: labels + reg + CE losses alone --------------------------
    out_weights = jax.random.normal(key, (B, MEASURE_SEQ_LEN, V))
    z = jax.random.normal(key, (B, LAT))

    @jax.jit
    def glue_chain(w, z):
        def body(c, _):
            w, z = c
            def loss(w, z):
                l = token_cross_entropy_loss(w, score)
                labels = attrs.compute_labels(score)
                l += total_reg_loss(z, labels, reg_pairs, 1.0, 10.0)
                return l
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(w, z)
            return (w + 1e-9 * grads[0], z + 1e-9 * grads[1]), val
        c, _ = jax.lax.scan(body, (w, z), jnp.arange(ITERS))
        return c[0].mean()

    results["glue_losses_ms"] = _time_chain(glue_chain, out_weights, z) * 1e3

    results["derived_decoder_path_ms"] = round(
        results["full_step_ms"] - results["encode_step_ms"], 4)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()
    global ITERS
    # two chain lengths; the slope cancels the (large, ~60 ms on this
    # tunneled transport) fixed per-dispatch cost that a single-length
    # measurement folds into every component equally
    ITERS = 64
    r64 = profile(args.batch)
    ITERS = 256
    r256 = profile(args.batch)
    res = {}
    for k in r64:
        if k.startswith("derived"):
            continue
        res[k] = (256 * r256[k] - 64 * r64[k]) / 192.0
    res["derived_decoder_path_ms"] = round(
        res["full_step_ms"] - res["encode_step_ms"], 4)
    res["fixed_dispatch_ms_estimate"] = round(
        64 * (r64["full_step_ms"] - res["full_step_ms"]), 2)
    print(json.dumps({k: round(v, 4) for k, v in res.items()}, indent=2))


if __name__ == "__main__":
    main()
