"""Real-TPU validation of the fused tick-decoder kernel.

1. Golden: fused hier_tick_chain values + all grads vs the XLA-scan
   reference path at the protocol shape (B=256), teacher-forcing on
   (sampled-feedback paths are PRNG-stream-divergent by design).
2. Ceiling: walk B up (512, 1024, 2048, 4096) and report which batch
   sizes compile + run fused — calibrates the `supports` VMEM guard
   after the per-beat streaming change.

Usage: python scripts/check_hier_kernel_tpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, H, E, V = 24, 128, 10, 130


def make_args(B, key):
    import jax
    import jax.numpy as jnp

    kk = jax.random.split(key, 16)
    return dict(
        score=jax.random.randint(kk[8], (T, B), 0, V, dtype=jnp.int32),
        gi_beat=jax.random.normal(kk[0], (4, B, 3 * H)),
        tick_h0=jax.random.normal(kk[1], (4, 2, B, H)) * 0.1,
        x0=jax.random.normal(kk[9], (B, E)) * 0.1,
        emb=jax.random.normal(kk[2], (V, E)) * 0.1,
        w_ih0e=jax.random.normal(kk[3], (E, 3 * H)) * 0.1,
        w_hh0=jax.random.normal(kk[4], (H, 3 * H)) * 0.05,
        b_hh0=jax.random.normal(kk[10], (3 * H,)) * 0.01,
        w_ih1=jax.random.normal(kk[5], (H, 3 * H)) * 0.05,
        b_ih1=jax.random.normal(kk[11], (3 * H,)) * 0.01,
        w_hh1=jax.random.normal(kk[6], (H, 3 * H)) * 0.05,
        b_hh1=jax.random.normal(kk[12], (3 * H,)) * 0.01,
        out_w=jax.random.normal(kk[7], (H, V)) * 0.1,
        out_b=jax.random.normal(kk[13], (V,)) * 0.01,
    )


def scan_reference(a):
    """XLA reference of the fused loop (teacher forcing, no dropout)."""
    import jax
    import jax.numpy as jnp

    def step(carry, t):
        h0, h1, prev_emb = carry
        ib = t // 6
        reset = (t % 6) == 0
        h0 = jnp.where(reset, a["tick_h0"][ib, 0], h0)
        h1 = jnp.where(reset, a["tick_h0"][ib, 1], h1)
        gi0 = prev_emb @ a["w_ih0e"] + a["gi_beat"][ib]
        gh0 = h0 @ a["w_hh0"] + a["b_hh0"]

        def gru(gi, gh, h):
            i_r, i_z, i_n = jnp.split(gi, 3, -1)
            h_r, h_z, h_n = jnp.split(gh, 3, -1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            return (1 - z) * n + z * h

        h0n = gru(gi0, gh0, h0)
        gi1 = h0n @ a["w_ih1"] + a["b_ih1"]
        gh1 = h1 @ a["w_hh1"] + a["b_hh1"]
        h1n = gru(gi1, gh1, h1)
        logits = jnp.maximum(h1n @ a["out_w"] + a["out_b"], 0.0)
        tok = a["score"][t]
        onehot = jax.nn.one_hot(tok, V, dtype=jnp.float32)
        return (h0n, h1n, onehot @ a["emb"]), logits

    B = a["x0"].shape[0]
    (h0, h1, _), weights = jax.lax.scan(
        step,
        (jnp.zeros((B, H)), jnp.zeros((B, H)), a["x0"]),
        jnp.arange(T),
    )
    return weights


DIFF_KEYS = ["gi_beat", "tick_h0", "x0", "emb", "w_ih0e", "w_hh0", "b_hh0",
             "w_ih1", "b_ih1", "w_hh1", "b_hh1", "out_w", "out_b"]


def fused_weights(a):
    from arvae_tpu.ops.hier_decoder_pallas import hier_tick_chain
    import jax.numpy as jnp

    w, _ = hier_tick_chain(
        T, True, 0.0, 6, "argmax",
        jnp.asarray(1, jnp.int32), jnp.asarray(7, jnp.int32),
        a["score"], *[a[k] for k in DIFF_KEYS],
    )
    return w


def golden(B=256):
    import jax

    a = make_args(B, jax.random.key(0))

    def loss_fused(diff):
        aa = dict(a, **diff)
        return (fused_weights(aa) * cot).sum()

    def loss_scan(diff):
        aa = dict(a, **diff)
        return (scan_reference(aa) * cot).sum()

    cot = jax.random.normal(jax.random.key(1), (T, B, V))
    diff = {k: a[k] for k in DIFF_KEYS}
    wf = jax.jit(lambda d: fused_weights(dict(a, **d)))(diff)
    ws = jax.jit(lambda d: scan_reference(dict(a, **d)))(diff)
    err_w = float(np.max(np.abs(np.asarray(wf) - np.asarray(ws))))

    gf = jax.jit(jax.grad(loss_fused))(diff)
    gs = jax.jit(jax.grad(loss_scan))(diff)
    errs = {}
    for k in DIFF_KEYS:
        denom = max(1e-6, float(np.max(np.abs(np.asarray(gs[k])))))
        errs[k] = float(
            np.max(np.abs(np.asarray(gf[k]) - np.asarray(gs[k])))) / denom
    print(f"B={B} golden: max |w_fused - w_scan| = {err_w:.3e}")
    worst = max(errs, key=errs.get)
    print(f"  grad rel-err worst: {worst} {errs[worst]:.3e}; "
          f"all: {' '.join(f'{k}={v:.1e}' for k, v in errs.items())}")
    assert err_w < 1e-4 and errs[worst] < 1e-3, "GOLDEN MISMATCH"
    print("  OK")


def ceiling():
    import jax

    for B in (256, 512, 1024, 2048, 4096):
        a = make_args(B, jax.random.key(2))
        diff = {k: a[k] for k in DIFF_KEYS}
        # jit caches on the wrapper object: build ONE jitted callable
        # and reuse it, otherwise the second call re-traces and the
        # "steady" number measures a cache-load, not the step
        step = jax.jit(jax.grad(lambda d: fused_weights(dict(a, **d)).sum()))
        try:
            t0 = time.perf_counter()
            g = step(diff)
            jax.block_until_ready(g)
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            g = step(diff)
            float(np.asarray(g["out_b"])[0])
            dt2 = time.perf_counter() - t0
            print(f"B={B}: fused fwd+bwd OK (compile+run {dt:.1f}s, "
                  f"steady-dispatch {dt2*1e3:.1f}ms incl. sync RTT)")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"B={B}: FAILED — {msg}")


if __name__ == "__main__":
    golden(256)
    ceiling()
