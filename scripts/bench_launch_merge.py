"""Measure the launch-merge win available from fusing the encoder's
two GRU chain-kernel launches into one (VERDICT r3 item 9).

Round-3 attribution: the music step's ~0.4 ms above its component
floors is composition across ~6 Pallas launches + XLA boundaries
(docs/design.md). The candidate fix is a single kernel running both
encoder layers; its backward would need two ~6.3 MB sequence residents
(saved layer-0 outputs + their grad accumulator) plus weight-grad
buffers in VMEM — over the 15 MB budget at B=256/H=128 — so the real
design would be fwd-fused + two bwd kernels, saving ONE launch.

This benchmark measures exactly that prize, on the encoder's true
shapes, without shipping the complex kernel: it times

  (a) two dependent T-step gru_chain launches with the real inter-layer
      XLA work (dropout-free concat + (B·T, 2H)@(2H, 3H) projection)
      between them — the encoder's actual composition, and
  (b) ONE 2T-step gru_chain launch doing the same recurrent FLOPs
      (the launch+boundary-free lower bound for the same chain length).

delta = (a) - (b) per step is the ceiling on what any launch-merge can
save forward; double it for fwd+bwd. If that is ≲0.05 ms (the round-3
bound), the fused-encoder kernel is rejected with numbers.

Run on the real TPU: python scripts/bench_launch_merge.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arvae_tpu.ops.gru_pallas import gru_chain  # noqa: E402

T, D, H = 24, 2, 128
B = int(os.environ.get("MERGE_BENCH_B", "256"))
ITERS = int(os.environ.get("MERGE_BENCH_ITERS", "300"))


def main():
    rng = np.random.RandomState(0)
    gi = jnp.asarray(rng.randn(T, D, B, 3 * H).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.randn(D, H, 3 * H).astype(np.float32) * 0.05)
    b_hh = jnp.zeros((D, 3 * H), jnp.float32)
    h0 = jnp.zeros((D, B, H), jnp.float32)
    # layer-1 input projection (the XLA work between the two launches)
    w_ih1 = jnp.asarray(rng.randn(2 * H, 3 * H).astype(np.float32) * 0.05)

    def two_launches(gi, w_hh, b_hh, h0, w_ih1):
        out0 = gru_chain(gi, w_hh, b_hh, h0)           # (T, D, B, H)
        x = jnp.concatenate([out0[:, 0], jnp.flip(out0[:, 1], 0)], -1)
        gi1 = x @ w_ih1                                 # (T, B, 3H)
        gi1 = jnp.stack([gi1, jnp.flip(gi1, 0)], 1)     # (T, D, B, 3H)
        return gru_chain(gi1, w_hh, b_hh, h0)[-1]

    def one_launch(gi2, w_hh, b_hh, h0):
        # same 2T recurrent steps, zero intermediate launches
        return gru_chain(gi2, w_hh, b_hh, h0)[-1]

    gi2 = jnp.concatenate([gi, gi], 0)

    def timed(fn, args, iters=ITERS):
        # pipelined dispatch (the steady-state regime the train loop
        # runs in); value-pull sync at the end — on this tunneled
        # transport block_until_ready returns before the queue drains
        f = jax.jit(fn)
        out = f(*args)
        float(out.sum())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(out.sum())
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    a = timed(two_launches, (gi, w_hh, b_hh, h0, w_ih1))
    b = timed(one_launch, (gi2, w_hh, b_hh, h0))
    print(json.dumps({
        "two_launches_ms": round(a, 4),
        "one_double_launch_ms": round(b, 4),
        "merge_ceiling_ms_fwd": round(a - b, 4),
        "merge_ceiling_ms_fwd_bwd_est": round(2 * (a - b), 4),
        "shapes": f"T={T} D={D} B={B} H={H}",
    }))


if __name__ == "__main__":
    main()
