"""AR reg-loss microbenchmark: XLA fusion vs the Pallas VMEM kernel.

Times value_and_grad of the R-dim pairwise regularization loss
(reference ``utils/trainer.py:389-401``) at large batch sizes — the
regime the Pallas kernel (ops/reg_pallas.py) exists for. Results land
in docs/design.md §2.

Usage: python scripts/bench_reg_loss.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 5
SIZES = (1024, 4096, 8192, 16384, 32768, 65536)
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp

    from arvae_tpu.ops.losses import attribute_reg_loss
    from arvae_tpu.ops.reg_pallas import fused_reg_loss

    def xla_loss(z, a):
        per = jax.vmap(attribute_reg_loss, in_axes=(0, 0, None))(z, a, 1.0)
        return jnp.sum(per)

    def pallas_loss(z, a):
        return jnp.sum(fused_reg_loss(z, a, 1.0))

    vg_xla = jax.jit(jax.value_and_grad(xla_loss))
    vg_pallas = jax.jit(jax.value_and_grad(pallas_loss))

    def time_fn(fn, z, a):
        v, g = fn(z, a)  # compile
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v, g = fn(z, a)
        float(v)
        jax.block_until_ready(g)
        return (time.perf_counter() - t0) / ITERS * 1e6  # us

    rows = []
    rng = np.random.RandomState(0)
    for b in SIZES:
        z = jnp.asarray(rng.randn(R, b), jnp.float32)
        a = jnp.asarray(rng.randn(R, b), jnp.float32)
        try:
            us_x = time_fn(vg_xla, z, a)
        except Exception as e:
            us_x = float("nan")
            print(f"# XLA failed at B={b}: {type(e).__name__}", file=sys.stderr)
        try:
            us_p = time_fn(vg_pallas, z, a)
        except Exception as e:
            us_p = float("nan")
            print(f"# Pallas failed at B={b}: {type(e).__name__}",
                  file=sys.stderr)
        # numeric agreement at this size
        try:
            vx = float(vg_xla(z, a)[0])
            vp = float(vg_pallas(z, a)[0])
            agree = abs(vx - vp) / max(abs(vx), 1e-9) < 1e-4
        except Exception:
            agree = False
        rows.append({"B": b, "xla_us": round(us_x, 1),
                     "pallas_us": round(us_p, 1), "values_agree": agree})
        print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
