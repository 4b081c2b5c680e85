"""Fused Pallas GRU-chain kernels (whole T-step recurrence per kernel).

The GRUs in this framework are small (H = 128-512) over short
sequences (T = 24, the measure length — reference
``measurevae/encoder.py:27-34``, ``decoder.py:338-363``). Under XLA's
``lax.scan`` every time step lowers to its own fusion region, and the
per-region fixed cost dominates the tiny (B,H)@(H,3H) matmul ~3x
(measured: the 2-layer biGRU encoder fwd+bwd+adam runs 0.72 ms/step at
B=256, H=128 against a ~0.2 ms matmul floor — scripts/bench_measure_vae
ablations). These kernels run the WHOLE chain inside one
``pallas_call``: recurrent weights and the hidden state stay pinned in
VMEM across steps, the grid is the time axis, and Mosaic double-buffers
the streamed input projections.

Layout (directions batched on a leading axis; any time-flip for the
backward direction happens in the caller, ops/gru.py):

    gi   (T, D, B, 3H)  precomputed x @ w_ih + b_ih  (gates r,z,n)
    w_hh (D, H, 3H), b_hh (D, 3H), h0 (D, B, H)
    -> outs (T, D, B, H)     (h_final == outs[-1])

Gate math is torch-exact (``n = tanh(i_n + r*(h w_hn + b_hn))`` — the
b_hn term rides inside the reset gate, so b_hh cannot be folded into
gi).

Backward is a custom VJP: a second kernel walks the grid in reverse
(time index map ``T-1-k``), recomputes the gate activations from
(h_{t-1}, gi_t) instead of saving three gate tensors, accumulates
dW_hh / db_hh in VMEM scratch, and streams out dgi — the caller folds
dgi into its hoisted (B·T, I) input-projection matmuls and
``db_ih = sum(dgi)``.

Off-TPU the kernels run in interpret mode (tests on the CPU mesh);
callers fall back to the XLA scan for shapes the TPU tiling cannot take
(H not a multiple of 128 or B not a multiple of 8).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def env_int(name: str, default: int) -> int:
    """Integer ARVAE_* tuning knob; malformed values read as the default
    (the other ARVAE_* switches are truthiness-only and tolerate
    anything — a typo must not explode mid-trace)."""
    try:
        return int(os.environ.get(name, str(default)))
    except ValueError:
        return default


_VMEM_BUDGET_BYTES = 15 * 1024 * 1024


def supports_shapes(batch: int, hidden: int, n_dirs: int = 2) -> bool:
    """True when (B, H) satisfy the TPU tiling AND the backward pass's
    VMEM residents fit.

    The bwd kernel pins three (D, H, 3H) weight-sized buffers (w_hh +
    dw out + dw_scr → 9·D·H² floats, irreducible) plus the streamed
    per-step blocks (h_prev/gi/dout/dgi ≈ 8·D·B·H floats) and the
    dh0/dh_scr carry (2·D·B·H). Modeled single-buffered ≈
    D·(9H² + 11BH) floats against the 15 MB budget the sibling hier
    kernel calibrated with on-device OOM probes — the measured-working
    (H=128, B=1024, D=2) point models at 12.7 MB and sits inside;
    H=512 configs (19-30 MB) fall back to the XLA scan instead of
    crashing Mosaic. ``n_dirs`` defaults to the biGRU's 2 (the
    conservative case)."""
    if hidden % 128 != 0 or batch % 8 != 0:
        return False
    modeled = 4 * n_dirs * (9 * hidden * hidden + 11 * batch * hidden)
    return modeled < _VMEM_BUDGET_BYTES


def _gates(gi_d, gh_d):
    i_r, i_z, i_n = jnp.split(gi_d, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh_d, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return r, z, n, h_n


def _gru_bwd(dh, r, z, n, h_n, h_prev, w_hh):
    """Backward through one GRU cell given gates recomputed by
    :func:`_gates`. Returns (dgi (B,3H), dgh (B,3H), dh_prev (B,H)).
    The single copy of the torch-exact backward derivation — shared by
    this module's chain kernel and the hier tick-decoder kernel."""
    dn = dh * (1.0 - z)
    dz = dh * (h_prev - n)
    da_n = dn * (1.0 - n * n)
    dr = da_n * h_n
    dgh_n = da_n * r
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    dgi = jnp.concatenate([da_r, da_z, da_n], axis=-1)
    dgh = jnp.concatenate([da_r, da_z, dgh_n], axis=-1)
    dh_prev = dh * z + jax.lax.dot_general(
        dgh, w_hh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dgi, dgh, dh_prev


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(w_hh_ref, b_hh_ref, h0_ref, gi_ref, out_ref, h_scr, *,
                n_dirs: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    for d in range(n_dirs):
        h = h_scr[d]
        gh = (
            jnp.dot(h, w_hh_ref[d], preferred_element_type=jnp.float32)
            + b_hh_ref[d]
        )
        r, z, n, _ = _gates(gi_ref[0, d], gh)
        h_new = (1.0 - z) * n + z * h
        h_scr[d] = h_new
        out_ref[0, d] = h_new


def _fwd_value(gi, w_hh, b_hh, h0):
    T, D, B, H3 = gi.shape
    H = H3 // 3
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_dirs=D),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((D, H, H3), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H3), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H3), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, B, H), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, B, H), jnp.float32)],
        interpret=_interpret(),
    )(w_hh, b_hh, h0, gi)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(w_hh_ref, b_hh_ref, h0_ref, houts_ref, gi_ref, dout_ref,
                dgi_ref, dh0_ref, dw_ref, db_ref,
                dh_scr, dw_scr, db_scr, *, n_dirs: int):
    k = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    for d in range(n_dirs):
        # h_{t-1}: the outs block at t-1 (clamped index map; garbage at
        # t == 0, where h0 takes over) — no (T,D,B,H) concat copy in HBM
        h_prev = jnp.where(k == T - 1, h0_ref[d], houts_ref[0, d])  # (B, H)
        gh = (
            jnp.dot(h_prev, w_hh_ref[d], preferred_element_type=jnp.float32)
            + b_hh_ref[d]
        )
        r, z, n, h_n = _gates(gi_ref[0, d], gh)

        dh = dout_ref[0, d] + dh_scr[d]
        # dgi/dgh (B, 3H); dh_{t-1} = z*dh + dgh @ w_hh^T
        dgi, dgh, dh_prev_grad = _gru_bwd(dh, r, z, n, h_n, h_prev,
                                          w_hh_ref[d])
        dgi_ref[0, d] = dgi
        dh_scr[d] = dh_prev_grad
        # dW_hh += h_{t-1}^T @ dgh ; db_hh += sum_B dgh
        dw_scr[d] += jax.lax.dot_general(
            h_prev, dgh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_scr[d] += jnp.sum(dgh, axis=0)

    @pl.when(k == T - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


def _bwd_value(gi, w_hh, b_hh, h0, outs, douts):
    T, D, B, H3 = gi.shape
    H = H3 // 3
    rev = lambda k: (T - 1 - k, 0, 0, 0)  # noqa: E731
    # outs block at t-1, clamped at t == 0 (h0 overrides there in-kernel)
    revm = lambda k: (jnp.maximum(T - 2 - k, 0), 0, 0, 0)  # noqa: E731
    dgi, dh0, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, n_dirs=D),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((D, H, H3), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H3), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), revm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, D, B, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, H3), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H3), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, D, B, H3), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, H, H3), jnp.float32),
            jax.ShapeDtypeStruct((D, H3), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, H, H3), jnp.float32),
            pltpu.VMEM((D, H3), jnp.float32),
        ],
        interpret=_interpret(),
    )(w_hh, b_hh, h0, outs, gi, douts)
    return dgi, dh0, dw, db


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def gru_chain(gi: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
              h0: jax.Array) -> jax.Array:
    """Runs the full T-step GRU recurrence. Returns outs (T, D, B, H);
    the final hidden state is ``outs[-1]``."""
    return _fwd_value(gi, w_hh, b_hh, h0)


def _vjp_fwd(gi, w_hh, b_hh, h0):
    outs = _fwd_value(gi, w_hh, b_hh, h0)
    return outs, (gi, w_hh, b_hh, h0, outs)


def _vjp_bwd(res, douts):
    gi, w_hh, b_hh, h0, outs = res
    dgi, dh0, dw, db = _bwd_value(gi, w_hh, b_hh, h0, outs, douts)
    return dgi, dw, db, dh0


gru_chain.defvjp(_vjp_fwd, _vjp_bwd)


def gru_chain_reference(gi, w_hh, b_hh, h0) -> jax.Array:
    """XLA-scan reference implementation (same layout) — the fallback
    path for unaligned shapes and the golden model for kernel tests."""

    def step(h, gi_t):
        gh = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None, :]
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, outs = jax.lax.scan(step, h0, gi)
    return outs
