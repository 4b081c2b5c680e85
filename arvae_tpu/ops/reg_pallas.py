"""Fused Pallas TPU kernel for the AR pairwise regularization loss.

The reference computes, per regularized latent dim r (a (B,) column z
and a (B,) attribute column a):

    loss_r = mean_{i,j} | tanh(delta * (z_i - z_j)) - sign(a_i - a_j) |

by materializing two B²-element matrices in HBM
(``utils/trainer.py:389-401`` of ashispati/ar-vae). Here the whole
pairwise block — outer differences, tanh, sign, L1, and the reduction —
is fused into VMEM: each grid step loads two (B,) rows (a few KB),
forms a (B, TILE_J) tile of pair contributions in registers, and
accumulates a scalar. HBM traffic is O(R·B) instead of O(R·B²).

The backward pass is its own kernel (custom VJP): with
``t = tanh(delta * (z_i - z_j))`` and ``s = sign(a_i - a_j)``,

    dL/dz_i = delta/B² * sum_j [ sign(t_ij - s_ij) (1 - t_ij²)
                               - sign(t_ji - s_ji) (1 - t_ji²) ]

(the attribute column gets no gradient — ``sign`` is flat a.e., matching
torch autograd through ``torch.sign`` in the reference).

Stacked over R regularized dims: inputs (R, B) → per-dim losses (R,).
Runs in interpret mode off-TPU so tests pass on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Column tile: bounds the (B, TILE_J) in-register pair block. 512 keeps
# the f32 tile under 2 MB of VMEM even at B = 1024.
_TILE_J = 512


def _pad_to(x: jax.Array, m: int) -> jax.Array:
    b = x.shape[-1]
    pad = (-b) % m
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(delta_ref, z_ref, a_ref, out_ref, *, b_real: int, tile_j: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    delta = delta_ref[0]
    bp = z_ref.shape[1]

    z = z_ref[i, :].reshape(bp, 1)
    a = a_ref[i, :].reshape(bp, 1)
    z_t = z_ref[i, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)
    a_t = a_ref[i, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)

    t = jnp.tanh(delta * (z - z_t))
    s = jnp.sign(a - a_t)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bp, tile_j), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bp, tile_j), 1) + j * tile_j
    mask = jnp.logical_and(row_ids < b_real, col_ids < b_real)

    partial = jnp.sum(jnp.where(mask, jnp.abs(t - s), 0.0))

    @pl.when(j == 0)
    def _():
        out_ref[i, 0] = 0.0

    out_ref[i, 0] += partial


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(delta_ref, z_ref, a_ref, dz_ref, *, b_real: int, tile_j: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    delta = delta_ref[0]
    bp = z_ref.shape[1]

    z = z_ref[i, :].reshape(bp, 1)
    a = a_ref[i, :].reshape(bp, 1)
    z_t = z_ref[i, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)
    a_t = a_ref[i, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)

    t = jnp.tanh(delta * (z - z_t))
    s = jnp.sign(a - a_t)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bp, tile_j), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bp, tile_j), 1) + j * tile_j
    mask = jnp.logical_and(row_ids < b_real, col_ids < b_real)
    # g_ij for rows i in [0, bp), cols j in this tile.
    g = jnp.where(mask, jnp.sign(t - s) * (1.0 - t * t) * delta, 0.0)

    @pl.when(j == 0)
    def _():
        dz_ref[i, :] = jnp.zeros((bp,), jnp.float32)

    # dL/dz_i += sum over this column tile of g_ij  (rows: all i)
    dz_ref[i, :] += jnp.sum(g, axis=1)
    # dL/dz_j -= sum over all rows of g_ij          (cols: this tile)
    dz_ref[i, pl.ds(j * tile_j, tile_j)] += -jnp.sum(g, axis=0)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_reg_loss(z_cols: jax.Array, a_cols: jax.Array, delta) -> jax.Array:
    """Per-dim AR reg losses. z_cols, a_cols: (R, B) → (R,) float32."""
    return _fwd_value(z_cols, a_cols, delta)


def _call_kernel(kernel, z_cols, a_cols, delta, out_full_row: bool):
    r, b = z_cols.shape
    # Pad the batch so the padded width is a whole number of column tiles.
    pad_unit = _LANE if b <= _TILE_J else _TILE_J
    zp = _pad_to(z_cols.astype(jnp.float32), pad_unit)
    ap = _pad_to(a_cols.astype(jnp.float32), pad_unit)
    bp = zp.shape[1]
    tile_j = min(_TILE_J, bp)
    nj = bp // tile_j
    delta_arr = jnp.full((1,), delta, jnp.float32)

    # Whole (R, Bp) arrays live in VMEM/SMEM (a few KB); rows are
    # selected by program_id inside the kernel, which sidesteps the
    # (8, 128) block-tiling constraint for row blocks with R not a
    # multiple of 8.
    if out_full_row:
        out_shape = jax.ShapeDtypeStruct((r, bp), jnp.float32)
        out_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((r, 1), jnp.float32)
        out_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    return pl.pallas_call(
        functools.partial(kernel, b_real=b, tile_j=tile_j),
        grid=(r, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(delta_arr, zp, ap)


def _fwd_value(z_cols, a_cols, delta):
    b = z_cols.shape[1]
    sums = _call_kernel(_fwd_kernel, z_cols, a_cols, delta, out_full_row=False)
    return sums[:, 0] / (b * b)


def _fwd(z_cols, a_cols, delta):
    return _fwd_value(z_cols, a_cols, delta), (z_cols, a_cols, delta)


def _bwd(residuals, ct):
    z_cols, a_cols, delta = residuals
    b = z_cols.shape[1]
    raw = _call_kernel(_bwd_kernel, z_cols, a_cols, delta, out_full_row=True)
    dz = raw[:, : z_cols.shape[1]] * (ct[:, None] / (b * b))
    return dz.astype(z_cols.dtype), jnp.zeros_like(a_cols), jnp.zeros(())


fused_reg_loss.defvjp(_fwd, _bwd)
