"""Fused Pallas TPU kernel for the AR pairwise regularization loss.

The reference computes, per regularized latent dim r (a (B,) column z
and a (B,) attribute column a):

    loss_r = mean_{i,j} | tanh(delta * (z_i - z_j)) - sign(a_i - a_j) |

by materializing two B²-element matrices in HBM
(``utils/trainer.py:389-401`` of ashispati/ar-vae). Here the whole
pairwise block — outer differences, tanh, sign, L1, and the reduction —
is fused into VMEM: the (R, B) columns are a few hundred KB even at
B = 128k, so they live entirely on-chip; each grid step owns one
(r, i-tile) row block and walks the j-tiles with an inner
``fori_loop``, forming (TILE_I, TILE_J) pair tiles in registers and
accumulating. HBM traffic is O(R·B) instead of O(R·B²), and the grid
stays O(R·B/TILE_I) so per-step launch overhead never dominates.

The backward pass exploits the antisymmetry of the pair gradient: with
``t = tanh(delta * (z_i - z_j))`` and ``s = sign(a_i - a_j)``, the
contribution ``g_ij = sign(t_ij - s_ij)(1 - t_ij²) * delta`` satisfies
``g_ji = -g_ij`` (t and s are both odd under i↔j), so

    dL/dz_i = 1/B² * [ sum_j g_ij - sum_k g_ki ] = 2/B² * sum_j g_ij

— a single row-sum pass, same tiling as the forward (custom VJP; the
attribute column gets no gradient — ``sign`` is flat a.e., matching
torch autograd through ``torch.sign`` in the reference). ``delta``
gets its true gradient ``1/B² · Σ sign(t-s)(1-t²)·dz`` (symmetric
under i↔j), accumulated in the same backward pass, so the kernel stays
a drop-in for the XLA path under any differentiation.

Stacked over R regularized dims: inputs (R, B) → per-dim losses (R,).
Runs in interpret mode off-TPU so tests pass on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one copy of the run-interpreted-off-TPU routing invariant, shared by
# all three kernel modules
from arvae_tpu.ops.gru_pallas import _interpret

_LANE = 128
# Pair-block tile: the (TILE_I, TILE_J) f32 tile of pair contributions
# is 1 MB, so the handful of live temporaries (t, s, mask, |t-s|) stay
# well inside VMEM at any batch size.
_TILE_I = 512
_TILE_J = 512


def _pad_to(x: jax.Array, m: int) -> jax.Array:
    b = x.shape[-1]
    pad = (-b) % m
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def _pair_tile(z, a, z_t, a_t, delta):
    """t, s for one (TILE_I, TILE_J) pair block."""
    t = jnp.tanh(delta * (z - z_t))
    s = jnp.sign(a - a_t)
    return t, s


def _tile_mask(i0, j0, tile_i, tile_j, b_real):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0) + i0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1) + j0
    return jnp.logical_and(row_ids < b_real, col_ids < b_real)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(delta_ref, z_ref, a_ref, out_ref, *,
                b_real: int, tile_i: int, tile_j: int, nj: int):
    r = pl.program_id(0)
    i = pl.program_id(1)
    delta = delta_ref[0]

    z = z_ref[r, pl.ds(i * tile_i, tile_i)].reshape(tile_i, 1)
    a = a_ref[r, pl.ds(i * tile_i, tile_i)].reshape(tile_i, 1)

    def body(j, acc):
        z_t = z_ref[r, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)
        a_t = a_ref[r, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)
        t, s = _pair_tile(z, a, z_t, a_t, delta)
        mask = _tile_mask(i * tile_i, j * tile_j, tile_i, tile_j, b_real)
        return acc + jnp.sum(jnp.where(mask, jnp.abs(t - s), 0.0))

    partial = jax.lax.fori_loop(0, nj, body, jnp.float32(0.0))

    @pl.when(i == 0)
    def _():
        out_ref[r, 0] = 0.0

    out_ref[r, 0] += partial


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(delta_ref, z_ref, a_ref, dz_ref, dd_ref, *,
                b_real: int, tile_i: int, tile_j: int, nj: int):
    r = pl.program_id(0)
    i = pl.program_id(1)
    delta = delta_ref[0]

    z = z_ref[r, pl.ds(i * tile_i, tile_i)].reshape(tile_i, 1)
    a = a_ref[r, pl.ds(i * tile_i, tile_i)].reshape(tile_i, 1)

    def body(j, carry):
        acc, acc_d = carry
        z_t = z_ref[r, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)
        a_t = a_ref[r, pl.ds(j * tile_j, tile_j)].reshape(1, tile_j)
        t, s = _pair_tile(z, a, z_t, a_t, delta)
        mask = _tile_mask(i * tile_i, j * tile_j, tile_i, tile_j, b_real)
        core = jnp.sign(t - s) * (1.0 - t * t)
        g = jnp.where(mask, core * delta, 0.0)
        # dL/ddelta integrand: same core times dz instead of delta
        g_d = jnp.where(mask, core * (z - z_t), 0.0)
        return acc + jnp.sum(g, axis=1), acc_d + jnp.sum(g_d)

    row_sums, d_sum = jax.lax.fori_loop(
        0, nj, body,
        (jnp.zeros((tile_i,), jnp.float32), jnp.float32(0.0)),
    )
    # antisymmetry g_ji = -g_ij folds the column pass into the row pass
    dz_ref[r, pl.ds(i * tile_i, tile_i)] = 2.0 * row_sums

    @pl.when(i == 0)
    def _():
        dd_ref[r, 0] = 0.0

    dd_ref[r, 0] += d_sum


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def fused_reg_loss(z_cols: jax.Array, a_cols: jax.Array, delta) -> jax.Array:
    """Per-dim AR reg losses. z_cols, a_cols: (R, B) → (R,) float32.

    Casts to float32 OUTSIDE the custom VJP so integer attribute labels
    (which the XLA path accepts — ``attribute_reg_loss`` casts
    internally) get their symbolic-zero cotangent handled by JAX's
    convert_element_type rule instead of tripping custom_vjp's float0
    requirement."""
    return _fused_reg_loss(
        z_cols.astype(jnp.float32),
        a_cols.astype(jnp.float32),
        jnp.asarray(delta, jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_reg_loss(z_cols: jax.Array, a_cols: jax.Array,
                    delta: jax.Array) -> jax.Array:
    return _fwd_value(z_cols, a_cols, delta)


def _call_kernel(kernel, z_cols, a_cols, delta, out_full_row: bool):
    r, b = z_cols.shape
    # Pad the batch so the padded width is a whole number of tiles
    # (_TILE_I == _TILE_J, so one pad unit serves both tilings).
    pad_unit = _LANE if b <= _TILE_J else _TILE_J
    zp = _pad_to(z_cols.astype(jnp.float32), pad_unit)
    ap = _pad_to(a_cols.astype(jnp.float32), pad_unit)
    bp = zp.shape[1]
    tile_i = min(_TILE_I, bp)
    tile_j = min(_TILE_J, bp)
    ni = bp // tile_i
    nj = bp // tile_j
    delta_arr = jnp.full((1,), delta, jnp.float32)

    # Whole (R, Bp) arrays live in VMEM/SMEM (a few hundred KB at most);
    # rows are selected by program_id inside the kernel, which sidesteps
    # the (8, 128) block-tiling constraint for row blocks with R not a
    # multiple of 8.
    if out_full_row:
        # backward: (dz rows, per-dim ddelta accumulator)
        out_shape = (
            jax.ShapeDtypeStruct((r, bp), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        )
        out_spec = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((r, 1), jnp.float32)
        out_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    return pl.pallas_call(
        functools.partial(
            kernel, b_real=b, tile_i=tile_i, tile_j=tile_j, nj=nj
        ),
        grid=(r, ni),
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
    return sums[:, 0] * (1.0 / (float(b) * float(b)))


def _fwd(z_cols, a_cols, delta):
    return _fwd_value(z_cols, a_cols, delta), (z_cols, a_cols, delta)


def _bwd(residuals, ct):
    z_cols, a_cols, delta = residuals
    b = z_cols.shape[1]
    inv_b2 = 1.0 / (float(b) * float(b))
    raw, dd = _call_kernel(_bwd_kernel, z_cols, a_cols, delta,
                           out_full_row=True)
    dz = raw[:, : z_cols.shape[1]] * (ct[:, None] * inv_b2)
    ddelta = jnp.sum(ct * dd[:, 0]) * inv_b2
    return (
        dz.astype(z_cols.dtype),
        jnp.zeros_like(a_cols),
        ddelta.reshape(()).astype(jnp.float32),
    )


_fused_reg_loss.defvjp(_fwd, _bwd)
