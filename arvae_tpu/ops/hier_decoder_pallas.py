"""Fused Pallas kernel for the sampled-feedback tick-decoder loop.

The reference's hottest loop (``measurevae/decoder.py:469-525``) — T=24
sequential steps of [2-layer tick GRU → ReLU head → argmax → re-embed
own sample], with per-beat hidden resets — runs here as ONE
``pallas_call``: the grid is the time axis, every weight (GRU stacks,
embedding table, output head, per-beat inits) stays pinned in VMEM for
the whole measure, the recurrent state (hidden states + fed-token
embedding) is carried across grid steps in VMEM scratch, and the
per-step tensors (logits, samples, saved hiddens) stream block by
block, and the per-beat conditioning (``gi_beat``/``tick_h0`` and their
grad accumulators) streams per beat via block index maps — so VMEM
usage is O(B·(V+H) + H²) independent of T. At the folk protocol scale
(H=128, V=130) batches up to 1024 stay fused in one call (measured on
v5e; B=2048 exceeds VMEM — see ``supports``) and larger batches run the
kernel over independent batch slices (``fused_slices``, wired up in
models/measure_vae._fused_tick_chain); larger hidden sizes are bounded by
the pinned 9H² weight+grad residents. The embedding lookup of the sampled
token is a one-hot (B,V)@(V,E) matmul — an MXU gather; argmax is
max+iota-min (``jnp.argmax`` fails this backend's Mosaic remote
compile).

Semantics match the XLA-scan path in models/measure_vae.py exactly for
``sampling='argmax'`` with dropout off; with dropout on, masks come
from the TPU PRNG (seeded per step, replayed bit-exactly in the
backward) — a different stream than ``jax.random`` but the same
distribution.

Backward is a custom VJP walking the grid in reverse (time index map
``T-1-k``): gate activations, dropout masks, and the ReLU mask are
recomputed from the streamed saved hidden states; gradients for all 13
differentiable operands accumulate in VMEM scratch and are written out
on the final grid step, with reset boundaries routing hidden grads to
the per-beat inits. Feedback tokens carry no gradient
(``stop_gradient`` on the sampled indices, matching the reference's
``.detach()``), but the embedding table does, through the one-hot
matmuls.

Layer count is fixed at 2 (the reference default); callers fall back to
the XLA scan otherwise or off-TPU. Multinomial sampling IS fused
(Gumbel-max over the logits via the on-chip PRNG — a different stream
than the XLA path's categorical, see the sampling note below). The
same kernel drives ``SRDecoder`` with ``ticks_per_beat == T`` (one
all-zero init at t=0, the z conditioning as the single "beat" row).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# torch-exact gate math (fwd AND bwd), the backend check, the VMEM
# budget, and the env-knob parser are shared with the GRU chain kernel
# — one copy of each invariant
from arvae_tpu.ops.gru_pallas import _VMEM_BUDGET_BYTES
from arvae_tpu.ops.gru_pallas import _gates as _gru_gates
from arvae_tpu.ops.gru_pallas import _gru_bwd, _interpret, env_int


def supports(batch: int, hidden: int, num_layers: int, num_notes: int,
             seq_len: int, sampling: str) -> bool:
    """TPU tiling + VMEM budget guard for the fused decoder."""
    if num_layers != 2 or sampling not in ("argmax", "multinomial"):
        return False
    if hidden % 128 != 0 or batch % 8 != 0:
        return False
    # VMEM residents, independent of seq_len (the per-beat conditioning
    # and its grad accumulators stream block-by-block since round 3):
    # per-row ~4V (logit/one-hot blocks) + ~16H (states, carries, the
    # current beat's gi/tick blocks + accumulators, gate temporaries),
    # plus the pinned weights AND their in-VMEM grad accumulators,
    # ~2*(9H^2 + H*V). Calibrated on TPU v5e (V=130): fused fwd+bwd
    # runs at (B=1024, H=128) ~11.8 MB and (B=512, H=256) ~14.5 MB by
    # this model, OOMs at (B=2048, H=128) ~21.5 MB and any batch of
    # H=512 ~28+ MB (the 9H^2 terms alone blow the budget).
    vmem = 4 * (
        batch * (4 * num_notes + 16 * hidden)
        + 2 * (9 * hidden * hidden + hidden * num_notes)
    )
    return vmem < _VMEM_BUDGET_BYTES


def _slice_cap() -> int:
    """ARVAE_FUSED_MAX_BATCH: cap on the per-slice batch (measurement
    knob for the sliced fused path). Malformed values read as unset."""
    return env_int("ARVAE_FUSED_MAX_BATCH", 0)


def fused_slices(batch: int, hidden: int, num_layers: int, num_notes: int,
                 seq_len: int, sampling: str) -> int:
    """Number of equal batch slices the fused kernel should run over.

    1 means the whole batch fits the VMEM guard directly. For larger
    batches the rows are independent, so the caller can run the kernel
    sequentially over ``s`` slices of ``batch // s`` rows each — still
    ~2.3× the XLA-scan fallback at B=2048 (measured v5e) because each
    slice keeps the whole feedback loop fused. Returns 0 if no
    power-of-two slicing reaches a supported slice shape (then the
    caller must fall back to the scan). ``ARVAE_FUSED_MAX_BATCH`` caps
    the slice size (measurement knob; policy lives here so ``supports``
    stays a pure hardware-capability predicate)."""
    cap = _slice_cap()
    s = 1
    while batch % s == 0 and batch // s >= 8:
        if (not (cap and batch // s > cap)) and supports(
                batch // s, hidden, num_layers, num_notes, seq_len,
                sampling):
            return s
        s *= 2
    return 0


def enabled(batch: int, hidden: int, num_layers: int, num_notes: int,
            seq_len: int, sampling: str) -> bool:
    """Route the tick loop through the fused kernel (possibly batch-
    sliced — see ``fused_slices``)? Same env switches as the GRU chain
    kernel (ops/gru.py)."""
    if os.environ.get("ARVAE_NO_GRU_PALLAS"):
        return False
    if not fused_slices(batch, hidden, num_layers, num_notes, seq_len,
                        sampling):
        return False
    if os.environ.get("ARVAE_FORCE_GRU_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def _uniform01(seed, t, shape, salt: int):
    """Deterministic per-(seed, t, salt) uniforms in (0, 1) — replayable
    bit-exactly in the backward pass. The TPU PRNG has no interpret-mode
    lowering, so off-TPU the same contract comes from jax.random."""
    if _interpret():
        key = jax.random.key(seed * 131071 + t * 7919 + salt)
        u = jax.random.uniform(key, shape)
    else:
        pltpu.prng_seed(seed + t * 7919 + salt)
        # prng_random_bits yields SIGNED int32; shift as uint32 (an
        # arithmetic shift would sign-extend and u would land in
        # (-.5, .5)), then bitcast back — Mosaic cannot cast uint32 to
        # float directly, but the top-24-bit value fits int32 exactly
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 8
        u = pltpu.bitcast(bits, jnp.int32).astype(jnp.float32) * (
            1.0 / 16777216.0)
    return u * (1.0 - 2.0 / 16777216.0) + 1.0 / 16777216.0


def _dropout_mask(seed, t, shape, rate: float):
    """Deterministic per-(seed, t) keep mask, replayable in the bwd pass."""
    u = _uniform01(seed, t, shape, 0)
    keep = 1.0 - rate
    return jnp.where(u < keep, 1.0 / keep, 0.0)


def _gumbel(seed, t, shape):
    """Per-(seed, t) Gumbel noise (salt keeps the stream disjoint from
    the dropout masks)."""
    u = _uniform01(seed, t, shape, 3571)
    return -jnp.log(-jnp.log(u))


def _matT_a_b(a, b):
    """a^T @ b for a (B, M), b (B, N) -> (M, N) on the MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _a_bT(a, b):
    """a @ b^T for a (B, N), b (M, N) -> (B, M) on the MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(teacher_ref, seed_ref, score_ref, gi_beat_ref, tick_h0_ref,
                x0_ref, emb_ref, w_ih0e_ref, w_hh0_ref, b_hh0_ref,
                w_ih1_ref, b_ih1_ref, w_hh1_ref, b_hh1_ref,
                out_w_ref, out_b_ref,
                weights_ref, samples_ref, h0_all_ref, h1_all_ref,
                h0_scr, h1_scr, emb_scr, *,
                train: bool, dropout_rate: float, ticks_per_beat: int,
                sampling: str):
    t = pl.program_id(0)
    B = x0_ref.shape[0]
    V = emb_ref.shape[0]
    teacher = teacher_ref[0] != 0
    seed = seed_ref[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)

    @pl.when(t == 0)
    def _():
        emb_scr[:] = x0_ref[:]

    # gi_beat / tick_h0 arrive as per-beat (1, ...) blocks via their
    # index maps (t // ticks_per_beat), so only the current beat's
    # conditioning is VMEM-resident
    reset = (t % ticks_per_beat) == 0
    # t == 0 is always a reset step, so the scratch hiddens never leak
    # uninitialized state
    h0 = jnp.where(reset, tick_h0_ref[0, 0], h0_scr[:])
    h1 = jnp.where(reset, tick_h0_ref[0, 1], h1_scr[:])
    prev_emb = emb_scr[:]

    gi0 = (
        jnp.dot(prev_emb, w_ih0e_ref[:], preferred_element_type=jnp.float32)
        + gi_beat_ref[0]
    )
    gh0 = (
        jnp.dot(h0, w_hh0_ref[:], preferred_element_type=jnp.float32)
        + b_hh0_ref[:]
    )
    r0, z0, n0, _ = _gru_gates(gi0, gh0)
    h0_new = (1.0 - z0) * n0 + z0 * h0

    inter = h0_new
    if train and dropout_rate > 0.0:
        inter = inter * _dropout_mask(seed, t, inter.shape, dropout_rate)

    gi1 = (
        jnp.dot(inter, w_ih1_ref[:], preferred_element_type=jnp.float32)
        + b_ih1_ref[:]
    )
    gh1 = (
        jnp.dot(h1, w_hh1_ref[:], preferred_element_type=jnp.float32)
        + b_hh1_ref[:]
    )
    r1, z1, n1, _ = _gru_gates(gi1, gh1)
    h1_new = (1.0 - z1) * n1 + z1 * h1

    logits = jnp.maximum(
        jnp.dot(h1_new, out_w_ref[:], preferred_element_type=jnp.float32)
        + out_b_ref[:],
        0.0,
    )  # (B, V)
    # argmax via max+iota: lowest index on ties, matching jnp.argmax.
    # multinomial == Gumbel-max over the same logits (the distribution
    # jax.random.categorical samples in the XLA path).
    scores = logits
    if sampling == "multinomial":
        scores = logits + _gumbel(seed, t, logits.shape)
    m = jnp.max(scores, axis=-1, keepdims=True)
    sampled = jnp.min(
        jnp.where(scores == m, iota_v, V), axis=-1
    ).astype(jnp.int32)
    tok = jnp.where(teacher, score_ref[0, 0], sampled)
    # clamp like the XLA path's jnp.take(mode="clip"): an out-of-range
    # teacher token (corrupt score) or the all-NaN sampled == V edge
    # would otherwise one-hot to a silent ZERO embedding while the scan
    # path clamps to the last table row — the two paths must not
    # silently diverge (jit's take default is "fill"/NaN, so the scan
    # path passes mode="clip" explicitly; review r4)
    tok = jnp.clip(tok, 0, V - 1)

    weights_ref[0] = logits
    samples_ref[0, 0] = tok
    h0_all_ref[0] = h0_new
    h1_all_ref[0] = h1_new

    onehot = (iota_v == tok[:, None]).astype(jnp.float32)
    h0_scr[:] = h0_new
    h1_scr[:] = h1_new
    emb_scr[:] = jnp.dot(onehot, emb_ref[:],
                         preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(seed_ref, gi_beat_ref, tick_h0_ref,
                x0_ref, emb_ref, w_ih0e_ref, w_hh0_ref, b_hh0_ref,
                w_ih1_ref, b_ih1_ref, w_hh1_ref, b_hh1_ref,
                out_w_ref, out_b_ref,
                samples_prev_ref, h0_t_ref, h0_tm1_ref, h1_t_ref,
                h1_tm1_ref, dweights_ref,
                dgi_beat_ref, dtick_h0_ref, dx0_ref, demb_ref, dw_ih0e_ref,
                dw_hh0_ref, db_hh0_ref, dw_ih1_ref, db_ih1_ref,
                dw_hh1_ref, db_hh1_ref, dout_w_ref, dout_b_ref,
                dh0_scr, dh1_scr, *,
                train: bool, dropout_rate: float, ticks_per_beat: int):
    k = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - k
    B = x0_ref.shape[0]
    H = h0_t_ref.shape[2]
    V = emb_ref.shape[0]
    seed = seed_ref[0]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)

    # gradient accumulators live directly in the VMEM-resident output
    # blocks; only the hidden-grad carries need scratch. The weight
    # accumulators are constant-index (zeroed once at k == 0); the
    # beat-scaled ones (dgi_beat, dtick_h0) are per-beat blocks whose
    # index map walks beats monotonically as t decreases, so each block
    # is zeroed on its FIRST visit (the beat's last tick) and flushed
    # when the walk leaves the beat.
    first_visit = jnp.logical_or(
        k == 0, (t % ticks_per_beat) == (ticks_per_beat - 1)
    )

    @pl.when(first_visit)
    def _():
        dgi_beat_ref[:] = jnp.zeros_like(dgi_beat_ref)
        dtick_h0_ref[:] = jnp.zeros_like(dtick_h0_ref)

    @pl.when(k == 0)
    def _():
        dh0_scr[:] = jnp.zeros_like(dh0_scr)
        dh1_scr[:] = jnp.zeros_like(dh1_scr)
        dx0_ref[:] = jnp.zeros_like(dx0_ref)
        demb_ref[:] = jnp.zeros_like(demb_ref)
        dw_ih0e_ref[:] = jnp.zeros_like(dw_ih0e_ref)
        dw_hh0_ref[:] = jnp.zeros_like(dw_hh0_ref)
        db_hh0_ref[:] = jnp.zeros_like(db_hh0_ref)
        dw_ih1_ref[:] = jnp.zeros_like(dw_ih1_ref)
        db_ih1_ref[:] = jnp.zeros_like(db_ih1_ref)
        dw_hh1_ref[:] = jnp.zeros_like(dw_hh1_ref)
        db_hh1_ref[:] = jnp.zeros_like(db_hh1_ref)
        dout_w_ref[:] = jnp.zeros_like(dout_w_ref)
        dout_b_ref[:] = jnp.zeros_like(dout_b_ref)

    reset = (t % ticks_per_beat) == 0

    # ---- recompute the step-t forward quantities ------------------------
    # (h*_tm1 blocks are index-clamped to row 0 at t==0, where reset
    # overrides them anyway)
    h0_prev = jnp.where(reset, tick_h0_ref[0, 0], h0_tm1_ref[0])
    h1_prev = jnp.where(reset, tick_h0_ref[0, 1], h1_tm1_ref[0])

    onehot_prev = (iota_v == samples_prev_ref[0, 0][:, None]
                   ).astype(jnp.float32)
    emb_prev = jnp.dot(onehot_prev, emb_ref[:],
                       preferred_element_type=jnp.float32)
    prev_emb = jnp.where(t == 0, x0_ref[:], emb_prev)

    gi0 = (
        jnp.dot(prev_emb, w_ih0e_ref[:], preferred_element_type=jnp.float32)
        + gi_beat_ref[0]
    )
    gh0 = (
        jnp.dot(h0_prev, w_hh0_ref[:], preferred_element_type=jnp.float32)
        + b_hh0_ref[:]
    )
    r0, z0, n0, hn0 = _gru_gates(gi0, gh0)
    h0_new = h0_t_ref[0]

    if train and dropout_rate > 0.0:
        mask = _dropout_mask(seed, t, (B, H), dropout_rate)
    else:
        mask = None
    inter = h0_new * mask if mask is not None else h0_new

    gi1 = (
        jnp.dot(inter, w_ih1_ref[:], preferred_element_type=jnp.float32)
        + b_ih1_ref[:]
    )
    gh1 = (
        jnp.dot(h1_prev, w_hh1_ref[:], preferred_element_type=jnp.float32)
        + b_hh1_ref[:]
    )
    r1, z1, n1, hn1 = _gru_gates(gi1, gh1)
    h1_new = h1_t_ref[0]

    pre_out = (
        jnp.dot(h1_new, out_w_ref[:], preferred_element_type=jnp.float32)
        + out_b_ref[:]
    )

    # ---- backward --------------------------------------------------------
    dlogits = dweights_ref[0] * (pre_out > 0.0).astype(jnp.float32)
    dout_w_ref[:] += _matT_a_b(h1_new, dlogits)
    dout_b_ref[:] += jnp.sum(dlogits, axis=0)
    dh1 = dh1_scr[:] + _a_bT(dlogits, out_w_ref[:])

    dgi1, dgh1, dh1_prev = _gru_bwd(dh1, r1, z1, n1, hn1, h1_prev,
                                    w_hh1_ref[:])
    dw_ih1_ref[:] += _matT_a_b(inter, dgi1)
    db_ih1_ref[:] += jnp.sum(dgi1, axis=0)
    dw_hh1_ref[:] += _matT_a_b(h1_prev, dgh1)
    db_hh1_ref[:] += jnp.sum(dgh1, axis=0)

    dinter = _a_bT(dgi1, w_ih1_ref[:])
    dh0 = dh0_scr[:] + (dinter * mask if mask is not None else dinter)

    dgi0, dgh0, dh0_prev = _gru_bwd(dh0, r0, z0, n0, hn0, h0_prev,
                                    w_hh0_ref[:])
    dw_hh0_ref[:] += _matT_a_b(h0_prev, dgh0)
    db_hh0_ref[:] += jnp.sum(dgh0, axis=0)
    dgi_beat_ref[0] += dgi0
    dw_ih0e_ref[:] += _matT_a_b(prev_emb, dgi0)

    dprev_emb = _a_bT(dgi0, w_ih0e_ref[:])  # (B, E)
    zero_e = jnp.zeros_like(dprev_emb)
    demb_ref[:] += _matT_a_b(
        onehot_prev, jnp.where(t == 0, zero_e, dprev_emb)
    )
    dx0_ref[:] += jnp.where(t == 0, dprev_emb, zero_e)

    # reset boundaries route the hidden grad to the per-beat inits
    zero_h = jnp.zeros((B, H), jnp.float32)
    dtick_h0_ref[0, 0] += jnp.where(reset, dh0_prev, zero_h)
    dtick_h0_ref[0, 1] += jnp.where(reset, dh1_prev, zero_h)
    dh0_scr[:] = jnp.where(reset, zero_h, dh0_prev)
    dh1_scr[:] = jnp.where(reset, zero_h, dh1_prev)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _full(spec_shape=None):
    if spec_shape is None:
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.BlockSpec(spec_shape, lambda *_: (0,) * len(spec_shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def hier_tick_chain(seq_len: int, train: bool, dropout_rate: float,
                    ticks_per_beat: int, sampling: str,
                    teacher, seed, score,
                    gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0,
                    w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b
                    ) -> Tuple[jax.Array, jax.Array]:
    """Fused T-step tick loop. ``score`` is time-major (T, B).
    Returns (weights (T,B,V) relu logits, samples (T,B) fed tokens)."""
    weights, samples, _, _ = _fwd_call(
        seq_len, train, dropout_rate, ticks_per_beat, sampling,
        teacher, seed,
        score, gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0, w_ih1,
        b_ih1, w_hh1, b_hh1, out_w, out_b,
    )
    return weights, samples


def _fwd_call(seq_len, train, dropout_rate, ticks_per_beat, sampling,
              teacher, seed,
              score, gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0,
              w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b):
    B, E = x0.shape
    H = w_hh0.shape[0]
    V = emb.shape[0]
    T = seq_len
    kernel = functools.partial(
        _fwd_kernel, train=train, dropout_rate=dropout_rate,
        ticks_per_beat=ticks_per_beat, sampling=sampling,
    )
    step3 = lambda t: (t, 0, 0)  # noqa: E731
    score3 = score.reshape(T, 1, B)
    L = tick_h0.shape[1]
    # per-beat streaming: only the current beat's conditioning rows are
    # VMEM-resident (the index map is constant within a beat, so the
    # block is fetched once per beat, not per tick)
    beat3 = lambda t: (t // ticks_per_beat, 0, 0)  # noqa: E731
    beat4 = lambda t: (t // ticks_per_beat, 0, 0, 0)  # noqa: E731
    gi_beat_spec = pl.BlockSpec((1, B, 3 * H), beat3,
                                memory_space=pltpu.VMEM)
    tick_h0_spec = pl.BlockSpec((1, L, B, H), beat4,
                                memory_space=pltpu.VMEM)
    weights, samples3, h0_all, h1_all = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, B), step3, memory_space=pltpu.VMEM),  # score
            gi_beat_spec, tick_h0_spec, _full(), _full(), _full(), _full(),
            _full(), _full(), _full(), _full(), _full(), _full(), _full(),
        ],
        out_specs=(
            pl.BlockSpec((1, B, V), step3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), step3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), step3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), step3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, V), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, E), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        jnp.asarray(teacher, jnp.int32).reshape(1),
        jnp.asarray(seed, jnp.int32).reshape(1),
        score3, gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0,
        w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b,
    )
    return weights, samples3.reshape(T, B), h0_all, h1_all


def _vjp_fwd(seq_len, train, dropout_rate, ticks_per_beat, sampling,
             teacher, seed,
             score, gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0,
             w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b):
    weights, samples, h0_all, h1_all = _fwd_call(
        seq_len, train, dropout_rate, ticks_per_beat, sampling,
        teacher, seed,
        score, gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0, b_hh0, w_ih1,
        b_ih1, w_hh1, b_hh1, out_w, out_b,
    )
    res = (teacher, seed, score, gi_beat, tick_h0, x0, emb, w_ih0e,
           w_hh0, b_hh0, w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b,
           samples, h0_all, h1_all)
    return (weights, samples), res


def _vjp_bwd(seq_len, train, dropout_rate, ticks_per_beat, sampling,
             res, cts):
    (teacher, seed, score, gi_beat, tick_h0, x0, emb, w_ih0e, w_hh0,
     b_hh0, w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b,
     samples, h0_all, h1_all) = res
    dweights, _ = cts  # samples (int) carry no gradient

    T = seq_len
    B, E = x0.shape
    H = w_hh0.shape[0]
    V = emb.shape[0]
    kernel = functools.partial(
        _bwd_kernel, train=train, dropout_rate=dropout_rate,
        ticks_per_beat=ticks_per_beat,
    )
    # (teacher/score are not passed to the bwd kernel: the saved samples
    # already encode the teacher-vs-sampled selection per step)
    rev3 = lambda k: (T - 1 - k, 0, 0)  # noqa: E731
    # block at time t-1, clamped at t == 0 (overridden by reset there)
    revm13 = lambda k: (jnp.maximum(T - 2 - k, 0), 0, 0)  # noqa: E731
    # per-beat streaming (reverse walk): the beat index is monotone
    # non-increasing in k, so each per-beat block is resident exactly
    # while its ticks are processed (zeroed on first visit in-kernel)
    rbeat3 = lambda k: ((T - 1 - k) // ticks_per_beat, 0, 0)  # noqa: E731
    rbeat4 = lambda k: ((T - 1 - k) // ticks_per_beat, 0, 0, 0)  # noqa: E731

    L = tick_h0.shape[1]
    gi_beat_spec = pl.BlockSpec((1, B, 3 * H), rbeat3,
                                memory_space=pltpu.VMEM)
    tick_h0_spec = pl.BlockSpec((1, L, B, H), rbeat4,
                                memory_space=pltpu.VMEM)
    shapes = (
        x0, emb, w_ih0e, w_hh0, b_hh0, w_ih1, b_ih1,
        w_hh1, b_hh1, out_w, out_b,
    )
    grads = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            gi_beat_spec, tick_h0_spec, _full(), _full(), _full(), _full(),
            _full(), _full(), _full(), _full(), _full(), _full(), _full(),
            pl.BlockSpec((1, 1, B), revm13, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), revm13, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), revm13, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, V), rev3, memory_space=pltpu.VMEM),
        ],
        out_specs=(gi_beat_spec, tick_h0_spec) + tuple(
            _full(a.shape) for a in shapes
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(a.shape, jnp.float32)
            for a in (gi_beat, tick_h0) + shapes
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),       # dh0 carry
            pltpu.VMEM((B, H), jnp.float32),       # dh1 carry
        ],
        interpret=_interpret(),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        gi_beat, tick_h0, x0, emb, w_ih0e,
        w_hh0, b_hh0, w_ih1, b_ih1, w_hh1, b_hh1, out_w, out_b,
        samples.reshape(T, 1, B), h0_all, h0_all, h1_all, h1_all, dweights,
    )

    import numpy as np

    f0 = jax.dtypes.float0
    dteacher = np.zeros(np.shape(teacher), f0)
    dseed = np.zeros(np.shape(seed), f0)
    dscore = np.zeros(score.shape, f0)
    return (dteacher, dseed, dscore) + tuple(grads)


hier_tick_chain.defvjp(_vjp_fwd, _vjp_bwd)
