"""GRU primitives (pure functions + parameter factories).

The reference's music models are built on ``torch.nn.GRU``
(``measurevae/encoder.py:27-34``, ``measurevae/decoder.py:338-363``).
Here GRUs are pure functions over explicit parameter pytrees so they
compose with ``jax.lax.scan`` — including the hierarchical decoder's
sampled-feedback loop, which torch runs as 24 Python-level RNN calls
per batch (``decoder.py:469-525``) and we run as one compiled scan.

Gate math matches torch exactly (enables torch→jax weight conversion):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

Parameters per layer: ``w_ih (I, 3H)``, ``w_hh (H, 3H)``, ``b_ih (3H,)``,
``b_hh (3H,)``, gates ordered (r, z, n) as in torch.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

GRUParams = Dict[str, jax.Array]


def _use_fused_chain(batch: int, hidden: int,
                     seq_len: Optional[int] = None,
                     n_dirs: int = 2) -> bool:
    """Route whole-sequence recurrences through the fused Pallas chain
    kernel (ops/gru_pallas.py) when the TPU tiling allows it.

    ``ARVAE_NO_GRU_PALLAS`` disables it; ``ARVAE_FORCE_GRU_PALLAS``
    forces it off-TPU (interpret mode — used by the integration test).
    ``ARVAE_GRU_PALLAS_MIN_T`` (default 1) keeps very short recurrences
    on the XLA scan — at T=4 (the beat RNN) a kernel launch pair per
    layer can cost more than it saves (measured round 3: no win either
    way at B=256, so the default stays 1)."""
    if os.environ.get("ARVAE_NO_GRU_PALLAS"):
        return False
    from arvae_tpu.ops.gru_pallas import env_int, supports_shapes

    if seq_len is not None and seq_len < env_int(
            "ARVAE_GRU_PALLAS_MIN_T", 1):
        return False

    if not supports_shapes(batch, hidden, n_dirs):
        return False
    if os.environ.get("ARVAE_FORCE_GRU_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def init_gru_params(
    rng: jax.Array, input_size: int, hidden_size: int
) -> GRUParams:
    """Xavier-normal weights (the reference xavier-inits every '*weight*'
    param, utils/model.py:90-97), zero biases."""
    k1, k2 = jax.random.split(rng)
    xav = jax.nn.initializers.xavier_normal()
    return {
        "w_ih": xav(k1, (input_size, 3 * hidden_size), jnp.float32),
        "w_hh": xav(k2, (hidden_size, 3 * hidden_size), jnp.float32),
        "b_ih": jnp.zeros((3 * hidden_size,), jnp.float32),
        "b_hh": jnp.zeros((3 * hidden_size,), jnp.float32),
    }


def init_stacked_gru_params(
    rng: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = False,
) -> List[Any]:
    """Per-layer (and per-direction) parameter list.

    Layer 0 consumes ``input_size``; higher layers consume
    ``hidden_size * num_directions`` — torch's stacking convention.
    """
    dirs = 2 if bidirectional else 1
    params = []
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else hidden_size * dirs
        layer_params = []
        for _ in range(dirs):
            rng, sub = jax.random.split(rng)
            layer_params.append(init_gru_params(sub, in_sz, hidden_size))
        params.append(layer_params if bidirectional else layer_params[0])
    return params


def gru_cell_from_gi(params: GRUParams, gi: jax.Array, h: jax.Array
                     ) -> jax.Array:
    """GRU step given the precomputed input projection
    ``gi = x @ w_ih + b_ih`` — lets callers hoist input-projection
    matmuls for inputs that are constant across scan steps."""
    gh = h @ params["w_hh"] + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_cell(params: GRUParams, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step. x: (B, I), h: (B, H) → h': (B, H)."""
    return gru_cell_from_gi(params, x @ params["w_ih"] + params["b_ih"], h)


def stacked_gru_step_from_gi(
    params_layers: List[GRUParams],
    gi0: jax.Array,
    h: jax.Array,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One time step through stacked GRU layers where layer 0's input
    projection ``gi0 = x @ w_ih + b_ih`` is already computed — lets
    autoregressive scans hoist the input-constant part of the
    projection (e.g. the per-beat conditioning column block) out of the
    sequential loop. gi0: (B, 3H); h: (L, B, H) → (top (B, H), new h).
    Inter-layer dropout only (torch convention), keyed per layer."""
    new_h = []
    inp: Optional[jax.Array] = None
    n_layers = len(params_layers)
    for layer_idx, p in enumerate(params_layers):
        if layer_idx == 0:
            h_l = gru_cell_from_gi(p, gi0, h[0])
        else:
            h_l = gru_cell(p, inp, h[layer_idx])
        new_h.append(h_l)
        inp = h_l
        if (
            train
            and dropout_rate > 0.0
            and layer_idx < n_layers - 1
            and dropout_rng is not None
        ):
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, layer_idx),
                1.0 - dropout_rate,
                inp.shape,
            )
            inp = jnp.where(keep, inp / (1.0 - dropout_rate), 0.0)
    return inp, jnp.stack(new_h, 0)


def gru_layer(
    params: GRUParams,
    xs: jax.Array,
    h0: jax.Array,
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Scan one direction over time. xs: (B, T, I), h0: (B, H) →
    (outputs (B, T, H), h_final (B, H)).

    The input projection has no sequential dependence, so it is hoisted
    out of the scan as ONE (B·T, I)@(I, 3H) matmul — a much better MXU
    shape than T small matmuls — leaving only the recurrent h@w_hh
    inside the scan. On TPU with aligned shapes the whole recurrence
    runs as one fused Pallas chain kernel."""
    gi_all = xs @ params["w_ih"] + params["b_ih"]  # (B, T, 3H)
    gi_t = jnp.swapaxes(gi_all, 0, 1)  # (T, B, 3H)
    if reverse:
        gi_t = jnp.flip(gi_t, 0)

    b, h_dim = h0.shape
    if _use_fused_chain(b, h_dim, gi_t.shape[0], n_dirs=1):
        from arvae_tpu.ops.gru_pallas import gru_chain

        outs = gru_chain(
            gi_t[:, None], params["w_hh"][None], params["b_hh"][None],
            h0[None],
        )[:, 0]  # (T, B, H)
        h_final = outs[-1]
    else:

        def step(h, gi_step):
            h_new = gru_cell_from_gi(params, gi_step, h)
            return h_new, h_new

        h_final, outs = jax.lax.scan(step, h0, gi_t)
    if reverse:
        outs = jnp.flip(outs, 0)
    return jnp.swapaxes(outs, 0, 1), h_final


def bigru_layer(
    fwd_p: GRUParams,
    bwd_p: GRUParams,
    xs: jax.Array,
    h0_f: jax.Array,
    h0_b: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Both directions of one bidirectional layer in a SINGLE scan.

    Running fwd and bwd as separate scans doubles the sequential-step
    count — the dominant cost of small-hidden GRUs on TPU, where each
    scan iteration pays fixed overhead that dwarfs the (B,H)@(H,3H)
    matmul. Here the backward direction's inputs are time-flipped and
    stacked on a leading direction axis, so one scan advances both
    directions with 2-batched matmuls.

    xs: (B, T, I) → (outputs (B, T, 2H), h_final_f (B, H), h_final_b).
    """
    w_hh = jnp.stack([fwd_p["w_hh"], bwd_p["w_hh"]])  # (2, H, 3H)
    b_hh = jnp.stack([fwd_p["b_hh"], bwd_p["b_hh"]])  # (2, 3H)

    # whole-sequence input projections, hoisted (no sequential dep)
    gi_f = xs @ fwd_p["w_ih"] + fwd_p["b_ih"]  # (B, T, 3H)
    gi_b = xs @ bwd_p["w_ih"] + bwd_p["b_ih"]
    gi = jnp.stack(
        [jnp.swapaxes(gi_f, 0, 1), jnp.flip(jnp.swapaxes(gi_b, 0, 1), 0)],
        axis=1,
    )  # (T, 2, B, 3H)
    h0 = jnp.stack([h0_f, h0_b])  # (2, B, H)

    if _use_fused_chain(h0_f.shape[0], h0_f.shape[1], gi.shape[0]):
        from arvae_tpu.ops.gru_pallas import gru_chain

        outs = gru_chain(gi, w_hh, b_hh, h0)  # (T, 2, B, H)
        h_final = outs[-1]
    else:

        def step(h, gi_t):
            gh = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh[:, None, :]
            i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h_final, outs = jax.lax.scan(step, h0, gi)  # outs: (T, 2, B, H)
    out_f = jnp.swapaxes(outs[:, 0], 0, 1)  # (B, T, H)
    out_b = jnp.swapaxes(jnp.flip(outs[:, 1], 0), 0, 1)
    return (
        jnp.concatenate([out_f, out_b], axis=-1),
        h_final[0],
        h_final[1],
    )


def gru_forward(
    params_layers: List[Any],
    xs: jax.Array,
    h0: jax.Array,
    bidirectional: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Stacked (bi)GRU matching ``torch.nn.GRU(batch_first=True)``.

    xs: (B, T, I); h0: (L*D, B, H).
    Returns (outputs (B, T, H*D), h_n (L*D, B, H)) — h_n layout is
    torch's [layer0_fwd, layer0_bwd, layer1_fwd, ...].
    Inter-layer dropout (not after the last layer), as torch applies it.
    """
    dirs = 2 if bidirectional else 1
    num_layers = len(params_layers)
    finals = []
    out = xs
    for layer_idx, layer_params in enumerate(params_layers):
        if bidirectional:
            fwd_p, bwd_p = layer_params
            h0_f = h0[layer_idx * 2]
            h0_b = h0[layer_idx * 2 + 1]
            out, hf, hb = bigru_layer(fwd_p, bwd_p, out, h0_f, h0_b)
            finals.extend([hf, hb])
        else:
            h0_l = h0[layer_idx]
            out, hf = gru_layer(layer_params, out, h0_l)
            finals.append(hf)
        if (
            train
            and dropout_rate > 0.0
            and dropout_rng is not None
            and layer_idx < num_layers - 1
        ):
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    return out, jnp.stack(finals, axis=0)
