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

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

GRUParams = Dict[str, jax.Array]


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
    gi = x @ params["w_ih"] + params["b_ih"]
    gh = h @ params["w_hh"] + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


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
    inside the scan."""
    gi_all = xs @ params["w_ih"] + params["b_ih"]  # (B, T, 3H)

    def step(h, gi_t):
        h_new = gru_cell_from_gi(params, gi_t, h)
        return h_new, h_new

    gi_t = jnp.swapaxes(gi_all, 0, 1)  # (T, B, 3H)
    h_final, outs = jax.lax.scan(step, h0, gi_t, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), h_final


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
            out_f, hf = gru_layer(fwd_p, out, h0_f, reverse=False)
            out_b, hb = gru_layer(bwd_p, out, h0_b, reverse=True)
            out = jnp.concatenate([out_f, out_b], axis=-1)
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
