"""GRU primitives golden-tested against torch.nn.GRU with shared weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from arvae_tpu.ops.gru import (
    gru_cell,
    gru_forward,
    init_gru_params,
    init_stacked_gru_params,
)


def _copy_torch_weights(t_gru, num_layers, bidirectional):
    """Extracts torch GRU weights into our (I, 3H) layout."""
    dirs = 2 if bidirectional else 1
    params = []
    for layer in range(num_layers):
        per_dir = []
        for d in range(dirs):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            w_ih = getattr(t_gru, f"weight_ih{sfx}").detach().numpy().T
            w_hh = getattr(t_gru, f"weight_hh{sfx}").detach().numpy().T
            b_ih = getattr(t_gru, f"bias_ih{sfx}").detach().numpy()
            b_hh = getattr(t_gru, f"bias_hh{sfx}").detach().numpy()
            per_dir.append(
                {
                    "w_ih": jnp.array(w_ih),
                    "w_hh": jnp.array(w_hh),
                    "b_ih": jnp.array(b_ih),
                    "b_hh": jnp.array(b_hh),
                }
            )
        params.append(per_dir if bidirectional else per_dir[0])
    return params


@pytest.mark.parametrize(
    "num_layers,bidirectional", [(1, False), (2, False), (2, True)]
)
def test_matches_torch(num_layers, bidirectional):
    torch.manual_seed(0)
    B, T, I, H = 3, 7, 5, 11
    dirs = 2 if bidirectional else 1
    t_gru = torch.nn.GRU(
        I, H, num_layers=num_layers, bidirectional=bidirectional,
        batch_first=True,
    )
    params = _copy_torch_weights(t_gru, num_layers, bidirectional)

    rng = np.random.RandomState(1)
    x = rng.randn(B, T, I).astype(np.float32)
    h0 = rng.randn(num_layers * dirs, B, H).astype(np.float32)

    with torch.no_grad():
        t_out, t_hn = t_gru(torch.from_numpy(x), torch.from_numpy(h0))

    j_out, j_hn = gru_forward(
        params, jnp.array(x), jnp.array(h0), bidirectional=bidirectional
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_hn), t_hn.numpy(), atol=2e-5)


def test_cell_step_matches_torch_cell():
    torch.manual_seed(1)
    t_cell = torch.nn.GRUCell(4, 6)
    params = {
        "w_ih": jnp.array(t_cell.weight_ih.detach().numpy().T),
        "w_hh": jnp.array(t_cell.weight_hh.detach().numpy().T),
        "b_ih": jnp.array(t_cell.bias_ih.detach().numpy()),
        "b_hh": jnp.array(t_cell.bias_hh.detach().numpy()),
    }
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4).astype(np.float32)
    h = rng.randn(2, 6).astype(np.float32)
    with torch.no_grad():
        t_h = t_cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    j_h = gru_cell(params, jnp.array(x), jnp.array(h))
    np.testing.assert_allclose(np.asarray(j_h), t_h, atol=1e-5)


def test_init_shapes():
    params = init_stacked_gru_params(jax.random.key(0), 10, 32, 2,
                                     bidirectional=True)
    assert len(params) == 2
    assert params[0][0]["w_ih"].shape == (10, 96)
    assert params[1][0]["w_ih"].shape == (64, 96)  # layer 1 consumes 2H
    p = init_gru_params(jax.random.key(0), 3, 4)
    assert p["w_hh"].shape == (4, 12)


def test_dropout_between_layers_train_only():
    params = init_stacked_gru_params(jax.random.key(0), 4, 8, 2)
    x = jnp.ones((2, 5, 4))
    h0 = jnp.zeros((2, 2, 8))
    out1, _ = gru_forward(params, x, h0, dropout_rate=0.5,
                          dropout_rng=jax.random.key(1), train=True)
    out2, _ = gru_forward(params, x, h0, dropout_rate=0.5,
                          dropout_rng=jax.random.key(2), train=True)
    out_eval, _ = gru_forward(params, x, h0, dropout_rate=0.5,
                              dropout_rng=jax.random.key(1), train=False)
    out_eval2, _ = gru_forward(params, x, h0, dropout_rate=0.5,
                               dropout_rng=jax.random.key(2), train=False)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))
