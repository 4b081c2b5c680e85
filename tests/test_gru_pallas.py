"""Fused GRU-chain Pallas kernel vs the XLA-scan reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.ops.gru_pallas import (
    gru_chain,
    gru_chain_reference,
    supports_shapes,
)

T, B, H = 6, 8, 128


def _inputs(d, seed=0, t=T, b=B, h=H):
    rng = np.random.RandomState(seed)
    gi = jnp.asarray(rng.randn(t, d, b, 3 * h) * 0.5, jnp.float32)
    w_hh = jnp.asarray(rng.randn(d, h, 3 * h) / np.sqrt(h), jnp.float32)
    b_hh = jnp.asarray(rng.randn(d, 3 * h) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.randn(d, b, h) * 0.3, jnp.float32)
    return gi, w_hh, b_hh, h0


@pytest.mark.parametrize("d", [1, 2])
def test_forward_matches_reference(d):
    gi, w_hh, b_hh, h0 = _inputs(d)
    outs = gru_chain(gi, w_hh, b_hh, h0)
    ref = gru_chain_reference(gi, w_hh, b_hh, h0)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("d", [1, 2])
def test_gradients_match_reference(d):
    gi, w_hh, b_hh, h0 = _inputs(d, seed=3)
    rng = np.random.RandomState(9)
    ct = jnp.asarray(rng.randn(T, d, B, H), jnp.float32)

    def loss(fn, *args):
        return jnp.sum(fn(*args) * ct)

    g_k = jax.grad(lambda *a: loss(gru_chain, *a), argnums=(0, 1, 2, 3))(
        gi, w_hh, b_hh, h0
    )
    g_r = jax.grad(
        lambda *a: loss(gru_chain_reference, *a), argnums=(0, 1, 2, 3)
    )(gi, w_hh, b_hh, h0)
    for a, b, name in zip(g_k, g_r, ["dgi", "dw_hh", "db_hh", "dh0"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_grad_through_final_state_only():
    # cotangent only on outs[-1] (the encoder uses just the final
    # hiddens) must still backprop the whole chain
    gi, w_hh, b_hh, h0 = _inputs(2, seed=5)

    def f(fn, gi_):
        return jnp.sum(fn(gi_, w_hh, b_hh, h0)[-1] ** 2)

    g_k = jax.grad(lambda g: f(gru_chain, g))(gi)
    g_r = jax.grad(lambda g: f(gru_chain_reference, g))(gi)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-4, atol=1e-6)


def test_jit_value_and_grad():
    gi, w_hh, b_hh, h0 = _inputs(2, seed=7)

    @jax.jit
    def step(gi_):
        return jax.value_and_grad(
            lambda g: jnp.sum(gru_chain(g, w_hh, b_hh, h0))
        )(gi_)

    v, g = step(gi)
    v2, g2 = jax.value_and_grad(
        lambda g_: jnp.sum(gru_chain_reference(g_, w_hh, b_hh, h0))
    )(gi)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_supports_shapes():
    assert supports_shapes(256, 128)
    assert supports_shapes(1024, 128)   # measured-working fused point
    assert supports_shapes(256, 256)
    assert not supports_shapes(256, 96)  # H tiling
    assert not supports_shapes(3, 128)   # B tiling
    # VMEM guard: H=512's 9*D*H^2 weight residents alone blow the
    # budget at any batch; huge batches blow the streamed blocks
    assert not supports_shapes(8, 512)
    assert not supports_shapes(256, 512)
    assert not supports_shapes(4096, 128)
    # the single-direction variant halves the residents
    assert supports_shapes(256, 256, n_dirs=1)


def test_env_int_malformed_reads_as_default(monkeypatch):
    # integer ARVAE_* knobs must not explode mid-trace on a typo —
    # malformed values read as the default (review r4)
    from arvae_tpu.ops.gru_pallas import env_int

    monkeypatch.setenv("ARVAE_GRU_PALLAS_MIN_T", "4x")
    assert env_int("ARVAE_GRU_PALLAS_MIN_T", 1) == 1
    monkeypatch.setenv("ARVAE_GRU_PALLAS_MIN_T", "6")
    assert env_int("ARVAE_GRU_PALLAS_MIN_T", 1) == 6
    monkeypatch.delenv("ARVAE_GRU_PALLAS_MIN_T")
    assert env_int("ARVAE_GRU_PALLAS_MIN_T", 1) == 1

    from arvae_tpu.ops import gru

    monkeypatch.setenv("ARVAE_GRU_PALLAS_MIN_T", "oops")
    monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")
    # must not raise ValueError from the knob parse
    assert gru._use_fused_chain(256, 128, seq_len=24)


def test_layer_integration_forced(monkeypatch):
    """bigru_layer / gru_layer routed through the fused chain (forced
    interpret mode off-TPU) must match their XLA-scan path, fwd + grad."""
    from arvae_tpu.ops.gru import bigru_layer, gru_layer, init_gru_params

    rng = np.random.RandomState(21)
    b, t, i, h = 8, 5, 16, 128
    xs = jnp.asarray(rng.randn(b, t, i), jnp.float32)
    fwd_p = init_gru_params(jax.random.key(0), i, h)
    bwd_p = init_gru_params(jax.random.key(1), i, h)
    h0 = jnp.zeros((b, h), jnp.float32)

    def bi_loss(xs_):
        out, hf, hb = bigru_layer(fwd_p, bwd_p, xs_, h0, h0)
        return jnp.sum(out ** 2) + jnp.sum(hf * hb)

    def uni_loss(xs_):
        out, hf = gru_layer(fwd_p, xs_, h0, reverse=True)
        return jnp.sum(out ** 2) + jnp.sum(hf)

    monkeypatch.delenv("ARVAE_FORCE_GRU_PALLAS", raising=False)
    monkeypatch.setenv("ARVAE_NO_GRU_PALLAS", "1")
    v_ref, g_ref = jax.value_and_grad(bi_loss)(xs)
    vu_ref, gu_ref = jax.value_and_grad(uni_loss)(xs)

    monkeypatch.delenv("ARVAE_NO_GRU_PALLAS", raising=False)
    monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")
    v_k, g_k = jax.value_and_grad(bi_loss)(xs)
    vu_k, gu_k = jax.value_and_grad(uni_loss)(xs)

    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(vu_k), float(vu_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_ref),
                               rtol=1e-4, atol=1e-6)
