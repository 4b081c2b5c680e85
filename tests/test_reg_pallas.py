"""The fused Pallas AR-reg kernel must match the XLA reference exactly
(forward and backward), including non-aligned batch sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.ops.losses import attribute_reg_loss
from arvae_tpu.ops.reg_pallas import fused_reg_loss


def _xla_per_dim(z_cols, a_cols, delta):
    return jax.vmap(attribute_reg_loss, in_axes=(0, 0, None))(z_cols, a_cols, delta)


@pytest.mark.parametrize("r,b,delta", [(1, 128, 1.0), (6, 128, 1.0), (4, 256, 10.0), (3, 100, 0.5), (2, 640, 2.0)])
def test_forward_matches_xla(r, b, delta):
    rng = np.random.RandomState(r * 1000 + b)
    z = jnp.array(rng.randn(r, b), jnp.float32)
    a = jnp.array(rng.randn(r, b), jnp.float32)
    got = fused_reg_loss(z, a, delta)
    want = _xla_per_dim(z, a, delta)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("r,b", [(2, 128), (3, 100)])
def test_backward_matches_xla(r, b):
    rng = np.random.RandomState(42)
    z = jnp.array(rng.randn(r, b), jnp.float32)
    a = jnp.array(rng.randn(r, b), jnp.float32)
    ct = jnp.array(rng.randn(r), jnp.float32)

    def f_pallas(zz):
        return jnp.sum(fused_reg_loss(zz, a, 1.5) * ct)

    def f_xla(zz):
        return jnp.sum(_xla_per_dim(zz, a, 1.5) * ct)

    g_pallas = jax.grad(f_pallas)(z)
    g_xla = jax.grad(f_xla)(z)
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-6)


def test_jit_and_value_and_grad():
    rng = np.random.RandomState(7)
    z = jnp.array(rng.randn(2, 64), jnp.float32)
    a = jnp.array(rng.randn(2, 64), jnp.float32)

    @jax.jit
    def step(zz):
        return jax.value_and_grad(lambda q: jnp.sum(fused_reg_loss(q, a, 1.0)))(zz)

    v, g = step(z)
    v2, g2 = jax.value_and_grad(
        lambda q: jnp.sum(_xla_per_dim(q, a, 1.0))
    )(z)
    np.testing.assert_allclose(v, v2, rtol=1e-5)
    np.testing.assert_allclose(g, g2, rtol=1e-4, atol=1e-6)


def test_large_batch_b8192_correct():
    """The kernel's claimed regime (VMEM-bounded large B): at B=8192 the
    2-D pair-block tiling must stay exact for value and gradient."""
    rng = np.random.RandomState(11)
    b = 8192
    z = jnp.array(rng.randn(1, b), jnp.float32)
    a = jnp.array(rng.randn(1, b), jnp.float32)

    v_pallas = fused_reg_loss(z, a, 2.0)
    v_xla = _xla_per_dim(z, a, 2.0)
    np.testing.assert_allclose(v_pallas, v_xla, rtol=1e-5)

    g_pallas = jax.grad(lambda q: jnp.sum(fused_reg_loss(q, a, 2.0)))(z)
    g_xla = jax.grad(lambda q: jnp.sum(_xla_per_dim(q, a, 2.0)))(z)
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-6)


def test_nondivisible_batch_b700_tiled():
    """A batch that is neither a tile nor a lane multiple exercises the
    padding + mask path of the tiled kernel."""
    rng = np.random.RandomState(13)
    b = 700
    z = jnp.array(rng.randn(3, b), jnp.float32)
    a = jnp.array(rng.randn(3, b), jnp.float32)
    np.testing.assert_allclose(
        fused_reg_loss(z, a, 1.0), _xla_per_dim(z, a, 1.0), rtol=1e-5
    )
    g_pallas = jax.grad(lambda q: jnp.sum(fused_reg_loss(q, a, 1.0)))(z)
    g_xla = jax.grad(lambda q: jnp.sum(_xla_per_dim(q, a, 1.0)))(z)
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("r,b", [(2, 128), (3, 100)])
def test_delta_grad_matches_xla(r, b):
    """d/d-delta must flow through the kernel (it used to be a silent
    hard-coded zero), matching the XLA path's true gradient."""
    rng = np.random.RandomState(7)
    z = jnp.array(rng.randn(r, b), jnp.float32)
    a = jnp.array(rng.randn(r, b), jnp.float32)

    g_pallas = jax.grad(lambda d: jnp.sum(fused_reg_loss(z, a, d)))(1.7)
    g_xla = jax.grad(lambda d: jnp.sum(_xla_per_dim(z, a, d)))(1.7)
    assert abs(float(g_xla)) > 1e-4  # the true gradient is nonzero
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-6)

    # and jointly with z, under jit
    (gz_p, gd_p) = jax.jit(jax.grad(
        lambda q, d: jnp.sum(fused_reg_loss(q, a, d)), argnums=(0, 1)
    ))(z, 1.7)
    (gz_x, gd_x) = jax.grad(
        lambda q, d: jnp.sum(_xla_per_dim(q, a, d)), argnums=(0, 1)
    )(z, 1.7)
    np.testing.assert_allclose(gz_p, gz_x, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gd_p, gd_x, rtol=1e-4, atol=1e-6)


def test_integer_labels_grad():
    """Integer attribute labels (raw class/position ids) must work under
    grad exactly like the XLA path, which casts internally — the custom
    VJP used to emit an invalid non-float0 cotangent for them."""
    rng = np.random.RandomState(3)
    z = jnp.array(rng.randn(2, 128), jnp.float32)
    a_int = jnp.array(rng.randint(0, 5, (2, 128)), jnp.int32)

    np.testing.assert_allclose(
        fused_reg_loss(z, a_int, 1.0),
        _xla_per_dim(z, a_int.astype(jnp.float32), 1.0),
        rtol=1e-5,
    )
    g_pallas = jax.grad(lambda q: jnp.sum(fused_reg_loss(q, a_int, 1.0)))(z)
    g_xla = jax.grad(
        lambda q: jnp.sum(_xla_per_dim(q, a_int.astype(jnp.float32), 1.0))
    )(z)
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-6)
