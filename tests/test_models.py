"""Shape/jit tests for the image model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.models import (
    DspritesFaderNetwork,
    DspritesVAE,
    ImageFaderDiscriminator,
    MnistFaderNetwork,
    MnistVAE,
)


def _init_vae(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    return model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sample": jax.random.key(2)},
        x,
        train=True,
    )


class TestMnistVAE:
    def test_shapes(self):
        m = MnistVAE()
        vs = _init_vae(m, (2, 1, 28, 28))
        out = m.apply(
            vs, jnp.zeros((2, 1, 28, 28)), train=False,
            rngs={"sample": jax.random.key(0)},
        )
        assert out.logits.shape == (2, 1, 28, 28)
        assert out.z_tilde.shape == (2, 16)
        assert out.z_mean.shape == (2, 16)

    def test_decode_roundtrip_shape(self):
        m = MnistVAE()
        vs = _init_vae(m, (1, 1, 28, 28))
        dec = m.apply(vs, jnp.zeros((3, 16)), train=False, method="decode")
        assert dec.shape == (3, 1, 28, 28)

    def test_eval_deterministic(self):
        m = MnistVAE()
        vs = _init_vae(m, (2, 1, 28, 28))
        x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 28, 28), jnp.float32)
        k = jax.random.key(5)
        o1 = m.apply(vs, x, train=False, rngs={"sample": k})
        o2 = m.apply(vs, x, train=False, rngs={"sample": k})
        np.testing.assert_array_equal(o1.logits, o2.logits)

    def test_dropout_active_in_train(self):
        m = MnistVAE()
        vs = _init_vae(m, (2, 1, 28, 28))
        x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 28, 28), jnp.float32)
        o1 = m.apply(vs, x, train=True,
                     rngs={"dropout": jax.random.key(1), "sample": jax.random.key(0)})
        o2 = m.apply(vs, x, train=True,
                     rngs={"dropout": jax.random.key(2), "sample": jax.random.key(0)})
        assert not np.allclose(np.asarray(o1.logits), np.asarray(o2.logits))


class TestDspritesVAE:
    def test_shapes(self):
        m = DspritesVAE()
        vs = _init_vae(m, (2, 1, 64, 64))
        out = m.apply(
            vs, jnp.zeros((2, 1, 64, 64)), train=False,
            rngs={"sample": jax.random.key(0)},
        )
        assert out.logits.shape == (2, 1, 64, 64)
        assert out.z_tilde.shape == (2, 10)

    def test_jit_forward(self):
        m = DspritesVAE()
        vs = _init_vae(m, (2, 1, 64, 64))

        @jax.jit
        def f(v, x, k):
            return m.apply(v, x, train=False, rngs={"sample": k}).logits

        y = f(vs, jnp.zeros((2, 1, 64, 64)), jax.random.key(0))
        assert y.shape == (2, 1, 64, 64)


class TestFader:
    @pytest.mark.parametrize(
        "cls,shape,nattr",
        [(MnistFaderNetwork, (2, 1, 28, 28), 6),
         (DspritesFaderNetwork, (2, 1, 64, 64), 5)],
    )
    def test_forward(self, cls, shape, nattr):
        m = cls()
        x = jnp.zeros(shape, jnp.float32)
        labels = jnp.zeros((2, nattr), jnp.float32)
        vs = m.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, labels, train=True,
        )
        logits, z = m.apply(vs, x, labels, train=False)
        assert logits.shape == shape
        assert z.shape[0] == 2

    def test_discriminator(self):
        d = ImageFaderDiscriminator(num_attributes=6)
        vs = d.init(jax.random.key(0), jnp.zeros((4, 16)), train=False)
        out = d.apply(vs, jnp.zeros((4, 16)), train=False)
        assert out.shape == (4, 6)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_bf16_compute_dtype_keeps_f32_interface():
    """Mixed precision: params, distribution heads, and logits stay
    float32 while the conv/dense stacks run in bfloat16; outputs track
    the f32 model within bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from arvae_tpu.models import DspritesVAE

    x = jnp.asarray(
        (np.random.RandomState(0).rand(4, 1, 64, 64) > 0.7), jnp.float32
    )
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    m32 = DspritesVAE()
    v = m32.init(rngs, x, train=False)
    m16 = DspritesVAE(compute_dtype=jnp.bfloat16)

    out32 = m32.apply(v, x, train=False, rngs={"sample": jax.random.key(2)})
    out16 = m16.apply(v, x, train=False, rngs={"sample": jax.random.key(2)})
    assert out16.logits.dtype == jnp.float32
    assert out16.z_mean.dtype == jnp.float32
    # same params, same sample key -> same computation up to bf16 rounding
    np.testing.assert_allclose(
        np.asarray(out16.z_mean), np.asarray(out32.z_mean),
        atol=0.1, rtol=0.1,
    )
