"""Golden tests for the loss library against hand-computed values and
independent numpy re-implementations of the reference (torch) math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.ops import (
    attribute_reg_loss,
    bce_logits_recon_loss,
    gaussian_recon_loss,
    kld_loss,
    pixel_accuracy,
    token_accuracy,
    token_cross_entropy_loss,
    total_reg_loss,
)

pytestmark = pytest.mark.fast


def np_reg_loss_sign(z, a, factor):
    """Direct numpy transcription of reference utils/trainer.py:378-403."""
    dz = z[:, None] - z[None, :]
    da = a[:, None] - a[None, :]
    return np.mean(np.abs(np.tanh(factor * dz) - np.sign(da)))


class TestRegLoss:
    def test_two_element_closed_form(self):
        # B=2: pairs (0,0),(0,1),(1,0),(1,1). dz = +-1, da sign = +-1.
        z = jnp.array([1.0, 0.0])
        a = jnp.array([3.0, 1.0])
        expected = (abs(np.tanh(1.0) - 1.0) * 2) / 4.0
        got = attribute_reg_loss(z, a, 1.0)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_perfectly_ordered_is_small(self):
        z = jnp.linspace(-3, 3, 16)
        a = jnp.linspace(0, 1, 16)
        anti = attribute_reg_loss(-z, a, 10.0)
        good = attribute_reg_loss(z, a, 10.0)
        assert good < 0.1
        assert anti > 1.5

    @pytest.mark.parametrize("b,delta", [(8, 1.0), (128, 10.0), (37, 0.5)])
    def test_matches_reference_math(self, b, delta):
        rng = np.random.RandomState(b)
        z = rng.randn(b).astype(np.float32)
        a = rng.randn(b).astype(np.float32)
        got = attribute_reg_loss(jnp.array(z), jnp.array(a), delta)
        np.testing.assert_allclose(got, np_reg_loss_sign(z, a, delta), rtol=1e-5)

    def test_total_reg_loss_sums_dims(self):
        rng = np.random.RandomState(0)
        z = jnp.array(rng.randn(32, 16), jnp.float32)
        labels = jnp.array(rng.randn(32, 7), jnp.float32)
        reg_dims = ((1, 1), (4, 4), (6, 6))
        total = total_reg_loss(z, labels, reg_dims, gamma=10.0, delta=1.0)
        manual = sum(
            10.0 * np_reg_loss_sign(np.array(z[:, d]), np.array(labels[:, a]), 1.0)
            for d, a in reg_dims
        )
        np.testing.assert_allclose(total, manual, rtol=1e-5)

    def test_empty_reg_dims(self):
        z = jnp.zeros((4, 8))
        labels = jnp.zeros((4, 3))
        assert total_reg_loss(z, labels, (), 1.0, 1.0) == 0.0


class TestKLD:
    def test_standard_normal_is_zero(self):
        mu = jnp.zeros((4, 8))
        log_s = jnp.zeros((4, 8))
        np.testing.assert_allclose(kld_loss(mu, log_s, beta=4.0), 0.0, atol=1e-7)

    def test_hand_computed(self):
        # KL(N(1, e) || N(0,1)) per dim = -1 + (e^2 + 1)/2 - 0.5
        mu = jnp.ones((2, 3))
        log_s = jnp.ones((2, 3))
        per_dim = -1.0 + (np.e**2 + 1.0) / 2.0 - 0.5
        expected = 2.0 * abs(3 * per_dim - 0.5)
        np.testing.assert_allclose(
            kld_loss(mu, log_s, beta=2.0, c=0.5), expected, rtol=1e-6
        )

    def test_capacity_absolute_value(self):
        mu = jnp.zeros((4, 8))
        log_s = jnp.zeros((4, 8))
        # kld = 0, so beta * |0 - c| = beta * c
        np.testing.assert_allclose(kld_loss(mu, log_s, 2.0, c=3.0), 6.0, rtol=1e-6)


class TestReconLosses:
    def test_bce_logits_matches_numpy(self):
        rng = np.random.RandomState(1)
        x = rng.randn(4, 1, 5, 5).astype(np.float32)
        t = (rng.rand(4, 1, 5, 5) > 0.5).astype(np.float32)
        p = 1.0 / (1.0 + np.exp(-x))
        expected = -np.sum(t * np.log(p) + (1 - t) * np.log(1 - p)) / 4
        got = bce_logits_recon_loss(jnp.array(x), jnp.array(t))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_gaussian_matches_numpy(self):
        rng = np.random.RandomState(2)
        x = rng.randn(3, 1, 4, 4).astype(np.float32)
        t = rng.rand(3, 1, 4, 4).astype(np.float32)
        p = 1.0 / (1.0 + np.exp(-x))
        expected = np.sum((p - t) ** 2) / 3
        got = gaussian_recon_loss(jnp.array(x), jnp.array(t))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_token_ce_uniform(self):
        logits = jnp.zeros((2, 6, 10))
        targets = jnp.zeros((2, 6), jnp.int32)
        np.testing.assert_allclose(
            token_cross_entropy_loss(logits, targets), np.log(10.0), rtol=1e-6
        )

    def test_token_ce_oov_target_clamps_not_nan(self):
        # the documented contract: an out-of-vocab target id clamps to
        # V-1 (mode="clip") instead of jit's default NaN fill silently
        # poisoning the loss (review r4)
        logits = jnp.zeros((1, 2, 4))
        targets = jnp.array([[3, 99]], jnp.int32)  # 99 >= V=4
        got = jax.jit(token_cross_entropy_loss)(logits, targets)
        assert np.isfinite(float(got))
        np.testing.assert_allclose(got, np.log(4.0), rtol=1e-6)

    def test_token_accuracy(self):
        logits = jnp.array([[[0.0, 1.0], [1.0, 0.0]]])
        targets = jnp.array([[1, 1]])
        np.testing.assert_allclose(token_accuracy(logits, targets), 0.5)

    def test_pixel_accuracy(self):
        probs = jnp.array([[0.9, 0.1, 0.6, 0.4]])
        targets = jnp.array([[1.0, 0.0, 0.0, 1.0]])
        np.testing.assert_allclose(pixel_accuracy(probs, targets), 0.5)


class TestGradients:
    def test_reg_loss_grad_finite_difference(self):
        rng = np.random.RandomState(3)
        z = jnp.array(rng.randn(16), jnp.float32)
        a = jnp.array(rng.randn(16), jnp.float32)
        g = jax.grad(lambda zz: attribute_reg_loss(zz, a, 2.0))(z)
        eps = 1e-3
        for i in [0, 7, 15]:
            zp = z.at[i].add(eps)
            zm = z.at[i].add(-eps)
            fd = (
                attribute_reg_loss(zp, a, 2.0) - attribute_reg_loss(zm, a, 2.0)
            ) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=1e-2, atol=1e-4)


class TestLossLibraryCompleteness:
    """Parity ports of the reference's zero-call-site loss variants
    (utils/trainer.py:284-352), golden-tested against torch-CPU."""

    def _torch(self):
        import torch

        return torch

    def test_mean_l1_loss_rnn_matches_torch(self):
        from arvae_tpu.ops import mean_l1_loss_rnn

        torch = self._torch()
        rng = np.random.RandomState(0)
        w = rng.randn(4, 7, 5).astype(np.float32)
        t = rng.randn(4, 7, 5).astype(np.float32)
        want = torch.nn.L1Loss()(torch.tensor(w), torch.tensor(t)).item()
        np.testing.assert_allclose(
            mean_l1_loss_rnn(jnp.asarray(w), jnp.asarray(t)), want, rtol=1e-6
        )

    def test_mean_mse_loss_rnn_matches_torch(self):
        from arvae_tpu.ops import mean_mse_loss_rnn

        torch = self._torch()
        rng = np.random.RandomState(1)
        w = rng.randn(3, 6, 8).astype(np.float32)
        t = rng.randn(3, 6, 8).astype(np.float32)
        want = torch.nn.MSELoss()(torch.tensor(w), torch.tensor(t)).item()
        np.testing.assert_allclose(
            mean_mse_loss_rnn(jnp.asarray(w), jnp.asarray(t)), want, rtol=1e-6
        )

    def test_alt_ce_and_accuracy_match_torch(self):
        from arvae_tpu.ops import token_accuracy_alt, token_cross_entropy_loss_alt

        torch = self._torch()
        rng = np.random.RandomState(2)
        logits = rng.randn(2, 3, 4, 9).astype(np.float32)
        targets = rng.randint(0, 9, (2, 3, 4))
        tw = torch.tensor(logits).view(-1, 9)
        tt = torch.tensor(targets).view(-1)
        want_ce = torch.nn.CrossEntropyLoss(reduction="mean")(tw, tt).item()
        want_acc = (tw.max(1).indices == tt).float().mean().item()
        np.testing.assert_allclose(
            token_cross_entropy_loss_alt(jnp.asarray(logits), jnp.asarray(targets)),
            want_ce,
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            token_accuracy_alt(jnp.asarray(logits), jnp.asarray(targets)),
            want_acc,
            rtol=1e-6,
        )

    def test_rank_guards(self):
        from arvae_tpu.ops import (
            mean_l1_loss_rnn,
            mean_mse_loss_rnn,
            token_accuracy_alt,
            token_cross_entropy_loss_alt,
        )

        w3 = jnp.zeros((2, 3, 4))
        with pytest.raises(ValueError):
            mean_l1_loss_rnn(w3, jnp.zeros((2, 3, 5)))
        with pytest.raises(ValueError):
            mean_mse_loss_rnn(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
        with pytest.raises(ValueError):
            token_cross_entropy_loss_alt(w3, jnp.zeros((2, 3), jnp.int32))
        with pytest.raises(ValueError):
            token_accuracy_alt(
                jnp.zeros((2, 3, 4, 5)), jnp.zeros((2, 4), jnp.int32)
            )
