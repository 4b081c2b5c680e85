"""GLSR baseline trainer (reference ``measurevae/vae_trainer_glsr.py``).

Geodesic latent-space regularization (Hadjeres et al.): a
finite-difference estimate of the gradient of a *differentiable
surrogate attribute* with respect to one latent dimension — perturb z
by ±δ along ``reg_dim``, decode both, form a softmax-weighted
attribute, and penalize the gradient under a N(100, 1) log-prob prior
(reference ``vae_trainer_glsr.py:45-104``).

The reference file contains latent bugs (an unimported ``F`` at
``:74``, ``d_z[: self.reg_dim]`` perturbing *rows* instead of the
latent column, and a broken ``super().__init__`` arg order at
``:20-27``); per SURVEY.md §2, the *capability* — the
finite-difference attribute-gradient regularizer — is reproduced, not
the bugs: the perturbation is applied to the ``reg_dim`` column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arvae_tpu.data.music_theory import RHY_COMPLEXITY_COEFFS
from arvae_tpu.models.measure_vae import MEASURE_SEQ_LEN
from arvae_tpu.ops.losses import (
    kld_loss,
    token_accuracy,
    token_cross_entropy_loss,
)
from arvae_tpu.training.measure_trainer import MeasureVAETrainer


class MeasureVAETrainerGLSR(MeasureVAETrainer):
    def __init__(
        self,
        dataset,
        model,
        lr: float = 1e-4,
        reg_type: str = "rhy_complexity",
        reg_dim: int = 0,
        gamma: float = 1.0,
        beta: float = 0.001,
        rand: int = 0,
        mesh=None,
    ):
        super().__init__(
            dataset,
            model,
            lr=lr,
            reg_type=(reg_type,) if reg_type else (),
            reg_dim=(reg_dim,),
            beta=beta,
            gamma=gamma,
            rand=rand,
            mesh=mesh,
            use_pallas=False,
        )
        self.glsr_reg_type = reg_type
        self.glsr_reg_dim = reg_dim
        # differentiable-attribute masks (reference :32-43)
        import numpy as np

        note_mask = np.asarray(self.attrs.is_note_table, dtype=np.float32)
        self._note_mask = jnp.asarray(note_mask)  # (V,)
        self._metrical_weights = jnp.asarray(RHY_COMPLEXITY_COEFFS)

    def model_repr(self) -> str:
        return super().model_repr() + "GLSR"

    # -- differentiable surrogate attribute (reference :86-104) -------------

    def compute_grad_attr(self, softmax_weights: jax.Array) -> jax.Array:
        """softmax_weights: (B, T, V) → (B,) surrogate attribute."""
        mask = self._note_mask[None, None, :]
        if self.glsr_reg_type == "rhy_complexity":
            w = self._metrical_weights[None, :, None]
            return (softmax_weights * w * mask).sum(axis=(1, 2)) / jnp.sum(
                self._metrical_weights
            )
        if self.glsr_reg_type == "num_notes":
            T = softmax_weights.shape[1]
            return (softmax_weights * mask).sum(axis=(1, 2)) / T
        raise ValueError("Invalid regularization type")

    def compute_glsr_loss(self, params, z, key, epsilon: float = 1e-3):
        """Finite-difference attribute gradient under a N(100,1) prior
        (reference :45-84)."""
        B = z.shape[0]
        # three independent streams — drawing from `key` AND splitting
        # it would correlate the perturbation magnitudes with the two
        # decode sampling keys
        k_delta, k1, k2 = jax.random.split(key, 3)
        deltas = (1.0 + jax.random.uniform(k_delta, (B,))) * epsilon
        d_z = jnp.zeros_like(z).at[:, self.glsr_reg_dim].set(deltas)
        dummy = jnp.zeros((B, MEASURE_SEQ_LEN), jnp.int32)
        w_plus, _ = self.model.apply(
            {"params": params}, z + d_z, dummy, train=False, key=k1,
            method="decode",
        )
        w_minus, _ = self.model.apply(
            {"params": params}, z - d_z, dummy, train=False, key=k2,
            method="decode",
        )
        grad_softmax = jax.nn.softmax(w_plus, -1) - jax.nn.softmax(w_minus, -1)
        grad_attr = self.compute_grad_attr(grad_softmax) / (2.0 * deltas)
        prior_mean = 100.0
        # -log N(grad | 100, 1)
        reg = 0.5 * jnp.square(grad_attr - prior_mean) + 0.5 * jnp.log(
            2.0 * jnp.pi
        )
        return jnp.mean(reg)

    # -- loss -----------------------------------------------------------------

    def _loss_fn(self, params, batch, key, train: bool, hyper=None):
        score, _ = batch
        hy = hyper if hyper is not None else self.loss_hyper()
        k_fwd, k_glsr = jax.random.split(key)
        out = self.model.apply(
            {"params": params}, score, train=train, rng_key=k_fwd
        )
        recons_loss = token_cross_entropy_loss(out.weights, score)
        dist_loss = kld_loss(out.z_mean, out.z_log_std, hy["beta"],
                             hy["capacity"])
        glsr_loss = hy["gamma"] * self.compute_glsr_loss(
            params, out.z_tilde, k_glsr
        )
        loss = recons_loss + dist_loss + glsr_loss
        metrics = {
            "loss": loss,
            "recons_loss": recons_loss,
            "dist_loss": dist_loss,
            "reg_loss": glsr_loss,
            "accuracy": token_accuracy(out.weights, score),
        }
        return loss, metrics
