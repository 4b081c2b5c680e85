"""Loss library — the canonical AR-VAE objective, TPU-native.

Reproduces the loss semantics of the reference trainer
(``utils/trainer.py:247-403`` and
``imagevae/image_vae_trainer.py:623-655`` in ashispati/ar-vae):

    L = recon(x, x_hat)
      + beta * | sum_dims KL(q(z|x) || N(0, I)) - c |
      + sum_{r in reg_dims} gamma * L1( tanh(delta * D_z_r), sign(D_a_r) )

where ``D_z_r[i, j] = z_i[r] - z_j[r]`` and ``D_a_r[i, j] = a_i[r] - a_j[r]``
are B×B pairwise difference matrices.

Everything here is pure jnp so it fuses under jit; the O(B²)
attribute-regularization block additionally has a hand-fused Pallas
kernel in ``arvae_tpu.ops.reg_pallas`` (golden-tested against
:func:`attribute_reg_loss` below). Distributions are carried as
``(mean, log_std)`` pairs instead of distribution objects — the
functional equivalent of ``torch.distributions.Normal(mean, exp(log_std))``
used throughout the reference (e.g. ``imagevae/mnist_vae.py:65``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Reconstruction losses
# ---------------------------------------------------------------------------


def bce_logits_recon_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Bernoulli decoder loss: summed BCE-with-logits divided by batch size.

    Matches ``F.binary_cross_entropy_with_logits(..., reduction='sum') / B``
    (reference ``image_vae_trainer.py:623-630``). Computed in the
    numerically-stable form ``max(x,0) - x*t + log1p(exp(-|x|))``.
    """
    batch = logits.shape[0]
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(per_elem) / batch


def gaussian_recon_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Gaussian decoder loss: sigmoid then summed MSE divided by batch size.

    Matches ``F.mse_loss(sigmoid(x), t, reduction='sum') / B``
    (reference ``image_vae_trainer.py:630-634``).
    """
    batch = logits.shape[0]
    x = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    return jnp.sum(jnp.square(x - t)) / batch


def reconstruction_loss(
    logits: jax.Array, targets: jax.Array, dec_dist: str = "bernoulli"
) -> jax.Array:
    if dec_dist == "bernoulli":
        return bce_logits_recon_loss(logits, targets)
    if dec_dist == "gaussian":
        return gaussian_recon_loss(logits, targets)
    raise AttributeError(f"invalid dist: {dec_dist}")


def token_cross_entropy_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean token-level cross entropy over all positions.

    Matches ``nn.CrossEntropyLoss(reduction='mean')`` on flattened
    (B*T, V) logits (reference ``utils/trainer.py:247-264``).

    Out-of-vocab target ids clamp to V-1 under jit (``mode="clip"`` —
    the jit default is ``"fill"``, which would silently NaN-poison the
    loss) rather than raising like torch — the realistic cause (a model
    sized off a stale vocab cache) is rejected loudly at trainer
    construction instead (``training/measure_trainer.py``).
    """
    v = logits.shape[-1]
    logits = logits.reshape(-1, v).astype(jnp.float32)
    targets = targets.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1,
                               mode="clip")[:, 0]
    return jnp.mean(nll)


def token_accuracy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Fraction of argmax-correct tokens (reference ``utils/trainer.py:266-282``)."""
    v = logits.shape[-1]
    pred = jnp.argmax(logits.reshape(-1, v), axis=-1)
    return jnp.mean((pred == targets.reshape(-1)).astype(jnp.float32))


def mean_l1_loss_rnn(weights: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean elementwise L1 over (B, T, H) sequences.

    Parity port of the reference ``Trainer.mean_l1_loss_rnn``
    (``utils/trainer.py:284-301``) — ``nn.L1Loss()`` with its default
    mean reduction. The reference never calls it (zero call sites,
    confirmed by grep); it is kept for literal loss-library completeness.
    """
    if weights.ndim != 3 or weights.shape != targets.shape:
        raise ValueError(
            f"expected matching (B, T, H) arrays, got {weights.shape} vs {targets.shape}"
        )
    w = weights.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.abs(w - t))


def mean_mse_loss_rnn(weights: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean elementwise MSE over (B, T, H) sequences.

    Parity port of the reference ``Trainer.mean_mse_loss_rnn``
    (``utils/trainer.py:303-320``) — ``nn.MSELoss()`` default mean
    reduction. Zero reference call sites; kept for completeness.
    """
    if weights.ndim != 3 or weights.shape != targets.shape:
        raise ValueError(
            f"expected matching (B, T, H) arrays, got {weights.shape} vs {targets.shape}"
        )
    w = weights.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.square(w - t))


def token_cross_entropy_loss_alt(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """4-D variant: mean CE over (B, M, T, V) logits vs (B, M, T) targets.

    Parity port of ``Trainer.mean_crossentropy_loss_alt``
    (``utils/trainer.py:322-337``). Identical math to
    :func:`token_cross_entropy_loss` after flattening — the reference
    keeps a separate entry point for the measure-major layout, so we do
    too. Zero reference call sites; kept for completeness.
    """
    if logits.ndim != 4 or targets.ndim != 3 or logits.shape[:3] != targets.shape:
        raise ValueError(
            f"expected (B, M, T, V) logits with (B, M, T) targets, "
            f"got {logits.shape} vs {targets.shape}"
        )
    return token_cross_entropy_loss(logits, targets)


def token_accuracy_alt(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """4-D variant: argmax accuracy over (B, M, T, V) logits.

    Parity port of ``Trainer.mean_accuracy_alt``
    (``utils/trainer.py:339-352``). Zero reference call sites; kept for
    completeness.
    """
    if logits.ndim != 4 or targets.ndim != 3 or logits.shape[:3] != targets.shape:
        raise ValueError(
            f"expected (B, M, T, V) logits with (B, M, T) targets, "
            f"got {logits.shape} vs {targets.shape}"
        )
    return token_accuracy(logits, targets)


def pixel_accuracy(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Binary pixel accuracy at a 0.5 threshold on probabilities.

    Matches the image trainers' ``mean_accuracy``
    (reference ``image_vae_trainer.py:639-655``).
    """
    pred = (probs >= 0.5).astype(jnp.float32)
    tgt = (targets >= 0.5).astype(jnp.float32)
    return jnp.mean((pred == tgt).astype(jnp.float32))


# ---------------------------------------------------------------------------
# KL divergence with capacity
# ---------------------------------------------------------------------------


def kld_loss(
    z_mean: jax.Array,
    z_log_std: jax.Array,
    beta: jax.Array | float,
    c: jax.Array | float = 0.0,
) -> jax.Array:
    """beta * | mean_B( sum_D KL(N(mu, sigma) || N(0, 1)) ) - c |.

    KL(N(mu, s) || N(0, 1)) = -log s + (s^2 + mu^2)/2 - 1/2, summed over
    latent dims then averaged over the batch, exactly as the reference
    ``Trainer.compute_kld_loss`` (``utils/trainer.py:354-367``).
    """
    mu = z_mean.astype(jnp.float32)
    log_s = z_log_std.astype(jnp.float32)
    kl = -log_s + 0.5 * (jnp.exp(2.0 * log_s) + jnp.square(mu)) - 0.5
    kld = jnp.mean(jnp.sum(kl, axis=-1))
    return beta * jnp.abs(kld - c)


# ---------------------------------------------------------------------------
# Attribute regularization (the AR in AR-VAE)
# ---------------------------------------------------------------------------


def attribute_reg_loss(
    z_r: jax.Array, attr: jax.Array, delta: jax.Array | float = 1.0
) -> jax.Array:
    """L1( tanh(delta * D_z), sign(D_a) ) over all B² ordered pairs.

    ``z_r`` and ``attr`` are (B,) — one regularized latent dimension and
    its target attribute. Matches ``Trainer.reg_loss_sign``
    (reference ``utils/trainer.py:378-403``) including the diagonal
    (i == j) pairs, which contribute |tanh(0) - sign(0)| = 0.
    """
    z_r = z_r.astype(jnp.float32)
    attr = attr.astype(jnp.float32)
    dz = z_r[:, None] - z_r[None, :]
    da = attr[:, None] - attr[None, :]
    return jnp.mean(jnp.abs(jnp.tanh(delta * dz) - jnp.sign(da)))


def total_reg_loss(
    z: jax.Array,
    labels: jax.Array,
    reg_dims: Sequence[Tuple[int, int]],
    gamma: jax.Array | float,
    delta: jax.Array | float,
    use_pallas: bool = False,
) -> jax.Array:
    """Sum of gamma-weighted AR losses over (latent_dim, attr_col) pairs.

    ``reg_dims`` is a static tuple of ``(latent_dim, attribute_column)``
    index pairs — the functional equivalent of the reference's loop
    ``for dim in self.reg_dim: compute_reg_loss(z_tilde, labels[:, dim], dim)``
    (``image_vae_trainer.py:171-180``), generalized so the latent dim
    and the label column need not share an index.

    With ``use_pallas=True`` the stacked (R, B) columns go through the
    hand-fused VMEM kernel in :mod:`arvae_tpu.ops.reg_pallas`. Measured
    on TPU v5e, XLA fuses this pattern to the same ~20-35us as the
    Pallas kernel for B in [128, 4096] (both launch-bound), so XLA is
    the default; the kernel remains the validated fallback for batch
    regimes where the B^2 materialization would spill.
    """
    if len(reg_dims) == 0:
        return jnp.asarray(0.0, jnp.float32)
    z_cols = jnp.stack([z[:, d] for d, _ in reg_dims], axis=0)
    a_cols = jnp.stack([labels[:, a] for _, a in reg_dims], axis=0)
    if use_pallas:
        from arvae_tpu.ops.reg_pallas import fused_reg_loss

        per_dim = fused_reg_loss(z_cols, a_cols, delta)
    else:
        per_dim = jax.vmap(attribute_reg_loss, in_axes=(0, 0, None))(
            z_cols, a_cols, delta
        )
    return gamma * jnp.sum(per_dim)
