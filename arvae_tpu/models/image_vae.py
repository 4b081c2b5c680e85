"""Convolutional image VAEs (Flax), TPU-native.

Architecture capability matches the reference exactly:

- ``MnistVAE``: reference ``imagevae/mnist_vae.py:7-105`` — encoder
  3×(Conv k4 s1 VALID → SELU → Dropout 0.5) with channels 1→64→64→8,
  flatten 19·19·8 = 2888 → Linear 256 (SELU) → (mean, log_std) heads,
  z_dim 16; mirrored ConvTranspose decoder.
- ``DspritesVAE``: reference ``imagevae/dsprites_vae.py:7-56`` — encoder
  4×(Conv k4 s2 p1 → ReLU) 32 channels, 512 → 256 → 256 → heads,
  z_dim 10; mirrored stride-2 ConvTranspose decoder.

Design differences from the torch original (all deliberate, TPU-first):
images are NHWC internally (XLA's native conv layout — NCHW inputs are
transposed once at the edge), the reparametrization consumes an explicit
PRNG key instead of global RNG state, and the forward pass returns a
``VAEOutput`` struct of arrays (mean/log_std) rather than distribution
objects so the whole step stays jit-traceable.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

_XAVIER = nn.initializers.xavier_normal()


@struct.dataclass
class VAEOutput:
    """Functional stand-in for the reference's 5-tuple
    ``(output, z_dist, prior_dist, z_tilde, z_prior)``."""

    logits: jax.Array  # decoder output, same shape as input
    z_mean: jax.Array  # (B, z_dim)
    z_log_std: jax.Array  # (B, z_dim)
    z_tilde: jax.Array  # reparametrized sample, (B, z_dim)
    z_prior: jax.Array  # sample from N(0, I), (B, z_dim)


def _to_nhwc(x: jax.Array) -> jax.Array:
    """Accept NCHW (the reference's layout) or NHWC; return NHWC."""
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def reparametrize_keys(
    k_eps: jax.Array, k_prior: jax.Array,
    z_mean: jax.Array, z_log_std: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """The one reparametrization convention, shared by every model
    family (MeasureVAE passes its own pre-split keys so its RNG stream
    is unchanged by the sharing)."""
    eps = jax.random.normal(k_eps, z_mean.shape, z_mean.dtype)
    z_tilde = z_mean + jnp.exp(z_log_std) * eps
    z_prior = jax.random.normal(k_prior, z_mean.shape, z_mean.dtype)
    return z_tilde, z_prior


def reparametrize(
    rng: jax.Array, z_mean: jax.Array, z_log_std: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """z ~ N(mean, exp(log_std)); also a prior sample z_p ~ N(0, I).

    Matches ``MnistVAE.reparametrize`` (reference mnist_vae.py:74-87).
    """
    k1, k2 = jax.random.split(rng)
    return reparametrize_keys(k1, k2, z_mean, z_log_std)


class MnistVAE(nn.Module):
    """28×28 single-channel conv VAE (reference mnist_vae.py:7-105).

    ``compute_dtype=jnp.bfloat16`` runs the conv/dense stacks in the
    MXU's native dtype (params stay float32; the distribution heads and
    the output logits stay float32 for stable KLD/BCE) — opt in via the
    CLIs' ``--bf16``.
    """

    z_dim: int = 16
    inter_dim: int = 19
    inter_channels: int = 8
    dropout_rate: float = 0.5
    compute_dtype: Any = jnp.float32

    def setup(self):
        dt = self.compute_dtype
        self.enc_convs = [
            nn.Conv(f, (4, 4), strides=1, padding="VALID",
                    kernel_init=_XAVIER, dtype=dt)
            for f in (64, 64, self.inter_channels)
        ]
        self.enc_dense = nn.Dense(256, kernel_init=_XAVIER, dtype=dt)
        self.enc_mean = nn.Dense(self.z_dim, kernel_init=_XAVIER)
        self.enc_log_std = nn.Dense(self.z_dim, kernel_init=_XAVIER)
        self.dec_denses = [
            nn.Dense(256, kernel_init=_XAVIER, dtype=dt),
            nn.Dense(
                self.inter_dim * self.inter_dim * self.inter_channels,
                kernel_init=_XAVIER, dtype=dt,
            ),
        ]
        # ConvTranspose(k4, s1, VALID) expressed as pad(3)+Conv — identical
        # math, but the conv/conv-transpose mixed backward graph compiles
        # pathologically slowly on the TPU toolchain here (>9 min vs ~2 min).
        self.dec_convs = [
            nn.Conv(f, (4, 4), strides=1, padding=((3, 3), (3, 3)),
                    kernel_init=_XAVIER, dtype=dt)
            for f in (64, 64, 1)
        ]
        self.dropout = nn.Dropout(self.dropout_rate)

    def _act(self, x):
        return nn.selu(x)

    # -- encode / decode ----------------------------------------------------

    def _enc_hidden(self, x, train: bool):
        x = _to_nhwc(x)
        for conv in self.enc_convs:
            x = self.dropout(self._act(conv(x)), deterministic=not train)
        h = x.reshape(x.shape[0], -1)
        return self._act(self.enc_dense(h))

    def encode(self, x, train: bool = True):
        h = self._enc_hidden(x, train)
        return self.enc_mean(h), self.enc_log_std(h)

    def decode(self, z, train: bool = True):
        h = z
        for dense in self.dec_denses:
            h = self._act(dense(h))
        h = h.reshape(
            h.shape[0], self.inter_dim, self.inter_dim, self.inter_channels
        )
        for i, conv in enumerate(self.dec_convs):
            h = conv(h)
            if i < len(self.dec_convs) - 1:
                h = self.dropout(self._act(h), deterministic=not train)
        # NHWC -> NCHW at the edge to mirror the reference's output layout;
        # logits leave in float32 regardless of the compute dtype
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, x, *, rng_sample=None, train: bool = True):
        z_mean, z_log_std = self.encode(x, train=train)
        if rng_sample is None:
            rng_sample = self.make_rng("sample")
        z_tilde, z_prior = reparametrize(rng_sample, z_mean, z_log_std)
        logits = self.decode(z_tilde, train=train)
        return VAEOutput(
            logits=logits,
            z_mean=z_mean,
            z_log_std=z_log_std,
            z_tilde=z_tilde,
            z_prior=z_prior,
        )


class DspritesVAE(MnistVAE):
    """64×64 conv VAE (reference dsprites_vae.py:7-56)."""

    z_dim: int = 10
    inter_dim: int = 4
    inter_channels: int = 32

    def setup(self):
        dt = self.compute_dtype
        self.enc_convs = [
            nn.Conv(32, (4, 4), strides=2, padding=((1, 1), (1, 1)),
                    kernel_init=_XAVIER, dtype=dt)
            for _ in range(4)
        ]
        self.enc_denses = [
            nn.Dense(256, kernel_init=_XAVIER, dtype=dt),
            nn.Dense(256, kernel_init=_XAVIER, dtype=dt),
        ]
        self.enc_mean = nn.Dense(self.z_dim, kernel_init=_XAVIER)
        self.enc_log_std = nn.Dense(self.z_dim, kernel_init=_XAVIER)
        self.dec_denses = [
            nn.Dense(256, kernel_init=_XAVIER, dtype=dt),
            nn.Dense(256, kernel_init=_XAVIER, dtype=dt),
            nn.Dense(
                self.inter_dim * self.inter_dim * self.inter_channels,
                kernel_init=_XAVIER, dtype=dt,
            ),
        ]
        self.dec_convs = [
            nn.ConvTranspose(f, (4, 4), strides=(2, 2), padding="SAME",
                             kernel_init=_XAVIER, dtype=dt)
            for f in (32, 32, 32, 1)
        ]
        self.dropout = nn.Dropout(0.0)  # dsprites nets have no dropout

    def _act(self, x):
        return nn.relu(x)

    def _enc_hidden(self, x, train: bool):
        x = _to_nhwc(x)
        for conv in self.enc_convs:
            x = self._act(conv(x))
        h = x.reshape(x.shape[0], -1)
        for dense in self.enc_denses:
            h = self._act(dense(h))
        return h

    def decode(self, z, train: bool = True):
        h = z
        for dense in self.dec_denses:
            h = self._act(dense(h))
        h = h.reshape(
            h.shape[0], self.inter_dim, self.inter_dim, self.inter_channels
        )
        for i, conv in enumerate(self.dec_convs):
            h = conv(h)
            if i < len(self.dec_convs) - 1:
                h = self._act(h)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
