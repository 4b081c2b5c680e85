"""Fader-network baseline models (Flax).

Capability parity with reference ``imagefader/image_fader.py:9-117``:
a deterministic encoder (the VAE conv stack, mean head only), a decoder
conditioned on ``concat([z, attributes])``, and an MLP latent
discriminator ``z_dim → 64 → 32 → num_attributes`` with dropout 0.5,
SELU, and a sigmoid output. (The reference hard-codes the
discriminator's input width to 16 — ``image_fader.py:13`` — which only
works for MNIST; here it follows the latent width.)

Flax's shape-inferring Dense means the label-conditioned decoder needs
no re-declaration: ``decode(concat([z, labels]))`` simply instantiates
the first decoder matrix at width ``z_dim + num_attributes``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from arvae_tpu.models.image_vae import MnistVAE, DspritesVAE, _XAVIER


class ImageFaderDiscriminator(nn.Module):
    """Latent attribute discriminator (reference image_fader.py:9-24)."""

    num_attributes: int
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = nn.Dense(64, kernel_init=_XAVIER)(z)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.selu(h)
        h = nn.Dense(32, kernel_init=_XAVIER)(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.selu(h)
        h = nn.Dense(self.num_attributes, kernel_init=_XAVIER)(h)
        return jax.nn.sigmoid(h)


class _FaderForward:
    """The fader forward pass, shared by both dataset variants: a
    deterministic encode (mean head only — reference image_fader.py:38-44
    drops the sampling) and a label-conditioned decode."""

    def encode_deterministic(self, x, train: bool = True):
        h = self._enc_hidden(x, train)
        return self.enc_mean(h)

    def __call__(self, x, labels, *, train: bool = True):
        z = self.encode_deterministic(x, train=train)
        logits = self.decode(jnp.concatenate([z, labels], axis=1), train=train)
        return logits, z


class MnistFaderNetwork(_FaderForward, MnistVAE):
    """Reference image_fader.py:27-69. num_attributes = 6 morphometrics."""

    num_attributes: int = 6


class DspritesFaderNetwork(_FaderForward, DspritesVAE):
    """Reference image_fader.py:72-117. num_attributes = 5 latent factors."""

    num_attributes: int = 5
