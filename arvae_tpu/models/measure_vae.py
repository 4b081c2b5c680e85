"""MeasureVAE: seq-to-seq VAE over one music measure (24 tokens).

Capability parity with the reference ``measurevae/``:

- ``Encoder`` (reference encoder.py:8-124): Embedding(V, 10) → 2-layer
  biGRU(H) → concat final hiddens of all layers/directions →
  two (Dense → SELU → Dense) heads → (z_mean, z_log_std).
- ``HierarchicalDecoder`` (reference decoder.py:309-525): z → beat-GRU
  init; beat GRU unrolled 4 steps over a learned input ``b_0``; per
  beat, a tick GRU unrolled 6 steps whose input is
  [prev-note embedding ‖ beat embedding] and whose output head is
  Dense → ReLU logits; the next input embeds either the teacher token
  or the model's own argmax/multinomial sample. Teacher forcing is one
  coin flip per batch (reference decoder.py:427-428).
- ``MeasureVAE`` (reference measure_vae.py:11-166) composes the two.

TPU-first re-design: the reference runs the tick loop as 24 Python-level
GRU invocations per batch (the hottest loop in its profile, SURVEY.md
§3.2); here the whole 4×6 hierarchy is ONE ``jax.lax.scan`` over 24
steps with static shapes — hidden resets at beat boundaries become a
``where`` on a precomputed per-beat init, and the teacher-forcing coin
flip becomes a traced select, so train and sample paths share one
compiled program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from arvae_tpu.models.image_vae import reparametrize_keys
from arvae_tpu.ops.gru import (
    gru_forward,
    init_stacked_gru_params,
    stacked_gru_step_from_gi,
)

_XAVIER = jax.nn.initializers.xavier_normal()

NUM_BEATS_PER_MEASURE = 4
NUM_TICKS_PER_BEAT = 6
MEASURE_SEQ_LEN = NUM_BEATS_PER_MEASURE * NUM_TICKS_PER_BEAT  # 24


@struct.dataclass
class MeasureVAEOutput:
    """Functional stand-in for the reference 6-tuple
    (weights, samples, z_dist, prior_dist, z_tilde, z_prior)."""

    weights: jax.Array  # (B, 24, V) logits
    samples: jax.Array  # (B, 24) int32
    z_mean: jax.Array
    z_log_std: jax.Array
    z_tilde: jax.Array
    z_prior: jax.Array


def _dense_params(self, name, in_dim, out_dim):
    w = self.param(f"{name}_w", _XAVIER, (in_dim, out_dim))
    b = self.param(f"{name}_b", nn.initializers.zeros, (out_dim,))
    return w, b


class Encoder(nn.Module):
    """Bidirectional GRU encoder (reference encoder.py:8-124)."""

    num_notes: int
    note_embedding_dim: int = 10
    rnn_hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.5
    z_dim: int = 256

    def setup(self):
        self.embedding = self.param(
            "embedding", _XAVIER, (self.num_notes, self.note_embedding_dim)
        )
        self.gru_params = self.param(
            "gru",
            lambda rng: init_stacked_gru_params(
                rng,
                self.note_embedding_dim,
                self.rnn_hidden_size,
                self.num_layers,
                bidirectional=True,
            ),
        )
        flat = self.rnn_hidden_size * 2 * self.num_layers
        mid = self.rnn_hidden_size * 2
        self.mean_w1, self.mean_b1 = _dense_params(self, "mean1", flat, mid)
        self.mean_w2, self.mean_b2 = _dense_params(self, "mean2", mid, self.z_dim)
        self.std_w1, self.std_b1 = _dense_params(self, "std1", flat, mid)
        self.std_w2, self.std_b2 = _dense_params(self, "std2", mid, self.z_dim)

    def __call__(
        self, score: jax.Array, train: bool = True,
        dropout_rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        batch = score.shape[0]
        # mode="clip": an out-of-range token id (corrupt score) clamps
        # to the last table row instead of jit's NaN fill — the same
        # semantics as the fused decoder kernel's one-hot clamp
        embedded = jnp.take(self.embedding, score, axis=0,
                            mode="clip")  # (B, T, E)
        h0 = jnp.zeros(
            (self.num_layers * 2, batch, self.rnn_hidden_size), jnp.float32
        )
        if train and dropout_rng is None:
            dropout_rng = self.make_rng("dropout")
        _, h_n = gru_forward(
            self.gru_params,
            embedded,
            h0,
            bidirectional=True,
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            train=train,
        )
        # (L*D, B, H) -> (B, L*D*H), matching hidden.transpose(0,1).view(B,-1)
        hidden = jnp.transpose(h_n, (1, 0, 2)).reshape(batch, -1)
        z_mean = (
            nn.selu(hidden @ self.mean_w1 + self.mean_b1) @ self.mean_w2
            + self.mean_b2
        )
        z_log_std = (
            nn.selu(hidden @ self.std_w1 + self.std_b1) @ self.std_w2
            + self.std_b2
        )
        return z_mean, z_log_std


def _check_sampling(sampling: str) -> None:
    """The reference raises NotImplementedError on unknown sampling
    modes (decoder.py); a typo must not silently train with argmax."""
    if sampling not in ("argmax", "multinomial"):
        raise NotImplementedError(f"sampling={sampling!r}; "
                                  "use 'argmax' or 'multinomial'")


def _fused_tick_chain(seq_len, train, dropout, ticks_per_beat, sampling,
                      teacher_forced, k_drop, score, gi_beat, tick_h0, x0,
                      embedding, w_ih0, gru, out_w, out_b):
    """Invokes the fused feedback-loop kernel
    (ops/hier_decoder_pallas.hier_tick_chain) with the operand layout
    both autoregressive decoders share — ONE call site for the
    16-operand signature and the seed derivation. Batches past the
    kernel's VMEM guard run as ``fused_slices`` independent batch
    slices (sequential kernel calls, still ~2.3× the scan fallback at
    B=2048 on v5e). Returns (weights (B, T, V), samples (B, T))."""
    from arvae_tpu.ops.hier_decoder_pallas import fused_slices
    from arvae_tpu.ops.hier_decoder_pallas import hier_tick_chain

    B, E = x0.shape
    H = tick_h0.shape[-1]
    score_t = jnp.transpose(score).astype(jnp.int32)  # (T, B)
    slices = fused_slices(B, H, tick_h0.shape[1], embedding.shape[0],
                          seq_len, sampling)
    bs = B // slices
    w_parts, s_parts = [], []
    for i in range(slices):
        # per-slice seed: slices must not replay identical dropout /
        # Gumbel streams (they would at a shared seed, since the
        # in-kernel PRNG is seeded per (seed, t) only)
        seed = jax.random.randint(
            jax.random.fold_in(k_drop, 424243 + i), (), 0, 2**31 - 1,
            dtype=jnp.int32,
        )
        sl = slice(i * bs, (i + 1) * bs)
        weights_t, samples_t = hier_tick_chain(
            seq_len, bool(train), float(dropout) if train else 0.0,
            ticks_per_beat, sampling,
            jnp.asarray(teacher_forced, jnp.int32), seed,
            score_t[:, sl],
            gi_beat[:, sl], tick_h0[:, :, sl], x0[sl], embedding, w_ih0[:E],
            gru[0]["w_hh"], gru[0]["b_hh"],
            gru[1]["w_ih"], gru[1]["b_ih"],
            gru[1]["w_hh"], gru[1]["b_hh"],
            out_w, out_b,
        )
        w_parts.append(weights_t)
        s_parts.append(samples_t)
    weights_t = w_parts[0] if slices == 1 else jnp.concatenate(w_parts, 1)
    samples_t = s_parts[0] if slices == 1 else jnp.concatenate(s_parts, 1)
    return (
        jnp.transpose(weights_t, (1, 0, 2)),
        jnp.transpose(samples_t, (1, 0)),
    )


class SRDecoder(nn.Module):
    """Single-RNN autoregressive decoder (reference decoder.py:53-210).

    z is projected once (Dense → SELU → Dense) to a note-embedding-sized
    conditioning vector and concatenated to every step's input
    [prev-note embedding ‖ z embedding]; the output head is
    Dense → ReLU logits and the next input embeds either the teacher
    token or the model's own argmax/multinomial sample, with one
    teacher-forcing coin flip per batch. The reference runs the feedback
    loop as T Python-level GRU invocations; here it is one
    ``jax.lax.scan`` sharing the compiled program between the forced and
    free-running branches.
    """

    num_notes: int
    note_embedding_dim: int = 10
    rnn_hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.5
    z_dim: int = 256
    teacher_forcing_prob: float = 0.5
    sampling: str = "argmax"  # 'argmax' | 'multinomial'

    def setup(self):
        _check_sampling(self.sampling)
        H, E, V = self.rnn_hidden_size, self.note_embedding_dim, self.num_notes
        self.embedding = self.param("embedding", _XAVIER, (V, E))
        self.z2in_w1, self.z2in_b1 = _dense_params(self, "z2in1", self.z_dim, H)
        self.z2in_w2, self.z2in_b2 = _dense_params(self, "z2in2", H, E)
        self.x_0 = self.param("x_0", nn.initializers.zeros, (E,))
        self.gru = self.param(
            "gru",
            lambda rng: init_stacked_gru_params(rng, 2 * E, H,
                                                self.num_layers),
        )
        self.out_w, self.out_b = _dense_params(self, "out", H, V)

    def __call__(
        self,
        z: jax.Array,
        score: jax.Array,
        train: bool = True,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (weights (B, T, V) logits, samples (B, T))."""
        B = z.shape[0]
        T = score.shape[1]
        H, L, E = self.rnn_hidden_size, self.num_layers, self.note_embedding_dim
        if key is None:
            key = self.make_rng("sample")
        k_tf, k_drop, k_samp = jax.random.split(key, 3)

        if train:
            teacher_forced = (
                jax.random.uniform(k_tf, ()) < self.teacher_forcing_prob
            )
        else:
            teacher_forced = jnp.asarray(False)
        sampling = self.sampling if train else "argmax"

        z_emb = (
            nn.selu(z @ self.z2in_w1 + self.z2in_b1) @ self.z2in_w2
            + self.z2in_b2
        )  # (B, E), constant across steps
        x0 = jnp.broadcast_to(self.x_0[None, :], (B, E))

        # z-conditioning half of the layer-0 input projection is
        # step-constant — hoist it out of the sequential loop
        w_ih0 = self.gru[0]["w_ih"]  # (2E, 3H)
        gi_z = z_emb @ w_ih0[E:] + self.gru[0]["b_ih"]  # (B, 3H)

        from arvae_tpu.ops.hier_decoder_pallas import enabled

        if enabled(B, H, L, self.num_notes, T, sampling):
            # same fused feedback-loop kernel as the hierarchical
            # decoder: ticks_per_beat == T means one hidden init (all
            # zeros) at t=0 and the z conditioning as the single
            # "beat" row
            return _fused_tick_chain(
                T, train, self.dropout, T, sampling, teacher_forced,
                k_drop, score, gi_z[None],
                jnp.zeros((1, L, B, H), jnp.float32), x0, self.embedding,
                w_ih0, self.gru, self.out_w, self.out_b,
            )

        def step(carry, t):
            h, prev_emb = carry
            gi0 = prev_emb @ w_ih0[:E] + gi_z
            step_drop = jax.random.fold_in(k_drop, t) if train else None
            top, h = stacked_gru_step_from_gi(
                self.gru, gi0, h, self.dropout, step_drop, train
            )
            logits = nn.relu(top @ self.out_w + self.out_b)  # (B, V)
            if sampling == "multinomial":
                sampled = jax.random.categorical(
                    jax.random.fold_in(k_samp, t), logits, axis=-1
                )
            else:
                sampled = jnp.argmax(logits, axis=-1)
            next_tok = jnp.where(teacher_forced, score[:, t], sampled)
            next_tok = jax.lax.stop_gradient(next_tok.astype(jnp.int32))
            # clamp like the fused kernel (jit's default is NaN fill)
            prev_emb = jnp.take(self.embedding, next_tok, axis=0,
                                mode="clip")
            return (h, prev_emb), (logits, next_tok)

        h_init = jnp.zeros((L, B, H), jnp.float32)
        (_, _), (weights, samples) = jax.lax.scan(
            step, (h_init, x0), jnp.arange(T)
        )
        return jnp.transpose(weights, (1, 0, 2)), jnp.transpose(samples)


class SRDecoderNoInput(nn.Module):
    """Non-autoregressive single-RNN decoder (reference decoder.py:213-306).

    The tiled z projection (one Dense, no nonlinearity) is the entire
    RNN input — no token feedback, so the whole sequence is a single
    stacked-GRU pass: the ideal XLA shape (whole-sequence batched
    matmuls, nothing data-dependent in the carry).
    """

    num_notes: int
    note_embedding_dim: int = 10
    rnn_hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.5
    z_dim: int = 256
    teacher_forcing_prob: float = 0.5  # API parity; feedback-free
    sampling: str = "argmax"  # 'argmax' | 'multinomial'

    def setup(self):
        _check_sampling(self.sampling)
        H, V = self.rnn_hidden_size, self.num_notes
        self.z2in_w, self.z2in_b = _dense_params(self, "z2in", self.z_dim, H)
        self.gru = self.param(
            "gru",
            lambda rng: init_stacked_gru_params(rng, H, H, self.num_layers),
        )
        self.out_w, self.out_b = _dense_params(self, "out", H, V)

    def __call__(
        self,
        z: jax.Array,
        score: jax.Array,
        train: bool = True,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (weights (B, T, V) logits, samples (B, T))."""
        B = z.shape[0]
        T = score.shape[1]
        H, L = self.rnn_hidden_size, self.num_layers
        if key is None:
            key = self.make_rng("sample")
        k_drop, k_samp = jax.random.split(key)
        sampling = self.sampling if train else "argmax"

        rnn_in = jnp.broadcast_to(
            (z @ self.z2in_w + self.z2in_b)[:, None, :], (B, T, H)
        )
        h0 = jnp.zeros((L, B, H), jnp.float32)
        out, _ = gru_forward(
            self.gru, rnn_in, h0,
            dropout_rate=self.dropout,
            dropout_rng=k_drop if train else None,
            train=train,
        )  # (B, T, H)
        weights = nn.relu(out @ self.out_w + self.out_b)  # (B, T, V)
        if sampling == "multinomial":
            samples = jax.random.categorical(k_samp, weights, axis=-1)
        else:
            samples = jnp.argmax(weights, axis=-1)
        return weights, samples.astype(jnp.int32)


class HierarchicalDecoder(nn.Module):
    """Beat-RNN / tick-RNN hierarchical decoder
    (reference decoder.py:309-525)."""

    num_notes: int
    note_embedding_dim: int = 10
    rnn_hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.5
    z_dim: int = 256
    teacher_forcing_prob: float = 0.5
    sampling: str = "argmax"  # 'argmax' | 'multinomial'

    def setup(self):
        _check_sampling(self.sampling)
        H, L, E, V = (
            self.rnn_hidden_size,
            self.num_layers,
            self.note_embedding_dim,
            self.num_notes,
        )
        self.embedding = self.param("embedding", _XAVIER, (V, E))
        self.z2beat_w, self.z2beat_b = _dense_params(self, "z2beat",
                                                     self.z_dim, H * L)
        self.b_0 = self.param("b_0", nn.initializers.zeros, (1,))
        self.beat_gru = self.param(
            "beat_gru",
            lambda rng: init_stacked_gru_params(rng, 1, H, L),
        )
        self.beat2tickh_w, self.beat2tickh_b = _dense_params(
            self, "beat2tickh", H, H * L
        )
        self.beat2ticki_w, self.beat2ticki_b = _dense_params(
            self, "beat2ticki", H, H
        )
        self.x_0 = self.param("x_0", nn.initializers.zeros, (E,))
        self.tick_gru = self.param(
            "tick_gru",
            lambda rng: init_stacked_gru_params(rng, E + H, H, L),
        )
        self.out_w, self.out_b = _dense_params(self, "out", H, V)

    def __call__(
        self,
        z: jax.Array,
        score: jax.Array,
        train: bool = True,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (weights (B, 24, V) logits, samples (B, 24))."""
        B = z.shape[0]
        H, L, E = self.rnn_hidden_size, self.num_layers, self.note_embedding_dim
        if key is None:
            key = self.make_rng("sample")
        k_tf, k_drop, k_samp = jax.random.split(key, 3)

        # one teacher-forcing coin flip per batch (decoder.py:427-428)
        if train:
            teacher_forced = (
                jax.random.uniform(k_tf, ()) < self.teacher_forcing_prob
            )
        else:
            teacher_forced = jnp.asarray(False)
        sampling = self.sampling if train else "argmax"

        # -- beat RNN (4 steps over learned b_0) --------------------------
        h0_beat = nn.selu(z @ self.z2beat_w + self.z2beat_b)
        h0_beat = jnp.transpose(h0_beat.reshape(B, L, H), (1, 0, 2))
        beat_in = jnp.broadcast_to(
            self.b_0[None, None, :], (B, NUM_BEATS_PER_MEASURE, 1)
        )
        beat_out, _ = gru_forward(
            self.beat_gru, beat_in, h0_beat,
            dropout_rate=self.dropout,
            dropout_rng=k_drop if train else None,
            train=train,
        )  # (B, 4, H)

        # -- precompute per-beat tick initializations ----------------------
        tick_h0 = nn.selu(beat_out @ self.beat2tickh_w + self.beat2tickh_b)
        tick_h0 = jnp.transpose(
            tick_h0.reshape(B, NUM_BEATS_PER_MEASURE, L, H), (1, 2, 0, 3)
        )  # (4, L, B, H)
        beat_emb_in = nn.selu(
            beat_out @ self.beat2ticki_w + self.beat2ticki_b
        )  # (B, 4, H)
        beat_emb_in = jnp.transpose(beat_emb_in, (1, 0, 2))  # (4, B, H)

        # -- tick RNN: one scan over all 24 ticks --------------------------
        x0 = jnp.broadcast_to(self.x_0[None, :], (B, E))

        # the beat-conditioning half of the layer-0 input projection is
        # constant within a beat — hoist it out of the sequential loop
        # as one (4·B, H)@(H, 3H) matmul
        w_ih0 = self.tick_gru[0]["w_ih"]  # (E+H, 3H)
        gi_beat = (
            beat_emb_in @ w_ih0[E:] + self.tick_gru[0]["b_ih"]
        )  # (4, B, 3H)

        from arvae_tpu.ops.hier_decoder_pallas import enabled

        if enabled(B, H, L, self.num_notes, MEASURE_SEQ_LEN, sampling):
            # whole feedback loop (GRU stack, head, argmax, re-embed) as
            # one fused VMEM kernel — see ops/hier_decoder_pallas.py
            return _fused_tick_chain(
                MEASURE_SEQ_LEN, train, self.dropout, NUM_TICKS_PER_BEAT,
                sampling, teacher_forced, k_drop, score, gi_beat, tick_h0,
                x0, self.embedding, w_ih0, self.tick_gru, self.out_w,
                self.out_b,
            )

        def step(carry, t):
            h, prev_emb = carry
            ib = t // NUM_TICKS_PER_BEAT
            reset = (t % NUM_TICKS_PER_BEAT) == 0
            h = jnp.where(reset, tick_h0[ib], h)
            gi0 = prev_emb @ w_ih0[:E] + gi_beat[ib]
            step_drop = (
                jax.random.fold_in(k_drop, t + 100) if train else None
            )
            top, h = stacked_gru_step_from_gi(
                self.tick_gru, gi0, h, self.dropout, step_drop, train
            )
            logits = nn.relu(top @ self.out_w + self.out_b)  # (B, V)
            if sampling == "multinomial":
                sampled = jax.random.categorical(
                    jax.random.fold_in(k_samp, t), logits, axis=-1
                )
            else:
                sampled = jnp.argmax(logits, axis=-1)
            teacher_tok = score[:, t]
            next_tok = jnp.where(teacher_forced, teacher_tok, sampled)
            next_tok = jax.lax.stop_gradient(next_tok.astype(jnp.int32))
            # clamp like the fused kernel (jit's default is NaN fill)
            prev_emb = jnp.take(self.embedding, next_tok, axis=0,
                                mode="clip")
            return (h, prev_emb), (logits, next_tok)

        h_init = jnp.zeros((L, B, H), jnp.float32)
        (_, _), (weights, samples) = jax.lax.scan(
            step, (h_init, x0), jnp.arange(MEASURE_SEQ_LEN)
        )
        weights = jnp.transpose(weights, (1, 0, 2))  # (B, 24, V)
        samples = jnp.transpose(samples, (1, 0))  # (B, 24)
        return weights, samples


DECODER_CLASSES = {
    "hier": HierarchicalDecoder,
    "sr": SRDecoder,
    "sr-no-input": SRDecoderNoInput,
}


class MeasureVAE(nn.Module):
    """Encoder + selectable decoder VAE (reference measure_vae.py:11-166).

    ``decoder_type`` selects among the reference's three decoder
    variants: 'hier' (HierarchicalDecoder, the default and the one the
    reference actually wires in), 'sr' (SRDecoder), and 'sr-no-input'
    (SRDecoderNoInput) — reference decoder.py:53-306.
    """

    num_notes: int
    note_embedding_dim: int = 10
    num_encoder_layers: int = 2
    encoder_hidden_size: int = 512
    encoder_dropout_prob: float = 0.5
    latent_space_dim: int = 256
    num_decoder_layers: int = 2
    decoder_hidden_size: int = 512
    decoder_dropout_prob: float = 0.5
    decoder_type: str = "hier"
    sampling: str = "argmax"  # feedback sampling: 'argmax' | 'multinomial'

    def setup(self):
        self.encoder = Encoder(
            num_notes=self.num_notes,
            note_embedding_dim=self.note_embedding_dim,
            rnn_hidden_size=self.encoder_hidden_size,
            num_layers=self.num_encoder_layers,
            dropout=self.encoder_dropout_prob,
            z_dim=self.latent_space_dim,
        )
        try:
            decoder_cls = DECODER_CLASSES[self.decoder_type]
        except KeyError:
            raise ValueError(
                f"unknown decoder_type {self.decoder_type!r}; "
                f"choose from {sorted(DECODER_CLASSES)}"
            ) from None
        self.decoder = decoder_cls(
            num_notes=self.num_notes,
            note_embedding_dim=self.note_embedding_dim,
            rnn_hidden_size=self.decoder_hidden_size,
            num_layers=self.num_decoder_layers,
            dropout=self.decoder_dropout_prob,
            z_dim=self.latent_space_dim,
            sampling=self.sampling,
        )

    def encode(self, score, train: bool = True, dropout_rng=None):
        return self.encoder(score, train=train, dropout_rng=dropout_rng)

    def decode(self, z, score, train: bool = False, key=None):
        return self.decoder(z, score, train=train, key=key)

    def __call__(
        self, score: jax.Array, train: bool = True,
        rng_key: Optional[jax.Array] = None,
    ) -> MeasureVAEOutput:
        assert score.shape[1] == MEASURE_SEQ_LEN
        if rng_key is None:
            rng_key = self.make_rng("sample")
        k_enc, k_rep, k_prior, k_dec = jax.random.split(rng_key, 4)
        z_mean, z_log_std = self.encoder(
            score, train=train, dropout_rng=k_enc if train else None
        )
        z_tilde, z_prior = reparametrize_keys(
            k_rep, k_prior, z_mean, z_log_std
        )
        weights, samples = self.decoder(z_tilde, score, train=train, key=k_dec)
        return MeasureVAEOutput(
            weights=weights,
            samples=samples,
            z_mean=z_mean,
            z_log_std=z_log_std,
            z_tilde=z_tilde,
            z_prior=z_prior,
        )
