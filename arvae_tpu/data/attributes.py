"""Tensorized music attribute extractors (pure jnp, jit/vmap-friendly).

The reference computes these per batch inside the training loop with
Python loops over music21 pitch objects (``bar_dataset.py:338-542`` —
``get_pitch_range_in_measure`` and ``get_contour`` are O(B·24) Python
per batch, flagged as a hot spot in SURVEY.md §3.2). Here a vocabulary
is compiled once into static lookup tables (token → MIDI pitch,
token → is-note mask) and every extractor becomes a masked tensor
reduction that fuses into the jitted train step.

Semantics parity notes:
- ``contour``: the reference sums consecutive note-pitch differences,
  which telescopes to (last note − first note) / 26; computed that way.
- ``rhythmic_entropy``: scipy ``stats.entropy`` of the 0/1 onset
  column normalizes it to a uniform distribution over onsets, i.e.
  ln(#onsets).
- all extractors return 0 for measures with < 2 notes where the
  reference does (range/contour/interval entropy).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from arvae_tpu.data.music_theory import (
    BEAT_STRENGTH_WEIGHTS,
    RHY_COMPLEXITY_COEFFS,
    SLUR_SYMBOL,
    note_name_to_midi,
)

# Order matches reference MUSIC_REG_TYPE (measure_vae_trainer.py:15-20)
MUSIC_REG_TYPE = {
    "rhy_complexity": 0,
    "pitch_range": 1,
    "note_density": 2,
    "contour": 3,
}


class MusicAttributes:
    """Static vocab tables + jnp attribute extractors."""

    def __init__(self, index2note: Dict[int, str]):
        vocab_size = max(index2note.keys()) + 1
        midi = np.full((vocab_size,), -1, dtype=np.int32)
        special = np.zeros((vocab_size,), dtype=bool)
        slur_idx = -1
        for idx, name in index2note.items():
            m = note_name_to_midi(name)
            if m is None:
                special[idx] = True
                if name == SLUR_SYMBOL:
                    slur_idx = idx
            else:
                midi[idx] = m
        self.vocab_size = vocab_size
        self.midi_table = jnp.asarray(midi)
        self.is_note_table = jnp.asarray(~special)
        self.slur_index = slur_idx
        self.rhy_coeffs = jnp.asarray(RHY_COMPLEXITY_COEFFS)
        self.beat_weights = jnp.asarray(BEAT_STRENGTH_WEIGHTS)

    # -- masks ---------------------------------------------------------------

    def note_mask(self, t: jax.Array) -> jax.Array:
        """(B, T) bool: token is an actual pitch (onset)."""
        return jnp.take(self.is_note_table, t, axis=0)

    def note_midi(self, t: jax.Array) -> jax.Array:
        """(B, T) int32 MIDI pitch, -1 on non-notes."""
        return jnp.take(self.midi_table, t, axis=0)

    # -- extractors (reference bar_dataset.py:338-542) -----------------------

    def note_density(self, t: jax.Array) -> jax.Array:
        """#notes / seq_len (reference :338-358)."""
        return jnp.mean(self.note_mask(t).astype(jnp.float32), axis=1)

    def pitch_range(self, t: jax.Array) -> jax.Array:
        """(max − min MIDI)/26, 0 if < 2 notes (reference :360-390)."""
        mask = self.note_mask(t)
        midi = self.note_midi(t)
        big = jnp.where(mask, midi, -(10**6))
        small = jnp.where(mask, midi, 10**6)
        rng = (jnp.max(big, axis=1) - jnp.min(small, axis=1)).astype(jnp.float32)
        enough = jnp.sum(mask, axis=1) >= 2
        return jnp.where(enough, rng, 0.0) / 26.0

    def contour(self, t: jax.Array) -> jax.Array:
        """(last − first note MIDI)/26, 0 if < 2 notes (reference :470-500,
        telescoped sum of consecutive intervals)."""
        mask = self.note_mask(t)
        midi = self.note_midi(t).astype(jnp.float32)
        T = t.shape[1]
        first_idx = jnp.argmax(mask, axis=1)
        last_idx = T - 1 - jnp.argmax(mask[:, ::-1], axis=1)
        first = jnp.take_along_axis(midi, first_idx[:, None], axis=1)[:, 0]
        last = jnp.take_along_axis(midi, last_idx[:, None], axis=1)[:, 0]
        enough = jnp.sum(mask, axis=1) >= 2
        return jnp.where(enough, last - first, 0.0) / 26.0

    def rhy_complexity(self, t: jax.Array) -> jax.Array:
        """Toussaint-weighted onset sum / Σweights (reference :442-468)."""
        onsets = self.note_mask(t).astype(jnp.float32)
        return onsets @ self.rhy_coeffs / jnp.sum(self.rhy_coeffs)

    def beat_strength(self, t: jax.Array) -> jax.Array:
        """Beat-position-weighted non-slur mask (reference :417-440 —
        note the reference masks ONLY the slur symbol here)."""
        mask = (t != self.slur_index).astype(jnp.float32)
        return mask @ self.beat_weights

    def rhythmic_entropy(self, t: jax.Array) -> jax.Array:
        """ln(#onsets) — scipy entropy of the normalized 0/1 onset column
        (reference :392-415)."""
        count = jnp.sum(self.note_mask(t), axis=1).astype(jnp.float32)
        return jnp.where(count > 0, jnp.log(jnp.maximum(count, 1.0)), 0.0)

    def interval_entropy(self, t: jax.Array) -> jax.Array:
        """Softmax entropy of the mod-12 interval histogram
        (reference :502-542)."""
        mask = self.note_mask(t)
        midi = self.note_midi(t)

        def per_row(mask_r, midi_r):
            T = mask_r.shape[0]

            def step(prev, x):
                m, p = x
                interval = jnp.where(
                    m & (prev >= 0), jnp.abs(p - prev) % 12, -1
                )
                new_prev = jnp.where(m, p, prev)
                return new_prev, interval

            _, intervals = jax.lax.scan(step, jnp.int32(-1), (mask_r, midi_r))
            valid = intervals >= 0
            hist = jnp.zeros((12,), jnp.float32).at[
                jnp.where(valid, intervals, 0)
            ].add(valid.astype(jnp.float32))
            logp = jax.nn.log_softmax(hist)
            p = jax.nn.softmax(hist)
            ent = -jnp.sum(p * logp)
            enough = jnp.sum(mask_r) >= 2
            return jnp.where(enough, ent, 0.0)

        return jax.vmap(per_row)(mask, midi)

    # -- batch labels ---------------------------------------------------------

    def compute_labels(
        self, t: jax.Array, attr_list: Sequence[str] = None
    ) -> jax.Array:
        """(B, A) attribute matrix in MUSIC_REG_TYPE column order
        (reference measure_vae_trainer.py:167-186)."""
        if attr_list is None:
            attr_list = list(MUSIC_REG_TYPE.keys())
        fns = {
            "rhy_complexity": self.rhy_complexity,
            "pitch_range": self.pitch_range,
            "note_density": self.note_density,
            "contour": self.contour,
            "beat_strength": self.beat_strength,
            "rhythmic_entropy": self.rhythmic_entropy,
            "interval_entropy": self.interval_entropy,
        }
        cols = [fns[a](t) for a in attr_list]
        return jnp.stack(cols, axis=1)
