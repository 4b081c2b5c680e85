"""Attribute extractors golden-tested against reference-semantics numpy."""

import numpy as np
import pytest

from arvae_tpu.data.attributes import MUSIC_REG_TYPE, MusicAttributes
from arvae_tpu.data.music_theory import (
    BEAT_STRENGTH_WEIGHTS,
    RHY_COMPLEXITY_COEFFS,
    note_name_to_midi,
    midi_to_note_name,
)

pytestmark = pytest.mark.fast

# Tiny vocab: 0=__ 1=START 2=END 3=rest then pitches
VOCAB = {0: "__", 1: "START", 2: "END", 3: "rest",
         4: "C4", 5: "E4", 6: "G4", 7: "C5", 8: "F#4"}


@pytest.fixture(scope="module")
def attrs():
    return MusicAttributes(VOCAB)


def test_pitch_name_conversion():
    assert note_name_to_midi("C4") == 60
    assert note_name_to_midi("F#5") == 78
    assert note_name_to_midi("B-3") == 58
    assert note_name_to_midi("rest") is None
    assert note_name_to_midi(None) is None
    for m in range(40, 100):
        assert note_name_to_midi(midi_to_note_name(m)) == m


def test_note_density(attrs):
    t = np.zeros((2, 24), np.int32)
    t[0, [0, 6, 12, 18]] = [4, 5, 6, 7]  # 4 notes
    t[1, 0] = 3  # a rest only
    d = np.asarray(attrs.note_density(t))
    np.testing.assert_allclose(d, [4 / 24, 0.0])


def test_pitch_range(attrs):
    t = np.zeros((3, 24), np.int32)
    t[0, [0, 12]] = [4, 7]  # C4..C5 = 12 semitones
    t[1, 0] = 4  # single note -> 0
    # row 2: no notes -> 0
    r = np.asarray(attrs.pitch_range(t))
    np.testing.assert_allclose(r, [12 / 26, 0.0, 0.0])


def test_contour_telescopes(attrs):
    t = np.zeros((1, 24), np.int32)
    t[0, [0, 6, 12]] = [4, 6, 5]  # C4 -> G4 -> E4: sum of diffs = E4-C4 = 4
    c = np.asarray(attrs.contour(t))
    np.testing.assert_allclose(c, [4 / 26])


def test_rhy_complexity(attrs):
    t = np.zeros((1, 24), np.int32)
    t[0, [0, 3]] = [4, 5]
    expected = (RHY_COMPLEXITY_COEFFS[0] + RHY_COMPLEXITY_COEFFS[3]) / (
        RHY_COMPLEXITY_COEFFS.sum()
    )
    np.testing.assert_allclose(np.asarray(attrs.rhy_complexity(t)), [expected],
                               rtol=1e-6)


def test_beat_strength_masks_only_slur(attrs):
    t = np.zeros((1, 24), np.int32)
    t[0, 0] = 4
    t[0, 1] = 3  # rest COUNTS for beat strength (reference :417-440)
    expected = BEAT_STRENGTH_WEIGHTS[0] + BEAT_STRENGTH_WEIGHTS[1]
    np.testing.assert_allclose(np.asarray(attrs.beat_strength(t)), [expected],
                               rtol=1e-6)


def test_rhythmic_entropy_is_log_onsets(attrs):
    t = np.zeros((1, 24), np.int32)
    t[0, [0, 6, 12, 18]] = 4
    np.testing.assert_allclose(np.asarray(attrs.rhythmic_entropy(t)),
                               [np.log(4.0)], rtol=1e-6)


def test_interval_entropy(attrs):
    # C4 G4 C5: intervals 7, 5 -> histogram bins 7 and 5 get 1 each
    t = np.zeros((1, 24), np.int32)
    t[0, [0, 6, 12]] = [4, 6, 7]
    h = np.zeros(12)
    h[7] += 1
    h[5] += 1
    e = np.exp(h) / np.exp(h).sum()
    expected = -(e * np.log(e)).sum()
    np.testing.assert_allclose(np.asarray(attrs.interval_entropy(t)),
                               [expected], rtol=1e-5)


def test_compute_labels_column_order(attrs):
    t = np.zeros((2, 24), np.int32)
    t[:, [0, 6, 12]] = [[4, 6, 7], [5, 6, 7]]
    labels = np.asarray(attrs.compute_labels(t))
    assert labels.shape == (2, 4)
    np.testing.assert_allclose(labels[:, MUSIC_REG_TYPE["note_density"]],
                               [3 / 24, 3 / 24])


def test_jit_and_vmap_compatible(attrs):
    import jax

    t = np.zeros((4, 24), np.int32)
    f = jax.jit(attrs.compute_labels)
    out = f(t)
    assert out.shape == (4, 4)
