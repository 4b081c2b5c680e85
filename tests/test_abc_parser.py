"""ABC parser tests on hand-written fixture tunes."""

import numpy as np

from arvae_tpu.data.abc_parser import (
    is_valid_folk_tune,
    key_accidentals,
    parse_abc,
)

import pytest

pytestmark = pytest.mark.fast

SIMPLE = """X:1
T:Test Tune
M:4/4
L:1/4
K:C
CDEF|GABc|
"""

DMAJOR = """X:2
T:D Major Scale
M:4/4
L:1/8
K:D
DEFG ABcd|
"""

REPEAT = """X:3
T:Repeated
M:4/4
L:1/4
K:C
|:CDEF:|
"""

ENDINGS = """X:4
T:Endings
M:4/4
L:1/4
K:C
|:CDEF|1GGGG:|2AAAA|
"""

RHYTHM = """X:5
T:Rhythms
M:4/4
L:1/8
K:C
C2D2 E/2F/2E/2F/2 G4|
"""

TRIPLET = """X:6
T:Triplets
M:4/4
L:1/8
K:C
(3CDE (3CDE C2C2 z4|
"""

ACCIDENTALS = """X:7
T:Accidentals
M:4/4
L:1/4
K:C
^CF=FC|FCFC|
"""


def midis(score):
    return [n[0] for n in score.notes if n[0] >= 0]


class TestKeys:
    def test_major_keys(self):
        assert key_accidentals("C") == {}
        assert key_accidentals("G") == {"F": 1}
        assert key_accidentals("D") == {"F": 1, "C": 1}
        assert key_accidentals("F") == {"B": -1}
        assert key_accidentals("Eb") == {"B": -1, "E": -1, "A": -1}

    def test_modes(self):
        # A dorian and E minor share G major's one sharp
        assert key_accidentals("Ador") == {"F": 1}
        assert key_accidentals("Em") == {"F": 1}
        assert key_accidentals("Amin") == {}
        assert key_accidentals("Dmix") == {"F": 1}


class TestParsing:
    def test_simple_scale(self):
        _, score = parse_abc(SIMPLE)
        assert midis(score) == [60, 62, 64, 65, 67, 69, 71, 72]
        starts = [n[1] for n in score.notes]
        np.testing.assert_allclose(starts, np.arange(8.0))

    def test_key_signature_applied(self):
        _, score = parse_abc(DMAJOR)
        # D E F# G A B c# d
        assert midis(score) == [62, 64, 66, 67, 69, 71, 73, 74]

    def test_unit_length(self):
        _, score = parse_abc(DMAJOR)
        durs = {n[2] for n in score.notes}
        assert durs == {0.5}  # L:1/8 -> eighth = 0.5 quarters

    def test_repeat_expansion(self):
        _, score = parse_abc(REPEAT)
        assert midis(score) == [60, 62, 64, 65] * 2
        assert score.highest_time == 8.0

    def test_first_second_endings(self):
        _, score = parse_abc(ENDINGS)
        assert midis(score) == (
            [60, 62, 64, 65] + [67] * 4 + [60, 62, 64, 65] + [69] * 4
        )

    def test_durations_and_fractions(self):
        _, score = parse_abc(RHYTHM)
        durs = [n[2] for n in score.notes]
        np.testing.assert_allclose(durs, [1.0, 1.0, 0.25, 0.25, 0.25, 0.25,
                                          2.0])

    def test_triplets_on_grid(self):
        _, score = parse_abc(TRIPLET)
        durs = [round(n[2], 6) for n in score.notes if n[0] >= 0]
        assert durs[:3] == [round(1 / 3, 6)] * 3
        # rest present with duration 2 quarters
        rests = [n for n in score.notes if n[0] < 0]
        assert len(rests) == 1 and rests[0][2] == 2.0

    def test_bar_persistent_accidentals(self):
        _, score = parse_abc(ACCIDENTALS)
        # bar 1: ^C F =F C(sharp persists) ; bar 2: F C F C natural again
        assert midis(score) == [61, 65, 65, 61, 65, 60, 65, 60]


class TestRealCorpusEdges:
    """Constructs common in real folk corpora (thesession/Nottingham)."""

    def test_implicit_repeat_from_start(self):
        # a bare ':|' with no '|:' repeats from the tune start
        _, score = parse_abc(SIMPLE.replace("CDEF|GABc|", "CDEF|GABc:|"))
        assert midis(score) == [60, 62, 64, 65, 67, 69, 71, 72] * 2

    def test_first_ending_without_second_keeps_order(self):
        # |: A :|1 B :| C  ->  A B A C (the trailing bar stays last)
        _, score = parse_abc(
            SIMPLE.replace("CDEF|GABc|", "|:CDEF|1GGGG:|AAAA|")
        )
        assert midis(score) == (
            [60, 62, 64, 65] + [67] * 4 + [60, 62, 64, 65] + [69] * 4
        )

    def test_tie_across_barline_merges(self):
        _, score = parse_abc(SIMPLE.replace("CDEF|GABc|", "CDEE-|EGGc|"))
        pitched = [n for n in score.notes if n[0] >= 0]
        assert len(pitched) == 7  # E- | E merged into one 2-quarter note
        merged = [n for n in pitched if n[2] == 2.0]
        assert len(merged) == 1 and merged[0][0] == 64

    def test_lyric_and_part_lines_not_tokenized(self):
        _, score = parse_abc(SIMPLE.replace(
            "CDEF|GABc|", "P:A\nCDEF|GABc|\nw:as I roved out\n"
        ))
        assert midis(score) == [60, 62, 64, 65, 67, 69, 71, 72]

    def test_mid_tune_meter_change_rejected(self, tmp_path):
        p = tmp_path / "mm.abc"
        p.write_text(SIMPLE.replace("CDEF|GABc|", "CDEF|\nM:6/8\nGAB|"))
        assert not is_valid_folk_tune(str(p))

    def test_bracket_chord_rejected(self, tmp_path):
        p = tmp_path / "ch.abc"
        p.write_text(SIMPLE.replace("CDEF", "[CEG]F"))
        assert not is_valid_folk_tune(str(p))

    def test_bracket_in_title_ok(self, tmp_path):
        p = tmp_path / "ti.abc"
        p.write_text(SIMPLE.replace("T:Test Tune", "T:[Air] Test Tune"))
        assert is_valid_folk_tune(str(p))


class TestValidation:
    def test_valid_tune(self, tmp_path):
        p = tmp_path / "a.abc"
        p.write_text(SIMPLE)
        assert is_valid_folk_tune(str(p))

    def test_rejects_chords(self, tmp_path):
        p = tmp_path / "b.abc"
        p.write_text(SIMPLE.replace("CDEF", '"C"CDEF'))
        assert not is_valid_folk_tune(str(p))

    def test_rejects_non_44(self, tmp_path):
        p = tmp_path / "c.abc"
        p.write_text(SIMPLE.replace("M:4/4", "M:6/8"))
        assert not is_valid_folk_tune(str(p))

    def test_rejects_multivoice(self, tmp_path):
        p = tmp_path / "d.abc"
        p.write_text(SIMPLE + "V:2\nCCCC|\n")
        assert not is_valid_folk_tune(str(p))

    def test_rejects_no_title(self, tmp_path):
        p = tmp_path / "e.abc"
        p.write_text(SIMPLE.replace("T:Test Tune\n", ""))
        assert not is_valid_folk_tune(str(p))
