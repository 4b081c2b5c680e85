"""Round-trip and format-robustness tests for the native MIDI IO
(``arvae_tpu/utils/midi.py`` — the pypianoroll/music21 replacement,
reference uses music21's converter for this surface).
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arvae_tpu.utils.midi import notes_to_pianoroll, read_midi, write_midi
import pytest

pytestmark = pytest.mark.fast


def test_write_read_roundtrip(tmp_path):
    notes = [(60, 0.0, 1.0), (64, 1.0, 0.5), (67, 1.5, 2.0)]
    fp = str(tmp_path / "t.mid")
    write_midi(notes, fp)
    back = read_midi(fp)
    assert len(back) == 3
    for (p0, s0, d0), (p1, s1, d1) in zip(sorted(notes, key=lambda n: n[1]),
                                          back):
        assert p0 == p1
        assert abs(s0 - s1) < 1e-6
        assert abs(d0 - d1) < 1e-6


def test_read_skips_one_byte_channel_messages(tmp_path):
    """Program Change (0xC0) and Channel Pressure (0xD0) carry ONE data
    byte; a 2-byte skip desyncs every following event."""
    division = 480
    track = bytes(
        [0x00, 0xC0, 0x05]            # program change -> instrument 5
        + [0x00, 0x90, 60, 90]        # note on C4
        + [0x00, 0xD0, 0x40]          # channel pressure
        + [0x83, 0x60, 0x80, 60, 0]   # delta 480, note off C4
        + [0x00, 0xFF, 0x2F, 0x00]    # end of track
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
        + b"MTrk" + struct.pack(">I", len(track)) + track
    )
    fp = str(tmp_path / "pc.mid")
    with open(fp, "wb") as f:
        f.write(data)
    notes = read_midi(fp)
    assert notes == [(60, 0.0, 1.0)]


def test_pianoroll_shape():
    roll = notes_to_pianoroll([(60, 0.0, 1.0)], ticks_per_quarter=6)
    assert roll.shape == (6, 128)
    assert roll[:, 60].sum() == 6
    assert np.sum(roll) == 6


def test_read_skips_sysex_payload(tmp_path):
    """SysEx (0xF0/0xF7) events carry a variable-length payload; a
    fixed 2-byte skip desyncs the parser on externally produced files."""
    division = 480
    track = bytes(
        [0x00, 0xF0, 0x03, 0x7E, 0x7F, 0xF7]  # 3-byte SysEx payload
        + [0x00, 0x90, 60, 90]                # note on C4
        + [0x83, 0x60, 0xF7, 0x01, 0x00]      # delta 480, escape SysEx
        + [0x00, 0x80, 60, 0]                 # note off C4
        + [0x00, 0xFF, 0x2F, 0x00]            # end of track
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
        + b"MTrk" + struct.pack(">I", len(track)) + track
    )
    fp = str(tmp_path / "sysex.mid")
    with open(fp, "wb") as f:
        f.write(data)
    notes = read_midi(fp)
    assert notes == [(60, 0.0, 1.0)]
