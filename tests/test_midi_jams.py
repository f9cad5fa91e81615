"""Tests for the native MIDI parser and JAMS reader."""

import json
import struct

import numpy as np
import pytest

from amt_tools_tpu.tools import midi as midi_mod
from amt_tools_tpu.tools import jams_io


def _vlq(value):
    """Encode a MIDI variable-length quantity."""

    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def _write_midi(path, events, ticks_per_beat=480):
    """Assemble a format-0 SMF from (delta_ticks, raw_bytes) events."""

    track = b''
    for delta, msg in events:
        track += _vlq(delta) + msg
    track += _vlq(0) + b'\xff\x2f\x00'  # end of track

    header = b'MThd' + struct.pack('>IHHH', 6, 0, 1, ticks_per_beat)
    chunk = b'MTrk' + struct.pack('>I', len(track)) + track

    with open(path, 'wb') as f:
        f.write(header + chunk)


def test_parse_midi_basic(tmp_path):
    path = tmp_path / 'basic.mid'
    # 120 bpm default: 480 ticks = 1 beat = 0.5 s
    _write_midi(path, [
        (0, bytes([0x90, 60, 100])),    # C4 on at t=0
        (480, bytes([0x80, 60, 0])),    # C4 off at 0.5 s
        (0, bytes([0x90, 64, 90])),     # E4 on at 0.5 s
        (240, bytes([0x90, 64, 0])),    # E4 off (vel-0 note_on) at 0.75 s
    ])

    notes = midi_mod.load_notes_midi(str(path))
    assert notes.shape == (2, 4)
    np.testing.assert_allclose(notes[0], [0.0, 0.5, 60, 100], atol=1e-9)
    np.testing.assert_allclose(notes[1], [0.5, 0.75, 64, 90], atol=1e-9)


def test_parse_midi_tempo_change(tmp_path):
    path = tmp_path / 'tempo.mid'
    # Tempo 60 bpm (1e6 us/beat): 480 ticks = 1 s
    _write_midi(path, [
        (0, b'\xff\x51\x03' + struct.pack('>I', 1000000)[1:]),
        (0, bytes([0x90, 60, 100])),
        (480, bytes([0x80, 60, 0])),
    ])

    notes = midi_mod.load_notes_midi(str(path))
    np.testing.assert_allclose(notes[0], [0.0, 1.0, 60, 100], atol=1e-9)


def test_parse_midi_running_status(tmp_path):
    path = tmp_path / 'running.mid'
    _write_midi(path, [
        (0, bytes([0x90, 60, 100])),
        (10, bytes([62, 100])),        # running status: note_on 62
        (10, bytes([60, 0])),          # running status: note_on vel 0 = off
        (10, bytes([62, 0])),
    ])

    notes = midi_mod.load_notes_midi(str(path))
    assert notes.shape == (2, 4)
    assert set(notes[:, 2]) == {60, 62}


def test_sustain_pedal_extends_notes(tmp_path):
    path = tmp_path / 'sustain.mid'
    _write_midi(path, [
        (0, bytes([0xB0, 64, 127])),    # sustain on at t=0
        (0, bytes([0x90, 60, 100])),    # note on at t=0
        (480, bytes([0x80, 60, 0])),    # note released at 0.5 s (pedal down!)
        (480, bytes([0xB0, 64, 0])),    # pedal released at 1.0 s
        (0, bytes([0x90, 72, 50])),     # another note at 1.0 s
        (480, bytes([0x80, 72, 0])),    # released at 1.5 s (pedal up)
    ])

    notes = midi_mod.load_notes_midi(str(path))
    assert notes.shape == (2, 4)
    # First note held by the pedal until 1.0 s despite release at 0.5 s
    np.testing.assert_allclose(notes[0], [0.0, 1.0, 60, 100], atol=1e-9)
    np.testing.assert_allclose(notes[1], [1.0, 1.5, 72, 50], atol=1e-9)


def test_sustain_cut_by_restrike(tmp_path):
    path = tmp_path / 'restrike.mid'
    _write_midi(path, [
        (0, bytes([0xB0, 64, 127])),    # sustain on
        (0, bytes([0x90, 60, 100])),    # note on at 0
        (240, bytes([0x80, 60, 0])),    # released at 0.25 s (pedal down)
        (240, bytes([0x90, 60, 80])),   # re-struck at 0.5 s -> cuts the first
        (240, bytes([0x80, 60, 0])),    # released at 0.75 s (still sustained)
        (240, bytes([0xB0, 64, 0])),    # pedal off at 1.0 s
    ])

    notes = midi_mod.load_notes_midi(str(path))
    assert notes.shape == (2, 4)
    # First note cut at the re-strike (0.5 s), second held until pedal off
    np.testing.assert_allclose(notes[0][:2], [0.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(notes[1][:2], [0.5, 1.0], atol=1e-9)


def _make_jams(tmp_path):
    jam = {
        'file_metadata': {'duration': 2.0},
        'annotations': [
            {
                'namespace': 'note_midi',
                'annotation_metadata': {'data_source': '0'},
                'data': [
                    {'time': 0.0, 'duration': 0.5, 'value': 40.0, 'confidence': None},
                    {'time': 1.0, 'duration': 0.5, 'value': 42.0, 'confidence': None},
                ],
            },
            {
                'namespace': 'note_midi',
                'annotation_metadata': {'data_source': '1'},
                'data': [
                    {'time': 0.25, 'duration': 0.5, 'value': 45.0, 'confidence': None},
                ],
            },
            {
                'namespace': 'pitch_contour',
                'annotation_metadata': {'data_source': '0'},
                'data': [
                    {'time': 0.00, 'duration': 0.0,
                     'value': {'frequency': 110.0, 'voiced': True, 'index': 0}},
                    {'time': 0.01, 'duration': 0.0,
                     'value': {'frequency': 111.0, 'voiced': True, 'index': 0}},
                    {'time': 0.02, 'duration': 0.0,
                     'value': {'frequency': 0.0, 'voiced': False, 'index': 0}},
                ],
            },
        ],
    }
    path = tmp_path / 'test.jams'
    with open(path, 'w') as f:
        json.dump(jam, f)
    return str(path)


def test_load_stacked_notes_jams(tmp_path):
    path = _make_jams(tmp_path)
    stacked = jams_io.load_stacked_notes_jams(path)
    assert set(stacked.keys()) == {'0', '1'}
    pitches, intervals = stacked['0']
    np.testing.assert_allclose(pitches, [40.0, 42.0])
    np.testing.assert_allclose(intervals, [[0.0, 0.5], [1.0, 1.5]])


def test_load_notes_jams(tmp_path):
    path = _make_jams(tmp_path)
    pitches, intervals = jams_io.load_notes_jams(path)
    assert len(pitches) == 3
    # Sorted by onset
    np.testing.assert_allclose(intervals[:, 0], [0.0, 0.25, 1.0])


def test_load_stacked_pitch_list_jams(tmp_path):
    path = _make_jams(tmp_path)
    stacked = jams_io.load_stacked_pitch_list_jams(path, uniform=True)
    assert '0' in stacked
    times, pitch_list = stacked['0']
    # Uniform grid at hop 0.01 covering duration 2.0
    assert len(times) == len(pitch_list)
    assert abs(times[1] - times[0] - 0.01) < 1e-9
    np.testing.assert_allclose(pitch_list[0], [110.0])
    np.testing.assert_allclose(pitch_list[1], [111.0])
    # Unvoiced observation is empty
    assert len(pitch_list[2]) == 0


def test_write_read_jams_roundtrip(tmp_path):
    stacked = {
        'E': (np.array([40.0, 41.0]), np.array([[0.0, 1.0], [1.5, 2.0]])),
        'A': (np.array([45.0]), np.array([[0.5, 1.2]])),
    }
    path = str(tmp_path / 'out.jams')
    jams_io.write_stacked_notes_jams(stacked, path)

    loaded = jams_io.load_stacked_notes_jams(path)
    assert set(loaded.keys()) == {'E', 'A'}
    np.testing.assert_allclose(loaded['E'][0], stacked['E'][0])
    np.testing.assert_allclose(loaded['E'][1], stacked['E'][1], atol=1e-9)
    assert jams_io.load_duration_jams(path) == 2.0
