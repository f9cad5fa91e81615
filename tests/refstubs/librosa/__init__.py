"""Minimal librosa stand-in for importing the REFERENCE implementation.

The differential-parity suite (``tests/test_reference_differential.py``)
imports the reference package at ``/root/reference`` to run it side by side
with the rebuild. The reference's import graph pulls ``librosa`` at module
level, but the functions its models/conversions paths actually *call* are a
tiny arithmetic core (``tools/utils.py:294,317,556,581,931,1088,1121,
2957,2965,3321``). This stub implements exactly that core with the standard
formulas (equal-tempered A440) and raises loudly for anything else, so a
differential test can never silently exercise stub behavior it didn't mean
to.

NOT a librosa replacement — test scaffolding only.
"""

import numpy as np

from . import core, feature, filters, util  # noqa: F401

_A4_MIDI = 69.0
_A4_HZ = 440.0

_PITCH_CLASSES = {'C': 0, 'D': 2, 'E': 4, 'F': 5, 'G': 7, 'A': 9, 'B': 11}
_ACCIDENTALS = {'#': 1, 'b': -1, '!': -1, 's': 1}


def midi_to_hz(midi):
    return _A4_HZ * (2.0 ** ((np.asarray(midi, dtype=float) - _A4_MIDI) / 12.0))


def hz_to_midi(hz):
    return 12.0 * (np.log2(np.asarray(hz, dtype=float)) - np.log2(_A4_HZ)) + _A4_MIDI


def note_to_midi(note, round_midi=True):
    if not isinstance(note, str):
        return np.array([note_to_midi(n, round_midi) for n in note])

    name = note.strip()
    pitch = _PITCH_CLASSES[name[0].upper()]
    idx = 1
    while idx < len(name) and name[idx] in _ACCIDENTALS:
        pitch += _ACCIDENTALS[name[idx]]
        idx += 1
    octave = int(name[idx:]) if idx < len(name) else 0

    return 12 * (octave + 1) + pitch


def note_to_hz(note, **kwargs):
    return midi_to_hz(note_to_midi(note, **kwargs))


def frames_to_time(frames, sr=22050, hop_length=512, **_):
    return np.asarray(frames) * (hop_length / float(sr))


def time_to_frames(times, sr=22050, hop_length=512, **_):
    return np.floor(np.asarray(times) * sr / float(hop_length)).astype(int)


def _unused(name):
    def fail(*args, **kwargs):
        raise NotImplementedError(
            f'librosa.{name} is not implemented by the differential-test stub')
    return fail


load = _unused('load')
stft = _unused('stft')
vqt = _unused('vqt')
cqt_frequencies = _unused('cqt_frequencies')
