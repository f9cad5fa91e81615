"""Unit tests for the representation-conversion library (tools.utils).

Round-trip properties mirror the invertibility contracts documented in the
reference (`tools/utils.py:1029-1030, 1752-1755`) plus golden micro-fixtures.
"""

import numpy as np
import pytest

from amt_tools_tpu import tools
from amt_tools_tpu.tools import utils
from amt_tools_tpu.tools.instrument import (GuitarProfile, PianoProfile,
                                            note_to_midi, midi_to_hz, hz_to_midi)


@pytest.fixture
def piano():
    return PianoProfile()


@pytest.fixture
def guitar():
    return GuitarProfile()


def test_note_to_midi():
    assert note_to_midi('A4') == 69
    assert note_to_midi('C4') == 60
    assert note_to_midi('E2') == 40
    assert note_to_midi('F#3') == 54
    assert note_to_midi('Bb3') == 58
    np.testing.assert_array_equal(
        note_to_midi(['E2', 'A2', 'D3', 'G3', 'B3', 'E4']),
        [40, 45, 50, 55, 59, 64])


def test_midi_hz_roundtrip():
    midi = np.array([21.0, 60.0, 69.0, 108.0])
    np.testing.assert_allclose(hz_to_midi(midi_to_hz(midi)), midi, atol=1e-9)
    assert abs(midi_to_hz(69) - 440.0) < 1e-9


def test_profiles(piano, guitar):
    assert piano.get_range_len() == 88
    assert piano.get_num_dofs() == 1
    assert guitar.get_num_dofs() == 6
    assert guitar.num_pitches == 20
    assert guitar.low == 40
    # high = top string open (64) + 19 frets
    assert guitar.high == 64 + 19
    np.testing.assert_array_equal(guitar.get_midi_tuning(), [40, 45, 50, 55, 59, 64])
    assert guitar.get_pitch(0, 3) == 43
    assert guitar.get_fret(45, 1) == 0
    assert (0, 5) in guitar.get_valid_positions(45)
    assert (1, 0) in guitar.get_valid_positions(45)


def _fixture_notes():
    pitches = np.array([60.0, 64.0, 60.0])
    # Interval times deliberately off the frame grid to avoid float ties
    intervals = np.array([[0.00, 0.52],
                          [0.26, 0.77],
                          [0.61, 1.02]])
    return pitches, intervals


def test_batched_notes_roundtrip():
    pitches, intervals = _fixture_notes()
    batched = utils.notes_to_batched_notes(pitches, intervals)
    assert batched.shape == (3, 3)
    p2, i2 = utils.batched_notes_to_notes(batched)
    np.testing.assert_array_equal(p2, pitches)
    np.testing.assert_array_equal(i2, intervals)


def test_notes_multi_pitch_roundtrip(piano):
    pitches, intervals = _fixture_notes()
    hop = 0.05
    times = np.arange(0, 25) * hop  # 25 frames covering 1.2 s

    multi_pitch = utils.notes_to_multi_pitch(pitches, intervals, times, piano)
    assert multi_pitch.shape == (88, 25)

    # pitch 60 active 0.0-0.52 and 0.61-1.02; pitch 64 active 0.26-0.77
    row60 = multi_pitch[60 - piano.low]
    row64 = multi_pitch[64 - piano.low]
    assert row60[0] == 1 and row60[10] == 1  # frames 0..10 inclusive of offset
    assert row60[11] == 0  # gap between the two notes
    assert row60[12] == 1  # second note begins
    assert row64[5] == 1 and row64[15] == 1
    assert row64[4] == 0 and row64[16] == 0

    # Round-trip decode: should recover the same notes (within a frame)
    dec_pitches, dec_intervals = utils.multi_pitch_to_notes(multi_pitch, times, piano)
    assert len(dec_pitches) == 3
    order = np.lexsort((dec_pitches, dec_intervals[:, 0]))
    dec_pitches, dec_intervals = dec_pitches[order], dec_intervals[order]
    np.testing.assert_allclose(sorted(dec_pitches), sorted(pitches))
    np.testing.assert_allclose(dec_intervals[:, 0],
                               np.array([0.0, 0.26, 0.61]), atol=hop)


def test_multi_pitch_to_notes_matches_reference_loop(piano, rng):
    """The vectorized decode must equal the reference's sequential loop."""

    def reference_decode(multi_pitch, times, profile, onsets=None):
        # Direct transliteration of the reference algorithm for testing only
        if onsets is None:
            onsets = utils.multi_pitch_to_onsets(multi_pitch)
        multi_pitch = np.logical_or(onsets, multi_pitch).astype(float)
        onsets = utils.multi_pitch_to_onsets(onsets)
        num_frames = multi_pitch.shape[-1]
        times_ext = np.append(times, times[-1] + utils.estimate_hop_length(times))
        pitches, intervals = [], []
        pitch_idcs, frame_idcs = onsets.nonzero()
        for pitch, frame in zip(pitch_idcs, frame_idcs):
            onset, offset = frame, frame + 1
            while True:
                if offset == num_frames:
                    break
                if not multi_pitch[pitch, offset]:
                    break
                if onsets[pitch, offset]:
                    break
                offset += 1
            pitches.append(pitch + profile.low)
            intervals.append([times_ext[onset], times_ext[offset]])
        return (np.array(pitches, dtype=float),
                np.array(intervals).reshape(-1, 2))

    for trial in range(10):
        multi_pitch = (rng.rand(88, 50) > 0.8).astype(float)
        times = np.arange(50) * 0.02

        ref_p, ref_i = reference_decode(multi_pitch.copy(), times, piano)
        got_p, got_i = utils.multi_pitch_to_notes(multi_pitch, times, piano)

        # Compare as sorted sets of (pitch, onset, offset)
        ref = np.array(sorted(zip(ref_p, ref_i[:, 0], ref_i[:, 1])))
        got = np.array(sorted(zip(got_p, got_i[:, 0], got_i[:, 1])))
        np.testing.assert_allclose(got, ref, atol=1e-9)


def test_onsets_offsets_maps(piano):
    pitches, intervals = _fixture_notes()
    times = np.arange(0, 25) * 0.05

    multi_pitch = utils.notes_to_multi_pitch(pitches, intervals, times, piano)
    onsets = utils.multi_pitch_to_onsets(multi_pitch)
    offsets = utils.multi_pitch_to_offsets(multi_pitch)

    # Onset of first note at frame 0, second at frame 5, third at frame 12
    assert onsets[60 - piano.low, 0] == 1
    assert onsets[64 - piano.low, 5] == 1
    assert onsets[60 - piano.low, 12] == 1
    assert onsets.sum() == 3
    assert offsets.sum() == 3

    onsets2 = utils.notes_to_onsets(pitches, intervals, times, piano)
    np.testing.assert_array_equal(onsets2, onsets)


def test_pitch_list_roundtrip(piano, rng):
    multi_pitch = (rng.rand(88, 30) > 0.9).astype(float)
    pitch_list = utils.multi_pitch_to_pitch_list(multi_pitch, piano)
    assert len(pitch_list) == 30
    recon = utils.pitch_list_to_multi_pitch(pitch_list, piano)
    np.testing.assert_array_equal(recon, multi_pitch)


def test_tablature_roundtrip(guitar, rng):
    # Random tablature: -1 (silence) to num_pitches-1 per string
    tablature = rng.randint(-1, guitar.num_pitches, size=(6, 40))

    smp = utils.tablature_to_stacked_multi_pitch(tablature, guitar)
    assert smp.shape == (6, guitar.get_range_len(), 40)

    recon = utils.stacked_multi_pitch_to_tablature(smp, guitar)
    np.testing.assert_array_equal(recon, tablature)


def test_logistic_roundtrip(guitar, rng):
    tablature = rng.randint(-1, guitar.num_pitches, size=(6, 25))

    logistic = utils.tablature_to_logistic(tablature, guitar, silence=True)
    assert logistic.shape == (6 * (guitar.num_pitches + 1), 25)

    recon = utils.logistic_to_tablature(logistic, guitar, silence=True)
    np.testing.assert_array_equal(recon, tablature)

    # Without silence activation
    logistic_ns = utils.tablature_to_logistic(tablature, guitar, silence=False)
    assert logistic_ns.shape == (6 * guitar.num_pitches, 25)
    recon_ns = utils.logistic_to_tablature(logistic_ns, guitar, silence=False)
    np.testing.assert_array_equal(recon_ns, tablature)

    smp = utils.logistic_to_stacked_multi_pitch(
        utils.tablature_to_logistic(tablature, guitar, silence=True), guitar, silence=True)
    np.testing.assert_array_equal(
        smp, utils.tablature_to_stacked_multi_pitch(tablature, guitar))


def test_framify_activations(rng):
    activations = rng.rand(2, 5, 20)
    framed = utils.framify_activations(activations, win_length=9)
    assert framed.shape == (2, 5, 20, 9)
    # Window at t should be centered on t (pad = 4)
    np.testing.assert_array_equal(framed[..., 10, :], activations[..., 6:15])
    # Leading frames zero-padded
    assert np.all(framed[..., 0, :4] == 0)


def test_inhibit_activations():
    activations = np.zeros((2, 10))
    times = np.arange(10) * 0.1
    activations[0, [0, 1, 2, 7]] = 1
    activations[1, [3, 4]] = 1

    out = utils.inhibit_activations(activations.copy(), times, window_length=0.25)
    # Row 0: keep 0 (inhibits 1, 2), keep 7
    np.testing.assert_array_equal(np.nonzero(out[0])[0], [0, 7])
    # Row 1: keep 3 (inhibits 4)
    np.testing.assert_array_equal(np.nonzero(out[1])[0], [3])


def test_remove_activation_blips():
    acts = np.zeros((2, 6))
    acts[0, 2] = 1              # isolated blip -> removed
    acts[1, 2:4] = 1            # 2-frame run -> kept
    out = utils.remove_activation_blips(acts)
    assert out[0].sum() == 0
    assert out[1].sum() == 2


def test_slice_track(guitar):
    track = {
        tools.KEY_FEATS: np.ones((3, 10)),
        tools.KEY_TABLATURE: np.zeros((6, 10)),
        tools.KEY_FS: 22050,
    }
    out = utils.slice_track(track, 6, 14)
    assert out[tools.KEY_FEATS].shape == (3, 8)
    assert np.all(out[tools.KEY_FEATS][:, :4] == 1)
    assert np.all(out[tools.KEY_FEATS][:, 4:] == 0)
    # Tablature pads with -1
    assert np.all(out[tools.KEY_TABLATURE][:, 4:] == -1)
    assert out[tools.KEY_FS] == 22050


def test_stacked_notes_plumbing():
    stacked = {
        'E': (np.array([40.0]), np.array([[0.0, 1.0]])),
        'A': (np.array([45.0, 47.0]), np.array([[0.5, 1.5], [2.0, 2.5]])),
    }
    pitches, intervals = utils.stacked_notes_to_notes(stacked)
    assert len(pitches) == 3
    batched = utils.stacked_notes_to_batched_notes(
        {k: utils.notes_to_batched_notes(*v) for k, v in stacked.items()})
    assert batched.shape == (3, 3)


def test_filter_notes(piano):
    pitches = np.array([10.0, 60.0, 120.0])
    intervals = np.array([[0, 1], [0, 1], [0, 1]], dtype=float)
    p, i = utils.filter_notes(pitches, intervals, piano)
    np.testing.assert_array_equal(p, [60.0])


def test_dict_plumbing():
    track = {'a': np.ones((2, 3)), 'nested': {'b': np.zeros(4)}, 's': 'str'}
    track32 = utils.dict_to_dtype(track, 'float32')
    assert track32['a'].dtype == np.float32
    assert track32['nested']['b'].dtype == np.float32

    unsq = utils.dict_unsqueeze(track)
    assert unsq['a'].shape == (1, 2, 3)

    appended = utils.dict_append({'x': np.ones((2, 2))}, {'x': np.zeros((2, 3))})
    assert appended['x'].shape == (2, 5)


def test_estimate_hop_length():
    times = np.arange(100) * 0.029
    assert abs(utils.estimate_hop_length(times) - 0.029) < 1e-9


def test_threshold_and_normalize():
    acts = np.array([0.2, 0.5, 0.9])
    np.testing.assert_array_equal(utils.threshold_activations(acts.copy()), [0, 1, 1])
    np.testing.assert_allclose(utils.normalize_activations(np.array([0.0, 2.0, -4.0])),
                               [0, 0.5, -1.0])


def test_multi_pitch_decode_with_onsets(piano):
    """Onset-gated decode: re-onset splits a continuous activation."""

    times = np.arange(10) * 0.1
    multi_pitch = np.zeros((88, 10))
    multi_pitch[30, 0:8] = 1
    onsets = np.zeros((88, 10))
    onsets[30, 0] = 1
    onsets[30, 4] = 1

    pitches, intervals = utils.multi_pitch_to_notes(multi_pitch, times, piano, onsets=onsets)
    assert len(pitches) == 2
    np.testing.assert_allclose(intervals[0], [0.0, 0.4])
    np.testing.assert_allclose(intervals[1], [0.4, 0.8])
