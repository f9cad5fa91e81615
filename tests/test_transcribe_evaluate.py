"""Tests for the estimation (transcribe) and evaluation layers."""

import os

import numpy as np
import pytest

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import PianoProfile, GuitarProfile
from amt_tools_tpu import transcribe as tr
from amt_tools_tpu import evaluate as ev


@pytest.fixture
def piano():
    return PianoProfile()


@pytest.fixture
def guitar():
    return GuitarProfile()


def _notes_fixture(piano):
    """Ground truth notes + rasterized predictions on a 50-frame grid."""

    pitches = np.array([60.0, 64.0, 67.0])
    intervals = np.array([[0.11, 0.52], [0.53, 0.92], [1.01, 1.42]])
    times = np.arange(50) * 0.032
    multi_pitch = tools.notes_to_multi_pitch(pitches, intervals, times, piano)
    return pitches, intervals, times, multi_pitch


def test_note_transcriber_roundtrip(piano):
    pitches, intervals, times, multi_pitch = _notes_fixture(piano)

    estimator = tr.NoteTranscriber(profile=piano)
    output = estimator.process_track({tools.KEY_MULTIPITCH: multi_pitch,
                                      tools.KEY_TIMES: times})

    batched = output[tools.KEY_NOTES]
    assert batched.shape == (3, 3)
    np.testing.assert_allclose(np.sort(batched[:, 2]), pitches)
    # Onsets within a frame hop of ground truth
    np.testing.assert_allclose(np.sort(batched[:, 0]), intervals[:, 0], atol=0.033)


def test_note_transcriber_min_duration(piano):
    times = np.arange(20) * 0.032
    multi_pitch = np.zeros((88, 20))
    multi_pitch[30, 5:7] = 1    # ~64 ms note
    multi_pitch[40, 5:15] = 1   # ~320 ms note

    short = tr.NoteTranscriber(profile=piano).process_track(
        {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_TIMES: times})
    assert short[tools.KEY_NOTES].shape[0] == 2

    filtered = tr.NoteTranscriber(profile=piano, minimum_duration=0.1).process_track(
        {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_TIMES: times})
    assert filtered[tools.KEY_NOTES].shape[0] == 1


def test_combo_estimator_chain(guitar):
    """TablatureWrapper -> StackedNoteTranscriber -> collapser chain."""

    times = np.arange(30) * 0.023
    tablature = np.full((6, 30), -1)
    tablature[0, 5:15] = 3
    tablature[2, 10:20] = 0

    combo = tr.ComboEstimator([
        tr.TablatureWrapper(profile=guitar),
        tr.StackedNoteTranscriber(profile=guitar),
        tr.StackedNotesCollapser(profile=guitar),
    ])

    output = combo.process_track({tools.KEY_TABLATURE: tablature,
                                  tools.KEY_TIMES: times})

    # Stacked multi pitch produced by the wrapper
    assert output[tools.KEY_MULTIPITCH].shape == (6, guitar.get_range_len(), 30)
    # Two notes decoded and collapsed
    batched = output[tools.KEY_NOTES]
    assert batched.shape == (2, 3)
    assert set(batched[:, 2]) == {43.0, 50.0}  # E+3 frets, D string open


def test_estimator_write(piano, tmp_path):
    _, _, times, multi_pitch = _notes_fixture(piano)

    estimator = tr.NoteTranscriber(profile=piano, save_dir=str(tmp_path))
    estimator.process_track({tools.KEY_MULTIPITCH: multi_pitch,
                             tools.KEY_TIMES: times}, track='test_track')

    path = tmp_path / 'test_track.txt'
    assert path.exists()
    lines = path.read_text().strip().split('\n')
    assert len(lines) == 3


def test_iterative_transcriber_matches_offline(piano):
    """Frame-at-a-time decoding must equal offline decoding."""

    _, _, times, multi_pitch = _notes_fixture(piano)

    offline = tr.NoteTranscriber(profile=piano).process_track(
        {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_TIMES: times})

    iterative = tr.IterativeNoteTranscriber(profile=piano)
    chunks = []
    for t in range(len(times)):
        out = iterative.process_track({
            tools.KEY_MULTIPITCH: multi_pitch[:, t:t + 1],
            tools.KEY_TIMES: times[t:t + 1]})
        chunks.append(out[tools.KEY_NOTES].reshape(-1, 3))
    # Flush any still-active notes at the end of the stream
    final = iterative.get_active_stacked_notes(times[-1] + 0.032)
    for pitches, intervals in final.values():
        chunks.append(tools.notes_to_batched_notes(pitches, intervals))

    online = np.concatenate(chunks, axis=0)
    offline_notes = offline[tools.KEY_NOTES]

    assert online.shape == offline_notes.shape
    # Same note sets (sort both by onset, pitch)
    online = online[np.lexsort((online[:, 2], online[:, 0]))]
    offline_notes = offline_notes[np.lexsort((offline_notes[:, 2], offline_notes[:, 0]))]
    np.testing.assert_allclose(online, offline_notes, atol=1e-9)


def test_multi_pitch_refiner(piano):
    pitches, intervals, times, multi_pitch = _notes_fixture(piano)

    combo = tr.ComboEstimator([
        tr.NoteTranscriber(profile=piano),
        tr.MultiPitchRefiner(profile=piano),
    ])
    output = combo.process_track({tools.KEY_MULTIPITCH: multi_pitch,
                                  tools.KEY_TIMES: times})

    refined = output[tools.KEY_MULTIPITCH]
    assert refined.shape == multi_pitch.shape
    # Re-rasterization is offset-frame-inclusive (reference semantics), so the
    # refined map covers the original plus at most one extra frame per note
    assert np.all(refined >= multi_pitch)
    assert refined.sum() - multi_pitch.sum() <= 3


def test_onsets_offsets_wrappers(guitar):
    times = np.arange(10) * 0.023
    smp = np.zeros((6, guitar.get_range_len(), 10))
    smp[0, 3, 2:5] = 1

    onsets = tr.StackedOnsetsWrapper(profile=guitar).process_track(
        {tools.KEY_MULTIPITCH: smp, tools.KEY_TIMES: times})[tools.KEY_ONSETS]
    offsets = tr.StackedOffsetsWrapper(profile=guitar).process_track(
        {tools.KEY_MULTIPITCH: smp, tools.KEY_TIMES: times})[tools.KEY_OFFSETS]

    assert onsets[0, 3, 2] == 1 and onsets.sum() == 1
    assert offsets[0, 3, 4] == 1 and offsets.sum() == 1


def test_pitch_list_wrapper(piano):
    _, _, times, multi_pitch = _notes_fixture(piano)

    out = tr.PitchListWrapper(profile=piano).process_track(
        {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_TIMES: times})
    pl_times, pitch_list = out[tools.KEY_PITCHLIST]
    assert len(pl_times) == len(pitch_list) == len(times)


##################################################
# EVALUATORS                                     #
##################################################


def test_multipitch_evaluator_perfect(piano):
    _, _, times, multi_pitch = _notes_fixture(piano)

    evaluator = ev.MultipitchEvaluator()
    results = evaluator.evaluate(multi_pitch, multi_pitch)

    assert abs(results[tools.KEY_F1] - 1.0) < 1e-9
    assert abs(results[tools.KEY_PRECISION] - 1.0) < 1e-9


def test_multipitch_evaluator_counts():
    est = np.zeros((4, 10)); ref = np.zeros((4, 10))
    ref[0, :4] = 1          # 4 ground truth
    est[0, :2] = 1          # 2 predicted, both correct
    est[1, :2] = 1          # 2 predicted, wrong

    results = ev.MultipitchEvaluator().evaluate(est, ref)
    assert abs(results[tools.KEY_PRECISION] - 0.5) < 1e-6
    assert abs(results[tools.KEY_RECALL] - 0.5) < 1e-6


def test_note_evaluator(piano):
    pitches, intervals, times, multi_pitch = _notes_fixture(piano)
    ref_batched = tools.notes_to_batched_notes(pitches, intervals)

    est = tr.NoteTranscriber(profile=piano).process_track(
        {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_TIMES: times})

    evaluator = ev.NoteEvaluator()
    results = evaluator.evaluate(est[tools.KEY_NOTES], ref_batched)
    assert results[tools.KEY_F1] == 1.0

    # With offsets
    evaluator_off = ev.NoteEvaluator(offset_ratio=0.2)
    results_off = evaluator_off.evaluate(est[tools.KEY_NOTES], ref_batched)
    assert results_off[tools.KEY_F1] >= 0.5


def test_tablature_evaluator(guitar):
    tabs_ref = np.full((6, 20), -1)
    tabs_ref[0, 5:15] = 3

    evaluator = ev.TablatureEvaluator(profile=guitar)
    perfect = evaluator.evaluate(tabs_ref, tabs_ref)
    assert abs(perfect[tools.KEY_F1] - 1.0) < 1e-6
    assert abs(perfect[tools.KEY_TDR] - 1.0) < 1e-6

    # Same pitch but wrong string: pitch correct, tablature wrong -> TDR 0
    tabs_est = np.full((6, 20), -1)
    tabs_est[1, 5:15] = guitar.get_pitch(0, 3) - guitar.get_midi_tuning()[1]
    wrong_string = evaluator.evaluate(tabs_est, tabs_ref)
    assert wrong_string[tools.KEY_TDR] < 1e-6
    assert wrong_string[tools.KEY_F1] < 1e-6


def test_softmax_accuracy(guitar):
    tabs = np.full((6, 10), -1)
    tabs[0, :5] = 3

    acc = ev.SoftmaxAccuracy().evaluate(tabs, tabs)
    assert acc[tools.KEY_ACCURACY] == 1.0

    tabs_est = tabs.copy()
    tabs_est[0, 0] = 4
    acc = ev.SoftmaxAccuracy().evaluate(tabs_est, tabs)
    assert abs(acc[tools.KEY_ACCURACY] - 59 / 60) < 1e-9


def test_combo_evaluator_and_tracking(piano):
    pitches, intervals, times, multi_pitch = _notes_fixture(piano)
    ref_batched = tools.notes_to_batched_notes(pitches, intervals)

    combo = ev.ComboEvaluator([ev.MultipitchEvaluator(), ev.NoteEvaluator()])

    est = {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_NOTES: ref_batched}
    ref = {tools.KEY_MULTIPITCH: multi_pitch, tools.KEY_NOTES: ref_batched}

    # Two tracks
    combo.process_track(est, ref, 'track1')
    combo.process_track(est, ref, 'track2')

    average = combo.average_results()
    assert abs(average[tools.KEY_MULTIPITCH][tools.KEY_F1] - 1.0) < 1e-9
    assert abs(average[tools.KEY_NOTES][tools.KEY_F1] - 1.0) < 1e-9

    # Results reset
    combo.reset_results()
    assert combo.average_results()[tools.KEY_MULTIPITCH] == {}


def test_loss_wrapper():
    wrapper = ev.LossWrapper()
    results = wrapper.process_track(
        {tools.KEY_LOSS: {tools.KEY_LOSS_TOTAL: np.float32(1.5)}}, None)
    assert float(results[tools.KEY_LOSS_TOTAL]) == 1.5


def test_stacked_note_evaluator(guitar):
    stacked = {0: (np.array([43.0]), np.array([[0.1, 0.5]])),
               1: (np.array([50.0]), np.array([[0.2, 0.6]]))}

    evaluator = ev.StackedNoteEvaluator()
    results = evaluator.evaluate(stacked, stacked)
    assert results[0][tools.KEY_F1] == 1.0
    assert results[1][tools.KEY_F1] == 1.0


def test_results_plumbing():
    r1 = {'a': 0.5, 'nested': {'b': 1.0}}
    r2 = {'a': 1.0, 'nested': {'b': 0.0}}

    tracked = ev.append_results({}, r1)
    tracked = ev.append_results(tracked, r2)
    average = ev.average_results(tracked)
    assert average['a'] == 0.75
    assert average['nested']['b'] == 0.5

    assert ev.pattern_match('f1-score', ['f1', 'pr'])
    assert not ev.pattern_match('recall', ['f1'])


def test_pitch_list_evaluator(piano):
    times = np.arange(10) * 0.032
    pitch_list = [np.array([60.0]) if 2 <= t <= 7 else np.array([]) for t in range(10)]

    evaluator = ev.PitchListEvaluator()
    perfect = evaluator.evaluate((times, pitch_list), (times, pitch_list))
    # Results keyed by tolerance (default 0.5 semitones)
    assert abs(perfect['0.5'][tools.KEY_F1] - 1.0) < 1e-9

    # Quarter-tone-off estimates still match at the 0.5-semitone tolerance
    detuned = [p + 0.25 if len(p) else p for p in pitch_list]
    near = evaluator.evaluate((times, detuned), (times, pitch_list))
    assert abs(near['0.5'][tools.KEY_F1] - 1.0) < 1e-9

    # A wrong-pitch estimate fails
    wrong = [p + 3 if len(p) else p for p in pitch_list]
    off = evaluator.evaluate((times, wrong), (times, pitch_list))
    assert off['0.5'][tools.KEY_F1] == 0.0


def test_stacked_pitch_list_evaluator(guitar):
    times = np.arange(8) * 0.023
    stacked = {
        0: (times, [np.array([40.0])] * 8),
        1: (times, [np.array([45.0])] * 8),
    }

    evaluator = ev.StackedPitchListEvaluator(pitch_tolerances=[0.5, 0.25])
    results = evaluator.evaluate(stacked, stacked)
    for slc in (0, 1):
        assert abs(results[slc]['0.5'][tools.KEY_F1] - 1.0) < 1e-9
        assert abs(results[slc]['0.25'][tools.KEY_F1] - 1.0) < 1e-9


def test_device_note_transcriber_matches_host():
    """DeviceNoteTranscriber == NoteTranscriber (no inhibition), bit-for-bit."""

    from amt_tools_tpu.transcribe import NoteTranscriber, DeviceNoteTranscriber
    from amt_tools_tpu.tools.instrument import PianoProfile
    from amt_tools_tpu import tools

    profile = PianoProfile()
    rng = np.random.RandomState(3)

    for trial in range(3):
        mp = (rng.rand(profile.get_range_len(), 40) > 0.9).astype(np.float32)
        onsets = (mp * (rng.rand(*mp.shape) > 0.5)).astype(np.float32) \
            if trial else None
        times = np.arange(40) * 0.032

        track = {tools.KEY_MULTIPITCH: mp, tools.KEY_TIMES: times}
        if onsets is not None:
            track[tools.KEY_ONSETS] = onsets

        min_dur = 0.05 if trial == 2 else None
        host = NoteTranscriber(profile=profile, minimum_duration=min_dur)
        device = DeviceNoteTranscriber(profile=profile, minimum_duration=min_dur)

        want = host.process_track(dict(track), 'x')[tools.KEY_NOTES]
        got = device.process_track(dict(track), 'x')[tools.KEY_NOTES]

        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tablature_evaluator_matches_onehot_formulation():
    """Class-id metric == the reference's one-hot expansion, on random tabs."""

    from amt_tools_tpu.evaluate import TablatureEvaluator, f_measure, EPSILON
    from amt_tools_tpu.tools.instrument import GuitarProfile
    from amt_tools_tpu import tools

    profile = GuitarProfile(num_frets=19)
    evaluator = TablatureEvaluator(profile=profile)
    rng = np.random.RandomState(7)

    for _ in range(5):
        est = rng.randint(-1, profile.num_pitches, (6, 40))
        ref = rng.randint(-1, profile.num_pitches, (6, 40))

        got = evaluator.evaluate(est, ref)

        # Reference formulation: flattened one-hot logistic intersection +
        # collapsed binary pitch-map intersection
        lo_est = tools.tablature_to_logistic(est, profile, silence=False)
        lo_ref = tools.tablature_to_logistic(ref, profile, silence=False)
        n_pred = np.sum(lo_est)
        n_gt = np.sum(lo_ref)
        n_tab = np.sum(lo_est * lo_ref)

        mp_est = tools.stacked_multi_pitch_to_multi_pitch(
            tools.tablature_to_stacked_multi_pitch(est, profile))
        mp_ref = tools.stacked_multi_pitch_to_multi_pitch(
            tools.tablature_to_stacked_multi_pitch(ref, profile))
        n_mp = np.sum(mp_est * mp_ref)

        np.testing.assert_allclose(got[tools.KEY_PRECISION],
                                   n_tab / (n_pred + EPSILON))
        np.testing.assert_allclose(got[tools.KEY_RECALL],
                                   n_tab / (n_gt + EPSILON))
        np.testing.assert_allclose(got[tools.KEY_TDR],
                                   n_tab / (n_mp + EPSILON))
