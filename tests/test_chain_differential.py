"""Estimator/Evaluator CHAIN differentials: reference classes vs the rebuild.

``test_reference_differential.py`` compares losses, forwards, and the
conversion library; these tests run the reference's ESTIMATOR and EVALUATOR
classes themselves (``/root/reference/amt_tools/transcribe.py:170-1363``,
``evaluate.py:288-1344`` — pure numpy + tools, importable through the
refstubs) against the rebuild's chains on identical prediction dictionaries,
so the orchestration layer (unpack keys, stacking conventions, slice
averaging, option plumbing) is pinned by execution rather than by reading.

The one known behavioral divergence — ``StackedNoteTranscriber`` inhibiting
CALLER-PROVIDED onsets (the reference only inhibits its derived-onset
fallback, ``transcribe.py:464-469``) — is asserted AS a divergence
(PARITY.md ledger) so a silent change on either side is caught.

The mir_eval stub delegates ``precision_recall_f1_overlap`` to the rebuild's
``metrics.py`` (see ``refstubs/mir_eval/transcription.py``): the note-chain
comparisons therefore pin the reference's plumbing around the matcher, not
an independent matcher implementation.
"""

import numpy as np
import pytest

import refcompat
from amt_tools_tpu import tools
from amt_tools_tpu import transcribe as my_transcribe
from amt_tools_tpu import evaluate as my_evaluate
from amt_tools_tpu.tools.instrument import GuitarProfile, PianoProfile

pytest.importorskip('torch')

ref = refcompat.load_reference()
rtools = ref.tools


# ---------------------------------------------------------------------------
# fixtures


def _random_multi_pitch(rng, dim_out, frames, density=0.12):
    """Random activation map with note-like runs (not isolated cells)."""

    acts = (rng.rand(dim_out, frames) > (1 - density)).astype(np.float64)
    # Smear activations to the right so multi-frame notes exist
    acts[:, 1:] = np.maximum(acts[:, 1:], acts[:, :-1])
    acts[:, 2:] = np.maximum(acts[:, 2:], acts[:, :-2])

    return acts


def _times(frames, hop=512, fs=22050):
    return np.arange(frames) * hop / fs


def _canon(pitches, intervals):
    pitches = np.asarray(pitches, dtype=np.float64).ravel()
    intervals = np.asarray(intervals, dtype=np.float64).reshape(-1, 2)
    order = np.lexsort((pitches, intervals[:, 1], intervals[:, 0]))

    return np.column_stack([intervals[order], pitches[order]])


def _assert_notes_equal(mine, theirs, what):
    mine, theirs = np.asarray(mine), np.asarray(theirs)
    assert mine.shape == theirs.shape, \
        f'{what}: {mine.shape} vs reference {theirs.shape}'
    np.testing.assert_allclose(mine, theirs, atol=1e-12, err_msg=what)


def _assert_results_equal(mine, theirs, what, tol=1e-9):
    assert set(mine.keys()) == set(theirs.keys()), \
        f'{what}: keys {sorted(map(str, mine))} vs {sorted(map(str, theirs))}'
    for key in theirs:
        if isinstance(theirs[key], dict):
            _assert_results_equal(mine[key], theirs[key], f'{what}.{key}', tol)
        else:
            assert abs(float(mine[key]) - float(theirs[key])) < tol, \
                f'{what}.{key}: {mine[key]} vs reference {theirs[key]}'


# ---------------------------------------------------------------------------
# estimator chains


def test_note_transcriber_chain(rng):
    """NoteTranscriber.process_track == reference on identical predictions
    (multi-pitch + onsets + offsets), including the min-duration filter."""

    profile, ref_profile = PianoProfile(), rtools.PianoProfile()
    dim_out, frames = profile.get_range_len(), 60
    times = _times(frames)

    multi_pitch = _random_multi_pitch(rng, dim_out, frames)
    onsets = np.asarray(rtools.multi_pitch_to_onsets(multi_pitch.copy()))
    offsets = np.asarray(rtools.multi_pitch_to_offsets(multi_pitch.copy()))

    for kwargs in ({}, {'minimum_duration': 0.05}):
        preds = {tools.KEY_MULTIPITCH: multi_pitch.copy(),
                 tools.KEY_ONSETS: onsets.copy(),
                 tools.KEY_OFFSETS: offsets.copy(),
                 tools.KEY_TIMES: times.copy()}

        mine = my_transcribe.NoteTranscriber(
            profile=profile, **kwargs).process_track(dict(preds))
        theirs = ref.transcribe.NoteTranscriber(
            profile=ref_profile, **kwargs).process_track(dict(preds))

        mine = _canon(*tools.batched_notes_to_notes(mine[tools.KEY_NOTES]))
        theirs = _canon(*rtools.batched_notes_to_notes(theirs[rtools.KEY_NOTES]))
        _assert_notes_equal(mine, theirs, f'NoteTranscriber {kwargs}')


def test_stacked_note_transcriber_chain(rng):
    """StackedNoteTranscriber == reference per slice (onsets provided,
    no inhibition — the configuration every reference example uses)."""

    profile, ref_profile = GuitarProfile(), rtools.GuitarProfile()
    slices, frames = profile.get_num_dofs(), 50
    dim_out = profile.get_range_len()
    times = _times(frames)

    stacked = np.stack([_random_multi_pitch(rng, dim_out, frames)
                        for _ in range(slices)])
    onsets = np.stack([np.asarray(rtools.multi_pitch_to_onsets(s.copy()))
                       for s in stacked])

    preds = {tools.KEY_MULTIPITCH: stacked,
             tools.KEY_ONSETS: onsets,
             tools.KEY_TIMES: times}

    mine = my_transcribe.StackedNoteTranscriber(
        profile=profile).process_track(dict(preds))[tools.KEY_NOTES]
    theirs = ref.transcribe.StackedNoteTranscriber(
        profile=ref_profile).process_track(dict(preds))[rtools.KEY_NOTES]

    assert set(mine.keys()) == set(theirs.keys())
    for slc in theirs:
        _assert_notes_equal(_canon(*mine[slc]), _canon(*theirs[slc]),
                            f'StackedNoteTranscriber slice {slc}')


def test_stacked_note_transcriber_inhibition_divergence(rng):
    """PARITY.md ledger: with ``inhibition_window`` AND caller-provided
    onsets the two implementations deliberately differ.

    Reference semantics (``transcribe.py:464-469``): inhibition lives inside
    the ``if onsets is None:`` fallback, so provided onsets pass through
    uninhibited — the option is dead code in the documented configuration.
    Rebuild semantics: provided onsets are inhibited too. Pinned here from
    both directions so a silent behavior change on either side fails.
    """

    profile, ref_profile = PianoProfile(), rtools.PianoProfile()
    dim_out, frames = profile.get_range_len(), 60
    times = _times(frames)
    window = 0.1

    multi_pitch = _random_multi_pitch(rng, dim_out, frames, density=0.2)
    # Dense onsets: re-onset every active frame, so inhibition has real work
    onsets = multi_pitch.copy()

    def run(transcriber_cls, prof, **kwargs):
        preds = {tools.KEY_MULTIPITCH: multi_pitch.copy(),
                 tools.KEY_ONSETS: onsets.copy(),
                 tools.KEY_TIMES: times.copy()}
        out = transcriber_cls(profile=prof, **kwargs).process_track(preds)
        notes = out[tools.KEY_NOTES]
        return _canon(*tools.batched_notes_to_notes(np.asarray(notes)))

    mine = run(my_transcribe.NoteTranscriber, profile,
               inhibition_window=window)
    theirs = run(ref.transcribe.NoteTranscriber, ref_profile,
                 inhibition_window=window)

    # The divergence exists: the rebuild inhibits, the reference does not
    assert mine.shape != theirs.shape or not np.allclose(mine, theirs), \
        'expected documented inhibition divergence; implementations agree'

    # Reference == reference without the option (provided onsets make it a no-op)
    theirs_plain = run(ref.transcribe.NoteTranscriber, ref_profile)
    _assert_notes_equal(theirs, theirs_plain,
                        'reference inhibition should be dead code here')

    # Rebuild == reference fed the PRE-inhibITED onsets (same downstream math)
    inhibited = np.asarray(rtools.inhibit_activations(
        onsets.copy(), times.copy(), window))
    preds = {tools.KEY_MULTIPITCH: multi_pitch.copy(),
             tools.KEY_ONSETS: inhibited,
             tools.KEY_TIMES: times.copy()}
    theirs_inhibited = ref.transcribe.NoteTranscriber(
        profile=ref_profile).process_track(preds)
    theirs_inhibited = _canon(*rtools.batched_notes_to_notes(
        theirs_inhibited[rtools.KEY_NOTES]))
    _assert_notes_equal(mine, theirs_inhibited,
                        'rebuild == reference on pre-inhibited onsets')


def test_tablature_combo_estimator_chain(rng):
    """TablatureWrapper -> StackedNoteTranscriber under ComboEstimator ==
    the reference chain on identical tablature predictions (the guitar
    serving semantics, reference ``transcribe.py:1097-1145`` + ``:373-513``)."""

    profile, ref_profile = GuitarProfile(), rtools.GuitarProfile()
    slices, frames = profile.get_num_dofs(), 50
    times = _times(frames)

    tablature = rng.randint(-1, profile.num_pitches, (slices, frames))
    tablature = tablature.astype(np.float64)

    preds = {tools.KEY_TABLATURE: tablature, tools.KEY_TIMES: times}

    mine = my_transcribe.ComboEstimator(
        [my_transcribe.TablatureWrapper(profile=profile),
         my_transcribe.StackedNoteTranscriber(profile=profile)]
    ).process_track(dict(preds))[tools.KEY_NOTES]

    theirs = ref.transcribe.ComboEstimator(
        [ref.transcribe.TablatureWrapper(profile=ref_profile),
         ref.transcribe.StackedNoteTranscriber(profile=ref_profile)]
    ).process_track(dict(preds))[rtools.KEY_NOTES]

    assert set(mine.keys()) == set(theirs.keys())
    for slc in theirs:
        _assert_notes_equal(_canon(*mine[slc]), _canon(*theirs[slc]),
                            f'tablature chain slice {slc}')


# ---------------------------------------------------------------------------
# evaluator chains


def test_multipitch_evaluator_chain(rng):
    profile = PianoProfile()
    dim_out, frames = profile.get_range_len(), 80

    est = _random_multi_pitch(rng, dim_out, frames)
    gt = _random_multi_pitch(rng, dim_out, frames)

    mine = my_evaluate.MultipitchEvaluator().process_track(
        {tools.KEY_MULTIPITCH: est}, {tools.KEY_MULTIPITCH: gt})
    theirs = ref.evaluate.MultipitchEvaluator().process_track(
        {rtools.KEY_MULTIPITCH: est}, {rtools.KEY_MULTIPITCH: gt})

    _assert_results_equal(mine, theirs, 'MultipitchEvaluator')


def test_stacked_multipitch_evaluator_chain(rng):
    profile = GuitarProfile()
    slices, frames = profile.get_num_dofs(), 50
    dim_out = profile.get_range_len()

    est = np.stack([_random_multi_pitch(rng, dim_out, frames)
                    for _ in range(slices)])
    gt = np.stack([_random_multi_pitch(rng, dim_out, frames)
                   for _ in range(slices)])

    mine = my_evaluate.StackedMultipitchEvaluator().process_track(
        {tools.KEY_MULTIPITCH: est}, {tools.KEY_MULTIPITCH: gt})
    theirs = ref.evaluate.StackedMultipitchEvaluator().process_track(
        {rtools.KEY_MULTIPITCH: est}, {rtools.KEY_MULTIPITCH: gt})

    _assert_results_equal(mine, theirs, 'StackedMultipitchEvaluator')


@pytest.mark.parametrize('offset_ratio', [None, 0.2])
def test_note_evaluator_chain(rng, offset_ratio):
    """NoteEvaluator plumbing (batched->notes->Hz->matcher->results) ==
    reference for onset-only and offset_ratio=0.2 scoring."""

    def batched(count, seed):
        r = np.random.RandomState(seed)
        pitches = r.randint(40, 90, count).astype(np.float64)
        on = r.uniform(0, 8, count)
        dur = r.uniform(0.05, 1.0, count)
        return tools.notes_to_batched_notes(
            pitches, np.stack([on, on + dur], axis=-1))

    est, gt = batched(40, 1), batched(35, 2)

    mine = my_evaluate.NoteEvaluator(offset_ratio=offset_ratio).process_track(
        {tools.KEY_NOTES: est}, {tools.KEY_NOTES: gt})
    theirs = ref.evaluate.NoteEvaluator(offset_ratio=offset_ratio).process_track(
        {rtools.KEY_NOTES: est}, {rtools.KEY_NOTES: gt})

    _assert_results_equal(mine, theirs, f'NoteEvaluator({offset_ratio})')


def test_tablature_evaluator_chain(rng):
    profile, ref_profile = GuitarProfile(), rtools.GuitarProfile()
    slices, frames = profile.get_num_dofs(), 60

    est = rng.randint(-1, profile.num_pitches, (slices, frames)).astype(np.float64)
    gt = rng.randint(-1, profile.num_pitches, (slices, frames)).astype(np.float64)

    mine = my_evaluate.TablatureEvaluator(profile=profile).process_track(
        {tools.KEY_TABLATURE: est}, {tools.KEY_TABLATURE: gt})
    theirs = ref.evaluate.TablatureEvaluator(profile=ref_profile).process_track(
        {rtools.KEY_TABLATURE: est}, {rtools.KEY_TABLATURE: gt})

    _assert_results_equal(mine, theirs, 'TablatureEvaluator')


def test_combo_evaluator_chain(rng):
    """ComboEvaluator merging + average_results across two tracks."""

    profile = PianoProfile()
    dim_out, frames = profile.get_range_len(), 60

    def combo(module, tools_mod, prof):
        return module.ComboEvaluator([
            module.MultipitchEvaluator(),
            module.NoteEvaluator(offset_ratio=0.2,
                                 results_key='notes-offset')])

    mine_combo = combo(my_evaluate, tools, profile)
    ref_combo = combo(ref.evaluate, rtools, rtools.PianoProfile())

    for track in range(2):
        est_mp = _random_multi_pitch(rng, dim_out, frames)
        gt_mp = _random_multi_pitch(rng, dim_out, frames)
        r = np.random.RandomState(10 + track)
        pitches = r.randint(40, 90, 30).astype(np.float64)
        on = r.uniform(0, 6, 30)
        est_notes = tools.notes_to_batched_notes(
            pitches, np.stack([on, on + 0.4], axis=-1))
        gt_notes = tools.notes_to_batched_notes(
            pitches[:25], np.stack([on[:25] + 0.01, on[:25] + 0.42], axis=-1))

        est = {tools.KEY_MULTIPITCH: est_mp, tools.KEY_NOTES: est_notes}
        gt = {tools.KEY_MULTIPITCH: gt_mp, tools.KEY_NOTES: gt_notes}

        _assert_results_equal(mine_combo.process_track(dict(est), dict(gt)),
                              ref_combo.process_track(dict(est), dict(gt)),
                              f'ComboEvaluator track {track}')

    _assert_results_equal(mine_combo.average_results(),
                          ref_combo.average_results(),
                          'ComboEvaluator.average_results')
