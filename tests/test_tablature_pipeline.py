"""TablaturePipeline == TablatureWrapper -> StackedNoteTranscriber chain.

The guitar-flagship serving path compiles audio -> features -> TabCNN ->
tablature -> stacked multi-pitch -> per-string note decode into one XLA
executable; these tests pin its decode stages to the reference estimator
chain semantics (reference ``amt_tools/transcribe.py:1097-1145``
TablatureWrapper and ``:373-513`` StackedNoteTranscriber with default
options), using the rebuild's host implementations of that chain on
identical tablature.

The decode comparison feeds one fixed tablature array to both sides
(``TablaturePipeline.decode_tablature`` vs the host chain) and demands
bit-equality. The end-to-end pipeline comparison is a set-agreement check:
an UNTRAINED softmax head leaves many (string, frame) argmaxes near-tied,
and two different XLA programs (the fused pipeline vs the op-by-op host
forward) legitimately differ in last-ulp logits there, flipping a small
fraction of cells — a property of fp argmax on random weights, not of the
decode (verified: logits match and the decode is bit-exact on identical
tablature).
"""

import numpy as np
import pytest

import jax

from amt_tools_tpu import tools
from amt_tools_tpu.features import STFT
from amt_tools_tpu.models import TabCNN
from amt_tools_tpu.serving import (TablaturePipeline,
                                   calibrate_tablature_activity)
from amt_tools_tpu.transcribe import StackedNoteTranscriber, TablatureWrapper
from amt_tools_tpu.datasets.synthetic import render_notes


@pytest.fixture(scope='module')
def setup():
    profile = tools.GuitarProfile()
    stft = STFT(sample_rate=8000, hop_length=256, n_fft=192)
    dim_in = stft.get_feature_size()
    model = TabCNN(dim_in=dim_in, profile=profile, model_complexity=1)

    audio = np.stack([
        render_notes([52.0, 64.0], [[0.2, 0.9], [1.1, 1.7]], 8000, 2.0, seed=s)
        for s in range(2)])

    feats = stft.process_jax(audio)
    pre = model.pre_proc({tools.KEY_FEATS: feats})
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           pre[tools.KEY_FEATS], train=False)

    return profile, stft, model, variables, audio


def _host_chain_stacked_notes(profile, tablature, times):
    """The reference estimator-chain semantics on one clip's tablature."""

    raw_output = {tools.KEY_TABLATURE: np.asarray(tablature),
                  tools.KEY_TIMES: times}

    chain_out = TablatureWrapper(profile=profile).process_track(raw_output)
    raw_output.update(chain_out)
    notes_out = StackedNoteTranscriber(profile=profile).process_track(raw_output)

    return notes_out[tools.KEY_NOTES]


def _assert_stacked_equal(got, want):
    assert set(got.keys()) == set(want.keys())
    for slc in want:
        got_p, got_i = got[slc]
        want_p, want_i = want[slc]
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                                   atol=1e-9)


def _note_set(stacked):
    return {(slc, float(p), round(float(on), 6), round(float(off), 6))
            for slc, (pitches, intervals) in stacked.items()
            for p, (on, off) in zip(pitches, intervals)}


def test_decode_stage_matches_host_chain(setup):
    """Device decode stages == host estimator chain, bit-for-bit, on a
    dense random tablature (every cell active or silent at random — far
    more adjacent re-onsets than any trained model produces)."""

    profile, stft, model, variables, audio = setup

    rng = np.random.RandomState(7)
    num_frames = 40
    tablature = rng.randint(-1, profile.num_pitches, (2, 6, num_frames))
    times = np.arange(num_frames) * 256 / 8000.0

    pipeline = TablaturePipeline(model, variables, stft, capacity=64)
    groups = pipeline.decode_tablature(tablature, times)

    for b in range(2):
        want = _host_chain_stacked_notes(profile, tablature[b], times)
        _assert_stacked_equal(groups[b], want)


def test_decode_tablature_overflow_redecode(setup):
    """Per-string note counts beyond capacity re-decode exactly."""

    profile, stft, model, variables, audio = setup

    rng = np.random.RandomState(3)
    num_frames = 40
    tablature = rng.randint(-1, profile.num_pitches, (2, 6, num_frames))
    times = np.arange(num_frames) * 256 / 8000.0

    reference = TablaturePipeline(model, variables, stft, capacity=64)
    tiny = TablaturePipeline(model, variables, stft, capacity=2)

    want_groups = reference.decode_tablature(tablature, times)
    got_groups = tiny.decode_tablature(tablature, times)

    # Dense random tablature has far more than 2 notes per string, so the
    # tiny pipeline must have taken the re-decode path
    assert any(len(p) > 2 for g in want_groups for p, _ in g.values())

    for got, want in zip(got_groups, want_groups):
        _assert_stacked_equal(got, want)


def test_tablature_pipeline_end_to_end(setup):
    profile, stft, model, variables, audio = setup

    pipeline = TablaturePipeline(model, variables, stft, capacity=64)
    groups = pipeline(audio)

    assert len(groups) == 2

    tuning = profile.get_midi_tuning()
    clip_len = audio.shape[-1] / 8000.0

    for clip, got in zip(audio, groups):
        assert set(got.keys()) == set(range(6))
        for slc, (pitches, intervals) in got.items():
            assert len(pitches) > 0  # untrained argmax is dense
            lo, hi = tuning[slc], tuning[slc] + profile.num_pitches - 1
            assert np.all((pitches >= lo) & (pitches <= hi))
            assert np.all(intervals[:, 1] > intervals[:, 0] - 1e-9)
            assert np.all(intervals <= clip_len + 0.1)

        # Host chain on the host forward's tablature: agreement is high but
        # not exact — near-tied untrained argmaxes flip between programs
        feats = stft.process_jax(clip[None])
        pre = model.pre_proc({tools.KEY_FEATS: feats})
        raw = model.apply(variables, pre[tools.KEY_FEATS], train=False)
        tab = np.asarray(
            model.post_proc({tools.KEY_OUTPUT: raw})[tools.KEY_TABLATURE])[0]
        want = _host_chain_stacked_notes(profile, tab, stft.get_times(clip))

        got_set, want_set = _note_set(got), _note_set(want)
        agreement = (2 * len(got_set & want_set)
                     / max(1, len(got_set) + len(want_set)))
        assert agreement > 0.5, f'note agreement {agreement:.2f}'


def test_fullseq_forward_matches_windowed(setup):
    """fullseq TabCNN logits == windowed logits on the same variables.

    The serving-mode forward (convs over the whole (F, T) image + a
    stride-1 time pool) must reproduce the per-window computation exactly —
    VALID convs make window t's output a translate of full-sequence output
    t (``models/tabcnn.py`` class docstring). This is the memory fix that
    makes 60 s batched guitar serving fit in HBM (the windowed graph
    materializes a frame_width-fold larger conv activation).
    """

    profile, stft, model, variables, audio = setup

    full = model.clone(fullseq=True)
    feats = stft.process_jax(audio)

    pre_w = model.pre_proc({tools.KEY_FEATS: feats})
    out_w = model.apply(variables, pre_w[tools.KEY_FEATS], train=False)

    pre_f = full.pre_proc({tools.KEY_FEATS: feats})
    out_f = full.apply(variables, pre_f[tools.KEY_FEATS], train=False)

    np.testing.assert_allclose(np.asarray(out_f[tools.KEY_TABLATURE]),
                               np.asarray(out_w[tools.KEY_TABLATURE]),
                               atol=1e-5, rtol=1e-5)


def test_fullseq_pipeline_matches_windowed_decode(setup):
    """TablaturePipeline(fullseq) decodes the same tablature as windowed.

    Compares the (B, S, T) class ids reconstructed from both pipelines'
    note buffers; ties in untrained argmax logits are resolved identically
    because the logits themselves match (previous test), so the decoded
    stacked notes agree set-wise to near-unity.
    """

    profile, stft, model, variables, audio = setup

    windowed = TablaturePipeline(model, variables, stft, capacity=64)
    full = TablaturePipeline(model.clone(fullseq=True), variables, stft,
                             capacity=64)

    got = full(audio)
    want = windowed(audio)

    got_set = _note_set(got[0]) | _note_set(got[1])
    want_set = _note_set(want[0]) | _note_set(want[1])
    agreement = 2 * len(got_set & want_set) / max(1, len(got_set)
                                                  + len(want_set))
    assert agreement > 0.98, f'fullseq vs windowed agreement {agreement:.3f}'


def test_bf16_dtype_forward(setup):
    """TabCNN(dtype=bf16) logits track the f32 forward; fullseq holds.

    The serving bench builds the guitar flagship with
    ``dtype=jnp.bfloat16`` (``bench.py``): convs/dense/head run in bf16
    compute while params stay float32. Pins (a) the bf16 logits to the
    f32 logits within bf16 rounding, and (b) the fullseq==windowed
    translate-equivalence under bf16 compute too (same geometry, same
    dtype both sides).
    """

    import jax.numpy as jnp

    profile, stft, model, variables, audio = setup

    feats = stft.process_jax(audio)

    bf16 = model.clone(dtype=jnp.bfloat16)
    pre = model.pre_proc({tools.KEY_FEATS: feats})

    out_f32 = model.apply(variables, pre[tools.KEY_FEATS], train=False)
    out_bf16 = bf16.apply(variables, pre[tools.KEY_FEATS], train=False)

    ref = np.asarray(out_f32[tools.KEY_TABLATURE], dtype=np.float32)
    got = np.asarray(out_bf16[tools.KEY_TABLATURE], dtype=np.float32)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 0.05 * max(scale, 1.0), \
        f'bf16 deviation {np.max(np.abs(got - ref)):.4f} at scale {scale:.2f}'

    full_bf16 = bf16.clone(fullseq=True)
    pre_f = full_bf16.pre_proc({tools.KEY_FEATS: feats})
    out_full = full_bf16.apply(variables, pre_f[tools.KEY_FEATS],
                               train=False)
    np.testing.assert_allclose(
        np.asarray(out_full[tools.KEY_TABLATURE], dtype=np.float32), got,
        atol=0.02 * max(scale, 1.0), rtol=0.05)


def test_calibrate_tablature_activity(setup):
    profile, stft, model, variables, audio = setup

    rate = 0.05
    calibrated = calibrate_tablature_activity(model, variables, stft, audio,
                                              rate=rate)

    feats = stft.process_jax(audio)
    pre = model.pre_proc({tools.KEY_FEATS: feats})
    raw = model.apply(calibrated, pre[tools.KEY_FEATS], train=False)
    finalized = model.post_proc({tools.KEY_OUTPUT: raw})
    tablature = np.asarray(finalized[tools.KEY_TABLATURE])

    active = np.mean(tablature >= 0)
    assert 0.0 < active <= 2.5 * rate, f'calibrated activity {active:.3f}'

    # The calibrated variables serve end-to-end
    pipeline = TablaturePipeline(model, calibrated, stft, capacity=64)
    groups = pipeline(audio)
    assert len(groups) == 2
