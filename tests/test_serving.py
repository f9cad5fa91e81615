"""TranscriptionPipeline == run_offline + NoteTranscriber, one jitted graph."""

import numpy as np
import pytest

import jax

from amt_tools_tpu import tools
from amt_tools_tpu.features import MelSpec
from amt_tools_tpu.models import OnsetsFrames
from amt_tools_tpu.serving import TranscriptionPipeline
from amt_tools_tpu.transcribe import NoteTranscriber
from amt_tools_tpu.inference import run_offline
from amt_tools_tpu.datasets.synthetic import render_notes


@pytest.fixture(scope='module')
def setup():
    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=96)
    model = OnsetsFrames(dim_in=96, profile=profile, model_complexity=2)

    audio = np.stack([
        render_notes([60.0, 67.0], [[0.2, 0.8], [1.0, 1.6]], 16000, 2.0, seed=s)
        for s in range(2)])

    feats = mel.process_jax(audio)
    pre = model.pre_proc({tools.KEY_FEATS: feats})
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           pre[tools.KEY_FEATS], train=False)

    return profile, mel, model, variables, audio


def test_pipeline_matches_offline_path(setup):
    profile, mel, model, variables, audio = setup

    pipeline = TranscriptionPipeline(model, variables, mel, capacity=512)
    batch_notes = pipeline(audio)

    assert len(batch_notes) == 2

    estimator = NoteTranscriber(profile=profile)

    for clip, (pitches, intervals) in zip(audio, batch_notes):
        feats = np.asarray(mel.process_audio(clip))
        track = {tools.KEY_FEATS: feats,
                 tools.KEY_TIMES: mel.get_times(clip)}
        want = run_offline(track, model, variables, estimator)[tools.KEY_NOTES]
        got = tools.notes_to_batched_notes(pitches, intervals)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipeline_pipelined_dispatch(setup):
    profile, mel, model, variables, audio = setup

    pipeline = TranscriptionPipeline(model, variables, mel, capacity=512)

    # Two in-flight batches, finalized out of order of dispatch completion
    h1 = pipeline.dispatch(audio)
    h2 = pipeline.dispatch(audio[::-1].copy())
    n1, n2 = pipeline.finalize(h1), pipeline.finalize(h2)

    for (p1, i1), (p2, i2) in zip(n1, n2[::-1]):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(i1, i2)


def test_pipeline_single_clip_convenience(setup):
    profile, mel, model, variables, audio = setup

    pipeline = TranscriptionPipeline(model, variables, mel, capacity=512)
    notes = pipeline(audio[0])   # 1-D input -> batch of one

    assert len(notes) == 1
    pitches, intervals = notes[0]
    assert np.asarray(intervals).ndim == 2


def test_pipeline_mixed_length_handles(setup):
    """In-flight handles of different clip lengths finalize correctly."""

    profile, mel, model, variables, audio = setup

    pipeline = TranscriptionPipeline(model, variables, mel, capacity=512)

    long_audio = np.concatenate([audio, audio], axis=-1)   # 4 s clips
    h_long = pipeline.dispatch(long_audio)
    h_short = pipeline.dispatch(audio)                     # 2 s clips

    notes_long = pipeline.finalize(h_long)    # finalized AFTER a shorter
    notes_short = pipeline.finalize(h_short)  # batch was dispatched

    # Short results equal the single-batch reference
    ref_short = pipeline(audio)
    for (p1, i1), (p2, i2) in zip(notes_short, ref_short):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(i1, i2)

    # Long-clip intervals may legitimately extend past the short grid
    ref_long = pipeline(long_audio)
    for (p1, i1), (p2, i2) in zip(notes_long, ref_long):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(i1, i2)


def test_pipeline_data_parallel_matches_single_device(setup):
    """A mesh-sharded pipeline decodes the same notes as the unsharded one."""

    from amt_tools_tpu.parallel import get_mesh

    profile, mel, model, variables, audio = setup

    # 8 clips over the 8 virtual devices
    audio8 = np.concatenate([audio] * 4, axis=0)

    single = TranscriptionPipeline(model, variables, mel, capacity=512)
    sharded = TranscriptionPipeline(model, variables, mel, capacity=512,
                                    mesh=get_mesh())

    want = single(audio8)
    got = sharded(audio8)

    assert len(got) == 8
    for (p1, i1), (p2, i2) in zip(got, want):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(i1, i2)


def test_pipeline_overflow_redecodes_completely(setup):
    """A clip with more notes than capacity loses nothing (auto re-decode)."""

    profile, mel, model, variables, audio = setup

    # A near-zero threshold on untrained weights makes almost every cell
    # active, decoding far more note fragments per clip than capacity 8
    small = TranscriptionPipeline(model, variables, mel, capacity=8,
                                  threshold=0.02)
    large = TranscriptionPipeline(model, variables, mel, capacity=4096,
                                  threshold=0.02)
    got = small(audio)
    want = large(audio)

    assert any(len(p) > 8 for p, _ in want), 'fixture not dense enough'

    for (p1, i1), (p2, i2) in zip(got, want):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(i1, i2)


def test_pipeline_int8_static_data_parallel_matches_single_device(setup):
    """Mesh-sharded int8-static serving == unsharded int8-static serving.

    Quantized serving and mesh serving compose: GSPMD partitions the
    calibrated int8 graph over the ``data`` axis without changing the
    decoded notes (motivated by an XLA GSPMD grouped-conv gradient bug
    already found on this version — quant+mesh must not ship untested).
    """

    from amt_tools_tpu.parallel import get_mesh
    from amt_tools_tpu.serving import calibrate_quant_stats

    profile, mel, model, variables, audio = setup

    quant_model = model.clone(quant_acoustic='static')
    q_variables = calibrate_quant_stats(quant_model, variables, mel, audio)

    audio8 = np.concatenate([audio] * 4, axis=0)

    single = TranscriptionPipeline(quant_model, q_variables, mel, capacity=512)
    sharded = TranscriptionPipeline(quant_model, q_variables, mel,
                                    capacity=512, mesh=get_mesh())

    want = single(audio8)
    got = sharded(audio8)

    assert len(got) == 8
    for (p1, i1), (p2, i2) in zip(got, want):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(i1, i2)
