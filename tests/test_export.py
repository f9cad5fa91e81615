"""AOT serving artifacts: export/load round-trip matches the live pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.export import export_serving, save_serving, load_serving
from amt_tools_tpu.features import MelSpec
from amt_tools_tpu.models import OnsetsFrames2
from amt_tools_tpu.datasets.synthetic import render_notes, random_notes
from amt_tools_tpu.serving import TranscriptionPipeline, calibrate_activity


SAMPLE_RATE, HOP, CLIP_SECONDS = 16000, 512, 3.0


@pytest.fixture(scope='module')
def pipeline_and_audio():
    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=SAMPLE_RATE, hop_length=HOP, n_mels=72)
    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2)

    rng = np.random.RandomState(0)
    clips = []
    for b in range(4):
        pitches, intervals = random_notes(profile, CLIP_SECONDS, 40, rng)
        clips.append(render_notes(pitches, intervals, SAMPLE_RATE,
                                  CLIP_SECONDS, seed=b))
    audio = jnp.asarray(np.stack(clips))

    num_frames = mel.get_expected_frames(clips[0])
    feats = model.pre_proc(
        {tools.KEY_FEATS: jnp.zeros((1, 1, 72, num_frames))})
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           feats[tools.KEY_FEATS], train=False)
    variables = calibrate_activity(model, variables, mel, audio)

    return TranscriptionPipeline(model, variables, mel, capacity=256), audio


def _assert_same_notes(got, expected):
    assert len(got) == len(expected)
    for (p_g, i_g), (p_e, i_e) in zip(got, expected):
        np.testing.assert_array_equal(p_g, p_e)
        np.testing.assert_allclose(i_g, i_e, atol=1e-9)


def test_export_round_trip_matches_live_pipeline(pipeline_and_audio,
                                                 tmp_path):
    pipeline, audio = pipeline_and_audio
    num_samples = audio.shape[-1]

    path = tmp_path / 'serving.amtx'
    meta = save_serving(path, pipeline, num_samples, batch_size=4)
    assert meta['num_samples'] == num_samples
    assert meta['capacity'] == 256

    artifact = load_serving(path)
    live = pipeline(audio)
    frozen = artifact(np.asarray(audio))

    assert any(len(p) for p, _ in live), 'probe produced no notes'
    _assert_same_notes(frozen, live)


def test_export_symbolic_batch_serves_any_size(pipeline_and_audio):
    pipeline, audio = pipeline_and_audio

    data = export_serving(pipeline, audio.shape[-1], batch_size=4)
    artifact = load_serving(data)

    if not artifact.meta['symbolic_batch']:
        pytest.skip('lowering required a concrete batch (Pallas path)')

    for batch in (1, 3):
        sub = audio[:batch]
        _assert_same_notes(artifact(np.asarray(sub)), pipeline(sub))


def test_artifact_rejects_wrong_length(pipeline_and_audio):
    pipeline, audio = pipeline_and_audio

    data = export_serving(pipeline, audio.shape[-1], batch_size=4)
    artifact = load_serving(data)

    with pytest.raises(ValueError, match='samples'):
        artifact(np.zeros((2, audio.shape[-1] // 2), np.float32))
