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


def test_streaming_export_matches_live_model():
    from amt_tools_tpu.export import export_streaming, load_streaming
    from amt_tools_tpu.models import OnsetsFramesOnline

    profile = tools.PianoProfile()
    model = OnsetsFramesOnline(dim_in=48, profile=profile,
                               model_complexity=2)

    rng = np.random.RandomState(0)
    feats = rng.rand(1, 1, 48, 6).astype(np.float32)

    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jnp.asarray(feats[..., :1]), train=False)

    data = export_streaming(model, variables)
    artifact = load_streaming(data)

    carries_live = model.init_carries(1)
    carries_frozen = artifact.init_carries()

    @jax.jit
    def live_step(variables, frame, carries):
        batch = model.pre_proc({tools.KEY_FEATS: frame})
        raw, new = model.apply(variables, batch[tools.KEY_FEATS],
                               carries=carries)
        return model.post_proc({tools.KEY_OUTPUT: raw}), new

    for i in range(feats.shape[-1]):
        frame = jnp.asarray(feats[..., i:i + 1])
        out_l, carries_live = live_step(variables, frame, carries_live)
        out_f, carries_frozen = artifact.step(carries_frozen, frame)

        for key in (tools.KEY_MULTIPITCH, tools.KEY_ONSETS):
            np.testing.assert_allclose(np.asarray(out_f[key]),
                                       np.asarray(out_l[key]), atol=1e-5)

    # Recurrent state advanced identically through the frozen module
    for a, b in zip(jax.tree_util.tree_leaves(carries_frozen),
                    jax.tree_util.tree_leaves(carries_live)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_streaming_export_rejects_non_streaming_model():
    from amt_tools_tpu.export import export_streaming

    profile = tools.PianoProfile()
    model = OnsetsFrames2(dim_in=48, profile=profile, model_complexity=2)

    with pytest.raises(TypeError, match='init_carries'):
        export_streaming(model, {})


def test_quant_pipeline_exports(pipeline_and_audio):
    """int8 serving composes with AOT export (int8 convs in StableHLO)."""

    pipeline, audio = pipeline_and_audio

    model = OnsetsFrames2(dim_in=72, profile=pipeline.model.profile,
                          model_complexity=2, quant_acoustic=True)
    qpipe = TranscriptionPipeline(model, pipeline.variables,
                                  pipeline.data_proc, capacity=256)

    data = export_serving(qpipe, audio.shape[-1], batch_size=4)
    artifact = load_serving(data)

    _assert_same_notes(artifact(np.asarray(audio)), qpipe(audio))


def test_export_rejects_mesh_pipeline(pipeline_and_audio):
    pipeline, audio = pipeline_and_audio

    class _FakeMesh:
        pass

    sharded = TranscriptionPipeline.__new__(TranscriptionPipeline)
    sharded.__dict__.update(pipeline.__dict__)
    sharded.mesh = _FakeMesh()

    with pytest.raises(ValueError, match='mesh'):
        export_serving(sharded, audio.shape[-1])

def test_static_quant_pipeline_exports(pipeline_and_audio):
    """Static-scale int8 serving (calibrated 'quant_stats') exports: the
    scales freeze into the artifact as constants."""

    from amt_tools_tpu.serving import calibrate_quant_stats

    pipeline, audio = pipeline_and_audio

    model = OnsetsFrames2(dim_in=72, profile=pipeline.model.profile,
                          model_complexity=2, quant_acoustic='static')
    variables = calibrate_quant_stats(model, pipeline.variables,
                                      pipeline.data_proc, audio)
    assert 'quant_stats' in variables

    qpipe = TranscriptionPipeline(model, variables,
                                  pipeline.data_proc, capacity=256)

    data = export_serving(qpipe, audio.shape[-1], batch_size=4)
    artifact = load_serving(data)

    _assert_same_notes(artifact(np.asarray(audio)), qpipe(audio))
