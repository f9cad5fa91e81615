"""Tests for bucketed static-shape whole-track evaluation (masked LSTM)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import PianoProfile
from amt_tools_tpu.models import OnsetsFrames
from amt_tools_tpu.ops.lstm import FastLSTM, FastBiLSTM
from amt_tools_tpu.inference import run_offline


@pytest.fixture(scope='module')
def key():
    return jax.random.PRNGKey(0)


def test_masked_fastlstm_exact(key):
    """Padded + masked scan must equal the unpadded scan on valid frames."""

    B, T, E, H = 2, 9, 5, 6
    x = jax.random.normal(key, (B, T, E))

    lstm = FastLSTM(features=H)
    params = lstm.init(key, x)

    exact = lstm.apply(params, x)

    # Pad to 16 frames with garbage, mask the tail
    pad = jax.random.normal(jax.random.PRNGKey(9), (B, 16 - T, E))
    x_padded = jnp.concatenate([x, pad], axis=1)
    lengths = jnp.array([T, T])

    masked = lstm.apply(params, x_padded, lengths=lengths)

    np.testing.assert_allclose(np.asarray(masked[:, :T]), np.asarray(exact),
                               rtol=1e-5, atol=1e-6)
    # Padded outputs are zeroed
    assert float(jnp.abs(masked[:, T:]).max()) == 0.0


def test_masked_fastbilstm_exact(key):
    """Backward direction must start at each sequence's true end."""

    B, T, E, H = 2, 7, 4, 5
    x = jax.random.normal(key, (B, T, E))

    bi = FastBiLSTM(features=H)
    params = bi.init(key, x)

    exact = bi.apply(params, x)

    pad = jnp.ones((B, 9 - T, E)) * 5.0  # deliberately non-zero garbage
    x_padded = jnp.concatenate([x, pad], axis=1)

    masked = bi.apply(params, x_padded, lengths=jnp.array([T, T]))

    np.testing.assert_allclose(np.asarray(masked[:, :T]), np.asarray(exact),
                               rtol=1e-5, atol=1e-6)


def test_masked_variable_lengths(key):
    """Different lengths within a batch are masked independently."""

    B, T, E, H = 2, 8, 4, 3
    x = jax.random.normal(key, (B, T, E))

    bi = FastBiLSTM(features=H)
    params = bi.init(key, x)

    lengths = jnp.array([5, 8])
    masked = bi.apply(params, x, lengths=lengths)

    # Row 0: frames 0..4 equal an exact pass over x[:1, :5]
    exact0 = bi.apply(params, x[:1, :5])
    np.testing.assert_allclose(np.asarray(masked[0:1, :5]), np.asarray(exact0),
                               rtol=1e-5, atol=1e-6)
    # Row 1 is full-length, must equal the exact full pass
    exact1 = bi.apply(params, x[1:2])
    np.testing.assert_allclose(np.asarray(masked[1:2]), np.asarray(exact1),
                               rtol=1e-5, atol=1e-6)


def test_bucketed_run_offline_matches_exact(key):
    """run_offline with bucket padding must produce identical predictions."""

    profile = PianoProfile()
    model = OnsetsFrames(dim_in=48, profile=profile, model_complexity=2)

    rng = np.random.RandomState(0)
    T = 13
    feats = rng.rand(1, 48, T).astype(np.float32)
    times = np.arange(T) * 0.032

    pre = model.pre_proc({tools.KEY_FEATS: jnp.asarray(feats)[None]})
    variables = model.init({'params': key, 'dropout': key},
                           pre[tools.KEY_FEATS], train=False)

    track = {tools.KEY_FEATS: feats, tools.KEY_TIMES: times,
             tools.KEY_TRACK: 'bucketed'}

    exact = run_offline(dict(track), model, variables)
    bucketed = run_offline(dict(track), model, variables, bucket=8)

    assert bucketed[tools.KEY_MULTIPITCH].shape == exact[tools.KEY_MULTIPITCH].shape
    np.testing.assert_allclose(np.asarray(bucketed[tools.KEY_MULTIPITCH]),
                               np.asarray(exact[tools.KEY_MULTIPITCH]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bucketed[tools.KEY_ONSETS]),
                               np.asarray(exact[tools.KEY_ONSETS]),
                               rtol=1e-4, atol=1e-5)


def test_batched_validate_matches_per_track():
    """validate(batch_size=4) scores identically to the per-track loop."""

    import jax
    import optax
    from amt_tools_tpu.datasets import SyntheticPiano
    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames
    from amt_tools_tpu.models.common import run_on_batch
    from amt_tools_tpu.transcribe import ComboEstimator, NoteTranscriber
    from amt_tools_tpu.evaluate import (ComboEvaluator, MultipitchEvaluator,
                                        NoteEvaluator, validate)

    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=48)
    dataset = SyntheticPiano(num_tracks=5, track_duration=2.0, data_proc=mel,
                             num_frames=None, save_data=False, store_data=True)

    profile = dataset.profile
    model = OnsetsFrames(dim_in=48, profile=profile, model_complexity=2)

    track = dataset.get_track_data(dataset.tracks[0])
    batch = {tools.KEY_FEATS: track[tools.KEY_FEATS][None].astype(np.float32)}
    pre = model.pre_proc(dict(batch))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           pre[tools.KEY_FEATS], train=False)

    def build_eval():
        return ComboEvaluator([MultipitchEvaluator(),
                               NoteEvaluator(results_key=tools.KEY_NOTE_ON)])

    est = ComboEstimator([NoteTranscriber(profile=profile)])

    seq = validate(model, variables, dataset, build_eval(), est, bucket=32)
    bat = validate(model, variables, dataset, build_eval(), est, bucket=32,
                   batch_size=4)

    def flat(d, prefix=''):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + '/'))
            else:
                out[prefix + k] = v
        return out

    seq_f, bat_f = flat(seq), flat(bat)
    assert set(seq_f) == set(bat_f)
    for key in seq_f:
        np.testing.assert_allclose(bat_f[key], seq_f[key], atol=1e-5,
                                   err_msg=key)
