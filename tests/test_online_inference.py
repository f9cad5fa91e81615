"""Tests for streaming inference with carried recurrent state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import PianoProfile, GuitarProfile
from amt_tools_tpu.models import OnsetsFramesOnline, TabCNN
from amt_tools_tpu.inference import run_online, run_online_stateful
from amt_tools_tpu.transcribe import IterativeNoteTranscriber


@pytest.fixture(scope='module')
def online_model():
    profile = PianoProfile()
    model = OnsetsFramesOnline(dim_in=48, profile=profile, model_complexity=2)

    rng = np.random.RandomState(0)
    feats = rng.rand(1, 1, 48, 12).astype(np.float32)

    pre = model.pre_proc({tools.KEY_FEATS: jnp.asarray(feats)})
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           pre[tools.KEY_FEATS], train=False,
                           carries=model.init_carries(1))

    return model, variables, feats


def test_streaming_carries_are_stateful(online_model):
    """The carry must thread recurrent context across frames.

    (Exact equality with the whole-sequence pass is not expected: the conv
    acoustic frontend has a +-3 frame receptive field that per-frame feeding
    truncates — the same boundary behavior as the reference's online path.
    The LSTM-carry equivalence itself is covered in test_models /
    test_lstm_ops.)
    """

    model, variables, feats = online_model

    frame = model.pre_proc({tools.KEY_FEATS: jnp.asarray(feats[..., :1])})

    # Same frame with fresh vs advanced carries must differ (state matters)
    carries0 = model.init_carries(1)
    out_a, carries1 = model.apply(variables, frame[tools.KEY_FEATS],
                                  train=False, carries=carries0)
    out_b, carries2 = model.apply(variables, frame[tools.KEY_FEATS],
                                  train=False, carries=carries1)

    assert not np.allclose(np.asarray(out_a[tools.KEY_MULTIPITCH]),
                           np.asarray(out_b[tools.KEY_MULTIPITCH]))

    # Carries evolve
    diff = sum(float(jnp.sum(jnp.abs(a - b)))
               for a, b in zip(jax.tree_util.tree_leaves(carries1),
                               jax.tree_util.tree_leaves(carries2)))
    assert diff > 0

    # Determinism: same carry + same frame -> same output
    out_c, _ = model.apply(variables, frame[tools.KEY_FEATS],
                           train=False, carries=carries0)
    np.testing.assert_allclose(np.asarray(out_a[tools.KEY_MULTIPITCH]),
                               np.asarray(out_c[tools.KEY_MULTIPITCH]))


def test_run_online_stateful(online_model):
    model, variables, feats = online_model
    profile = model.profile

    track = {tools.KEY_FEATS: feats[0],
             tools.KEY_TIMES: np.arange(feats.shape[-1]) * 0.032,
             tools.KEY_TRACK: 'stream'}

    estimator = IterativeNoteTranscriber(profile=profile)

    predictions = run_online_stateful(track, model, variables, estimator)

    assert tools.KEY_MULTIPITCH in predictions
    assert predictions[tools.KEY_MULTIPITCH].shape[-1] == feats.shape[-1]
    assert tools.KEY_NOTES in predictions
    assert predictions[tools.KEY_NOTES].shape[-1] == 3


def test_run_online_tabcnn():
    """Windowed (stateless) online inference path with TabCNN."""

    profile = GuitarProfile()
    model = TabCNN(dim_in=48, profile=profile, model_complexity=1)

    rng = np.random.RandomState(0)
    feats = rng.rand(1, 48, 10).astype(np.float32)

    import dataclasses
    online_model = dataclasses.replace(model, online=True)

    pre = online_model.pre_proc(
        {tools.KEY_FEATS: jnp.asarray(feats[None, ..., :model.frame_width])})
    variables = online_model.init({'params': jax.random.PRNGKey(0),
                                   'dropout': jax.random.PRNGKey(1)},
                                  pre[tools.KEY_FEATS], train=False)

    track = {tools.KEY_FEATS: feats,
             tools.KEY_TIMES: np.arange(10) * 0.023,
             tools.KEY_TRACK: 'tab_stream'}

    predictions = run_online(track, online_model, variables)

    assert predictions[tools.KEY_TABLATURE].shape == (6, 10)
