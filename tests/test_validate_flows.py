"""Tests for validation flows: online mode, multi-host batch assembly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import GuitarProfile
from amt_tools_tpu.models import TabCNN
from amt_tools_tpu.features import MelSpec
from amt_tools_tpu.datasets import SyntheticGuitar
from amt_tools_tpu.train import init_state, trainable_batch
from amt_tools_tpu.transcribe import (ComboEstimator, TablatureWrapper,
                                      StackedMultiPitchCollapser)
from amt_tools_tpu.evaluate import (ComboEvaluator, SoftmaxAccuracy,
                                    TablatureEvaluator, validate)
from amt_tools_tpu.parallel import get_mesh, local_batch_to_global


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    profile = GuitarProfile()
    from amt_tools_tpu.features import CQT
    cqt = CQT(sample_rate=22050, hop_length=512, n_bins=72,
              bins_per_octave=12, fmin=65.0)

    dataset = SyntheticGuitar(
        base_dir=str(tmp_path_factory.mktemp('val_flows')),
        data_proc=cqt, num_frames=None, num_tracks=2, track_duration=2.0,
        notes_per_track=8, save_data=False, seed=3, splits=['test'])

    model = TabCNN(dim_in=72, profile=profile, model_complexity=1)

    td = dataset.get_track_data(dataset.tracks[0])
    batch = {tools.KEY_FEATS: np.asarray(td[tools.KEY_FEATS])[None].astype(np.float32)}
    state = init_state(model, optax.adam(1e-3), batch, rng=jax.random.PRNGKey(0))

    return model, state, dataset, profile


def test_validate_offline(setup):
    model, state, dataset, profile = setup

    estimator = ComboEstimator([TablatureWrapper(profile=profile),
                                StackedMultiPitchCollapser(profile=profile)])
    evaluator = ComboEvaluator([SoftmaxAccuracy(),
                                TablatureEvaluator(profile=profile)])

    results = validate(model, state.variables(), dataset, evaluator, estimator)

    assert tools.KEY_ACCURACY in results[tools.KEY_TABLATURE]
    assert 0.0 <= results[tools.KEY_TABLATURE][tools.KEY_ACCURACY] <= 1.0
    assert tools.KEY_TDR in results[tools.KEY_TABLATURE]


def test_validate_online(setup):
    """Mock-real-time validation: windowed per-frame inference + evaluators."""

    model, state, dataset, profile = setup

    import dataclasses
    online_model = dataclasses.replace(model, online=True)

    estimator = ComboEstimator([TablatureWrapper(profile=profile)])
    evaluator = ComboEvaluator([SoftmaxAccuracy()])

    results = validate(online_model, state.variables(), dataset, evaluator,
                       estimator, online=True)

    assert 0.0 <= results[tools.KEY_TABLATURE][tools.KEY_ACCURACY] <= 1.0


def test_local_batch_to_global():
    """Single-process multi-host assembly produces a correctly sharded batch."""

    mesh = get_mesh()
    assert jax.device_count() == 8

    batch = {'x': np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    global_batch = local_batch_to_global(batch, mesh)

    assert global_batch['x'].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(global_batch['x']), batch['x'])
    # Sharded over the data axis
    assert len(global_batch['x'].sharding.device_set) == 8
