"""Velocity stack: conversions, regression head, O&F2 option, evaluator.

Closes the reference's velocity TODO (``models/onsetsframes.py:13``); the
O&F2 paper (arXiv:1810.12247) predicts per-pitch note velocities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import PianoProfile
from amt_tools_tpu.models import OnsetsFrames2, RegressionBank
from amt_tools_tpu.models.common import run_on_batch
from amt_tools_tpu.evaluate import VelocityEvaluator


@pytest.fixture
def profile():
    return PianoProfile()


def test_notes_to_velocity_roundtrip(profile):
    pitches = np.array([60.0, 64.0, 60.0])
    intervals = np.array([[0.1, 0.5], [0.2, 0.7], [0.9, 1.3]])
    velocities = np.array([0.8, 0.5, 0.3])
    times = np.arange(50) * 0.032

    vmap_ = tools.notes_to_velocity(pitches, intervals, velocities, times,
                                    profile)

    assert vmap_.shape == (profile.get_range_len(), 50)
    # Values live exactly where the multi-pitch map is active
    mp = tools.notes_to_multi_pitch(pitches, intervals, times, profile)
    np.testing.assert_array_equal(vmap_ > 0, mp > 0)

    got = tools.extract_note_velocities(
        tools.notes_to_batched_notes(pitches, intervals), vmap_, times, profile)
    np.testing.assert_allclose(got, velocities)


def test_notes_to_velocity_midi_scale_normalized(profile):
    vmap_ = tools.notes_to_velocity([60.0], [[0.1, 0.3]], [100.0],
                                    np.arange(20) * 0.032, profile)
    assert np.isclose(vmap_.max(), 100.0 / 127.0)


def test_regression_bank_masked_mse():
    head = RegressionBank(dim_in=4, dim_out=3)

    logits = jnp.zeros((1, 5, 3))          # sigmoid -> 0.5 everywhere
    reference = jnp.full((1, 3, 5), 0.75)
    mask = jnp.zeros((1, 3, 5)).at[0, 1, 2].set(1.0)

    # The regression runs in the dB domain: the target for linear 0.75 at
    # floor_db=-30 is 1 - 20*log10(0.75)/-30
    target = 1.0 - 20.0 * np.log10(0.75) / -30.0
    loss = head.get_loss(logits, reference, mask)
    np.testing.assert_allclose(float(loss), (0.5 - target) ** 2, atol=1e-6)

    # Empty mask -> zero loss, no NaN
    assert float(head.get_loss(logits, reference, jnp.zeros((1, 3, 5)))) == 0.0

    # Finalized outputs return to the LINEAR domain: sigmoid(0) = 0.5 in dB
    # space -> 10^(-30 * 0.5 / 20)
    out = head.finalize_output(logits)
    assert out.shape == (1, 3, 5)
    np.testing.assert_allclose(np.asarray(out), 10.0 ** (-0.75), rtol=1e-6)

    # Log-domain transform round-trips across the representable range
    values = jnp.linspace(0.04, 1.0, 9)
    np.testing.assert_allclose(
        np.asarray(head.from_log_domain(head.to_log_domain(values))),
        np.asarray(values), rtol=1e-5)


def test_onsetsframes2_velocity_head(profile):
    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2,
                          estimate_velocity=True)

    rng = np.random.RandomState(0)
    dim_out = profile.get_range_len()
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 72, 16).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 16) > 0.9).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()
    batch[tools.KEY_VELOCITY] = (batch[tools.KEY_MULTIPITCH] *
                                 rng.rand(2, dim_out, 16)).astype(np.float32)

    pre = model.pre_proc(dict(batch))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           pre[tools.KEY_FEATS], train=False)

    assert 'velocity_am' in variables['params']

    output, _ = run_on_batch(model, variables, batch, train=False)

    assert output[tools.KEY_VELOCITY].shape == (2, dim_out, 16)
    assert float(output[tools.KEY_VELOCITY].min()) >= 0.0
    assert float(output[tools.KEY_VELOCITY].max()) <= 1.0

    loss = output[tools.KEY_LOSS]
    assert tools.KEY_LOSS_VELOCITY in loss
    assert np.isfinite(float(loss[tools.KEY_LOSS_VELOCITY]))
    assert np.isfinite(float(loss[tools.KEY_LOSS_TOTAL]))


def test_velocity_loss_trains(profile):
    """A few optimizer steps reduce the velocity loss term."""

    from amt_tools_tpu.train import init_state, make_train_step

    model = OnsetsFrames2(dim_in=48, profile=profile, model_complexity=2,
                          estimate_velocity=True)

    rng = np.random.RandomState(0)
    dim_out = profile.get_range_len()
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 48, 8).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 8) > 0.9).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()
    batch[tools.KEY_VELOCITY] = (batch[tools.KEY_MULTIPITCH] * 0.7).astype(np.float32)

    device_batch = tools.dict_to_jax(batch)
    state = init_state(model, optax.adam(1e-3), device_batch,
                       rng=jax.random.PRNGKey(0))
    step = make_train_step(model, optax.adam(1e-3), donate=False)

    state, first = step(state, device_batch)
    for _ in range(25):
        state, loss = step(state, device_batch)

    assert (float(loss[tools.KEY_LOSS_VELOCITY]) <
            float(first[tools.KEY_LOSS_VELOCITY]))


def test_velocity_evaluator():
    evaluator = VelocityEvaluator(tolerance=0.1)

    reference = np.zeros((4, 6))
    reference[1, 2] = 0.8
    reference[3, 4] = 0.4

    estimated = np.zeros((4, 6))
    estimated[1, 2] = 0.75    # |err| = 0.05 (within tolerance)
    estimated[3, 4] = 0.6     # |err| = 0.20 (outside)

    results = evaluator.evaluate(estimated, reference)
    np.testing.assert_allclose(results['mae'], 0.125)
    np.testing.assert_allclose(results['within_tolerance'], 0.5)

    # Per-track LS rescale (mir_eval transcription_velocity normalization):
    # two points always admit an exact linear fit
    np.testing.assert_allclose(results['mae_rescaled'], 0.0, atol=1e-9)
    np.testing.assert_allclose(results['within_tolerance_rescaled'], 1.0)

    # With three collinear-breaking points the fit no longer collapses to
    # zero error. The LS family contains the identity, so the rescaled fit
    # can never lose in SQUARED error (MAE may tick up; LS optimizes SSE)
    reference[0, 0] = 0.5
    estimated[0, 0] = 0.5
    results = evaluator.evaluate(estimated, reference)

    est = np.array([0.5, 0.75, 0.6])
    ref = np.array([0.5, 0.8, 0.4])
    design = np.stack([est, np.ones_like(est)], axis=1)
    coef, *_ = np.linalg.lstsq(design, ref, rcond=None)
    assert (np.sum((design @ coef - ref) ** 2)
            <= np.sum((est - ref) ** 2) + 1e-9)
    np.testing.assert_allclose(results['mae_rescaled'],
                               np.mean(np.abs(design @ coef - ref)))

    # No active reference cells -> contributes nothing (no fake perfect
    # score inflating averages), and no NaNs
    empty = evaluator.evaluate(np.zeros((2, 2)), np.zeros((2, 2)))
    assert empty == {}
    assert evaluator.evaluate(None, None) == {}


def test_synthetic_piano_velocity_ground_truth():
    from amt_tools_tpu.datasets.synthetic import SyntheticPiano

    dataset = SyntheticPiano(num_tracks=1, track_duration=2.0,
                             save_data=False, store_data=False,
                             velocity_range=(0.3, 0.9))
    data = dataset.load(dataset.get_tracks('train')[0])

    assert tools.KEY_VELOCITY in data
    vmap_ = data[tools.KEY_VELOCITY]
    active = vmap_[vmap_ > 0]
    assert len(active) > 0
    assert active.min() >= 0.3 - 1e-9 and active.max() <= 0.9 + 1e-9

    # Velocity map active exactly where multi-pitch is active
    np.testing.assert_array_equal(vmap_ > 0, data[tools.KEY_MULTIPITCH] > 0)

    # And per-note velocities read back off the map
    got = tools.extract_note_velocities(data[tools.KEY_NOTES], vmap_,
                                        data[tools.KEY_AUDIO].size /
                                        dataset.sample_rate *
                                        np.linspace(0, 1, vmap_.shape[1],
                                                    endpoint=False),
                                        dataset.profile)
    assert np.all(got >= 0.0) and np.all(got <= 0.9 + 1e-9)


def test_note_velocity_estimator_chain(profile):
    """NoteTranscriber -> NoteVelocityEstimator recovers exact velocities."""

    from amt_tools_tpu.transcribe import (ComboEstimator, NoteTranscriber,
                                          NoteVelocityEstimator)

    times = np.arange(60) * 0.032
    pitches = np.array([60.0, 72.0])
    intervals = np.array([[0.10, 0.50], [0.90, 1.40]])
    velocities = np.array([0.65, 0.30])

    mp = tools.notes_to_multi_pitch(pitches, intervals, times, profile)
    vmap_ = tools.notes_to_velocity(pitches, intervals, velocities, times,
                                    profile)

    combo = ComboEstimator([NoteTranscriber(profile=profile),
                            NoteVelocityEstimator(profile=profile)])

    predictions = combo.process_track({tools.KEY_MULTIPITCH: mp,
                                       tools.KEY_VELOCITY: vmap_,
                                       tools.KEY_TIMES: times}, 'clip')

    notes = np.asarray(predictions[tools.KEY_NOTES]).reshape(-1, 3)
    got = np.asarray(predictions[tools.KEY_NOTE_VELOCITY])

    order = np.argsort(notes[:, 2])
    np.testing.assert_array_equal(notes[order][:, 2], [60.0, 72.0])
    np.testing.assert_allclose(got[order], velocities)
