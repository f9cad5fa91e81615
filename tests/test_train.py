"""Training loop tests: loss decrease, checkpoint/resume, data parallelism."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import GuitarProfile
from amt_tools_tpu.models import TabCNN
from amt_tools_tpu.train import (train, init_state, make_train_step,
                                 save_checkpoint, load_checkpoint,
                                 latest_checkpoint, TrainState)
from amt_tools_tpu.parallel import get_mesh, shard_batch, replicate


@pytest.fixture(scope='module')
def setup():
    """Tiny TabCNN + a fixed synthetic batch the model can overfit."""

    profile = GuitarProfile()
    model = TabCNN(dim_in=48, profile=profile, model_complexity=1)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(4, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (4, 6, 8)).astype(np.float32),
    }

    return model, batch


class _Loader:
    """Minimal re-iterable loader over a list of batches."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def test_train_step_reduces_loss(setup):
    model, batch = setup
    optimizer = optax.adam(1e-3)

    device_batch = tools.dict_to_jax(batch)
    state = init_state(model, optimizer, device_batch, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False)

    state, first_loss = step(state, device_batch)
    for _ in range(30):
        state, loss = step(state, device_batch)

    assert float(loss[tools.KEY_LOSS_TOTAL]) < float(first_loss[tools.KEY_LOSS_TOTAL])
    assert int(state.step) == 31


def test_train_loop_and_resume(setup, tmp_path):
    model, batch = setup
    optimizer = optax.adam(1e-3)
    log_dir = str(tmp_path / 'run')

    loader = _Loader([batch])

    # Train for 4 iterations with 2 checkpoints
    state = train(model, loader, optimizer, iterations=4, checkpoints=2,
                  log_dir=log_dir, rng=jax.random.PRNGKey(0))
    assert int(state.step) == 4

    path, it = latest_checkpoint(log_dir)
    assert it == 4 and path is not None

    # Resume to 6 iterations: should pick up from 4
    state2 = train(model, loader, optimizer, iterations=6, checkpoints=0,
                   log_dir=log_dir, rng=jax.random.PRNGKey(1))
    assert int(state2.step) == 6

    _, it2 = latest_checkpoint(log_dir)
    assert it2 == 6


def test_train_loop_ephemeral(setup, tmp_path, monkeypatch):
    """log_dir=None trains without writing logs or checkpoints anywhere."""

    model, batch = setup
    monkeypatch.chdir(tmp_path)

    state = train(model, _Loader([batch]), optax.adam(1e-3), iterations=2,
                  checkpoints=1, log_dir=None, rng=jax.random.PRNGKey(0))

    assert int(state.step) == 2
    assert list(tmp_path.iterdir()) == []  # nothing written


def test_checkpoint_roundtrip(setup, tmp_path):
    model, batch = setup
    optimizer = optax.adam(1e-3)

    device_batch = tools.dict_to_jax(batch)
    state = init_state(model, optimizer, device_batch, rng=jax.random.PRNGKey(0))

    path = save_checkpoint(state, str(tmp_path), 7)
    assert os.path.exists(path)

    restored = load_checkpoint(path, jax.device_get(state))
    assert int(np.asarray(restored.step)) == 0

    # Parameters identical after restore
    orig = jax.tree_util.tree_leaves(jax.device_get(state.params))
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_step_matches_single_device(setup):
    """The sharded 8-device step must compute the same loss/update as the
    single-device step on the same global batch."""

    model, batch = setup
    optimizer = optax.adam(1e-3)

    assert jax.device_count() == 8
    mesh = get_mesh()

    # Global batch of 8 (divisible by mesh)
    rng = np.random.RandomState(1)
    big_batch = {
        tools.KEY_FEATS: rng.rand(8, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (8, 6, 8)).astype(np.float32),
    }

    device_batch = tools.dict_to_jax(big_batch)
    state = init_state(model, optimizer, device_batch, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False)
    _, loss_single = step(state, device_batch)

    sharded_batch = shard_batch(big_batch, mesh)
    sharded_state = TrainState(
        step=state.step,
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh) if state.batch_stats else {},
        opt_state=replicate(state.opt_state, mesh),
        rng=state.rng)
    step_dp = make_train_step(model, optimizer, mesh=mesh, donate=False)
    new_state, loss_dp = step_dp(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(loss_dp[tools.KEY_LOSS_TOTAL]),
                               float(loss_single[tools.KEY_LOSS_TOTAL]),
                               rtol=1e-5)

    # Updated parameters agree across the strategies
    leaves_a = jax.tree_util.tree_leaves(jax.device_get(step(state, device_batch)[0].params))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_loop_data_parallel(setup, tmp_path):
    model, _ = setup
    optimizer = optax.adam(1e-3)
    mesh = get_mesh()

    rng = np.random.RandomState(2)
    batch = {
        tools.KEY_FEATS: rng.rand(8, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (8, 6, 8)).astype(np.float32),
    }

    state = train(model, _Loader([batch]), optimizer, iterations=2,
                  log_dir=str(tmp_path / 'dp'), mesh=mesh,
                  rng=jax.random.PRNGKey(0))
    assert int(state.step) == 2


def test_bf16_training_decreases_loss():
    """bf16 compute dtype: params/losses stay f32, training converges.

    The paper scripts expose this as ``bf16=true``. Measured on v5e:
    recipe-scale training steps are scan/bandwidth-bound so bf16 is ~parity
    there (O&F2 c3 141 -> 136 ms/step, TabCNN 81 -> 81); the gains are in
    large-batch inference (~1.4x forward at serving scale).
    """

    import jax.numpy as jnp

    from amt_tools_tpu.models import OnsetsFrames2

    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 72, 16).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 16) > 0.9
                               ).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()

    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2,
                          dtype=jnp.bfloat16)
    optimizer = optax.adam(6e-4)

    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer)

    losses = []
    for _ in range(6):
        state, loss = step(state, dict(batch))
        losses.append(float(loss[tools.KEY_LOSS_TOTAL]))

    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    # Parameters and optimizer state stay full precision
    assert all(l.dtype == np.float32
               for l in jax.tree_util.tree_leaves(state.params))


def test_gradient_accumulation_matches_manual_average():
    """accum_steps=k: one update from the average of k microbatch grads.

    Verified against a hand-rolled reference: per-microbatch gradients
    (same dropout rng folding, batch stats threaded in order), averaged.
    The comparison runs through sgd(1.0) so the param delta IS the
    averaged gradient — comparing post-Adam parameters instead would be
    meaningless for the pre-BatchNorm conv biases, whose true gradient is
    ~0 and where Adam amplifies scan-vs-unrolled float rounding noise to
    learning-rate scale.
    """

    import jax.numpy as jnp
    from amt_tools_tpu.models import OnsetsFrames2, run_on_batch
    from amt_tools_tpu.train import init_state, make_train_step

    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(4, 1, 72, 16).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(4, dim_out, 16) > 0.9
                               ).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()

    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2)
    optimizer = optax.sgd(1.0)

    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    accum_step = make_train_step(model, optimizer, accum_steps=2,
                                 donate=False)
    new_state, loss = accum_step(state, dict(batch))

    # sgd(1.0): params_new = params - mean(grads)
    accum_grads = jax.tree_util.tree_map(lambda p0, p1: p0 - p1,
                                         state.params, new_state.params)

    # Manual: two microbatches, per-microbatch dropout rngs, averaged grads
    step_rng = jax.random.fold_in(state.rng, state.step)

    def grads_for(k, batch_stats):
        micro = {key: val[2 * k: 2 * (k + 1)] for key, val in batch.items()}

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': batch_stats}
            output, mutated = run_on_batch(
                model, variables, micro, train=True,
                rngs={'dropout': jax.random.fold_in(step_rng, k)})
            return (output[tools.KEY_LOSS][tools.KEY_LOSS_TOTAL],
                    mutated['batch_stats'])

        return jax.grad(loss_fn, has_aux=True)(state.params)

    g0, stats = grads_for(0, state.batch_stats)
    g1, stats = grads_for(1, stats)
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)

    for a, b in zip(jax.tree_util.tree_leaves(accum_grads),
                    jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # Running statistics advanced through both microbatches
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    assert np.isfinite(float(loss[tools.KEY_LOSS_TOTAL]))


def test_gradient_accumulation_rejects_indivisible_batch():
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state, make_train_step

    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(3, 1, 72, 8).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(3, dim_out, 8) > 0.9
                               ).astype(np.float32),
    }

    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2)
    optimizer = optax.adam(6e-4)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, accum_steps=2)

    with pytest.raises(ValueError, match='divisible'):
        step(state, dict(batch))
