"""Tensor-parallel sharding: dp+tp mesh matches the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import PianoProfile
from amt_tools_tpu.models import OnsetsFrames
from amt_tools_tpu.train import init_state, make_train_step, TrainState
from amt_tools_tpu.parallel import (get_mesh, shard_batch, replicate,
                                    shard_params_tp)


@pytest.fixture(scope='module')
def setup():
    profile = PianoProfile()
    model = OnsetsFrames(dim_in=48, profile=profile, model_complexity=2)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(4, 1, 48, 8).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(4, 88, 8) > 0.9).astype(np.float32),
    }

    return model, batch


def test_tp_param_placement(setup):
    model, batch = setup
    mesh = get_mesh(axis_names=('data', 'model'), shape=(4, 2))

    opt = optax.adam(1e-3)
    state = init_state(model, opt, tools.dict_to_jax(batch),
                       rng=jax.random.PRNGKey(0))

    params_tp = shard_params_tp(state.params, mesh)

    # At least one wide kernel is sharded across the model axis
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(params_tp)
        if len(leaf.sharding.device_set) == 8 and
        leaf.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert len(sharded) > 0


def test_dp_tp_step_matches_single_device(setup):
    """A (4 data x 2 model) sharded training step must equal the unsharded one.

    SGD keeps updates proportional to gradients — Adam's first step is
    sign-like (lr * g/|g|), which blows up benign reduction-order noise
    around exactly-zero gradients into full-lr differences.
    """

    model, batch = setup
    mesh = get_mesh(axis_names=('data', 'model'), shape=(4, 2))

    opt = optax.sgd(1e-2)

    device_batch = tools.dict_to_jax(batch)
    state = init_state(model, opt, device_batch, rng=jax.random.PRNGKey(0))

    step = make_train_step(model, opt, donate=False)
    ref_state, ref_loss = step(state, device_batch)

    # dp+tp: batch over 'data', wide kernels over 'model'
    sharded_state = TrainState(
        step=state.step,
        params=shard_params_tp(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh) if state.batch_stats else {},
        opt_state=replicate(state.opt_state, mesh),
        rng=state.rng)
    sharded_batch = shard_batch(batch, mesh)

    step_tp = make_train_step(model, opt, mesh=mesh, donate=False)
    new_state, loss = step_tp(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(loss[tools.KEY_LOSS_TOTAL]),
                               float(ref_loss[tools.KEY_LOSS_TOTAL]),
                               rtol=2e-5)

    leaves_ref = jax.tree_util.tree_leaves(jax.device_get(ref_state.params))
    leaves_tp = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    for a, b in zip(leaves_ref, leaves_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
