"""Guards against silent full-batch replication in data-parallel sharding.

The TabCNN recipe uses batch 30 (reference examples/papers/tabcnn.py:52);
on an 8-device mesh that is not divisible, which previously replicated the
whole batch onto every device with no warning.
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.parallel import get_mesh, shard_batch, pad_shard_batch


@pytest.fixture(scope='module')
def mesh():
    return get_mesh()


def _batch(batch_size):
    rng = np.random.RandomState(0)
    return {
        tools.KEY_FEATS: rng.rand(batch_size, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (batch_size, 6, 8)).astype(np.float32),
    }


def test_shard_batch_warns_on_non_divisible(mesh):
    batch = _batch(30)

    with pytest.warns(UserWarning, match='not.*divisible'):
        sharded = shard_batch(batch, mesh)

    # Still correct (replicated), just loud about it
    assert sharded[tools.KEY_FEATS].shape[0] == 30


def test_shard_batch_silent_on_divisible(mesh):
    batch = _batch(32)

    with warnings.catch_warnings():
        warnings.simplefilter('error')
        sharded = shard_batch(batch, mesh)

    # Actually sharded over the data axis
    assert len(sharded[tools.KEY_FEATS].sharding.device_set) == 8


def test_pad_shard_batch_pads_and_masks(mesh):
    batch = _batch(30)

    sharded, valid = pad_shard_batch(batch, mesh)

    assert sharded[tools.KEY_FEATS].shape[0] == 32
    assert sharded[tools.KEY_TABLATURE].shape[0] == 32
    assert valid.shape == (32,)
    assert int(valid.sum()) == 30
    assert not bool(valid[30]) and not bool(valid[31])
    # Padded rows are zeros
    np.testing.assert_array_equal(np.asarray(sharded[tools.KEY_FEATS][30:]), 0.0)
    # Real rows intact and sharded over all devices
    np.testing.assert_allclose(np.asarray(sharded[tools.KEY_FEATS][:30]),
                               batch[tools.KEY_FEATS])
    assert len(sharded[tools.KEY_FEATS].sharding.device_set) == 8


def test_pad_shard_batch_masked_reduction_matches_unpadded(mesh):
    """A masked mean over the padded batch equals the plain mean."""

    batch = _batch(30)
    sharded, valid = pad_shard_batch(batch, mesh)

    @jax.jit
    def masked_mean(x, valid):
        per_example = jnp.sum(x, axis=tuple(range(1, x.ndim)))
        return jnp.sum(per_example * valid) / jnp.sum(valid)

    got = float(masked_mean(sharded[tools.KEY_FEATS], valid))
    want = float(batch[tools.KEY_FEATS].reshape(30, -1).sum(axis=1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)
