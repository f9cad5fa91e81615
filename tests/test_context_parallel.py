"""Time-sharded windowing with halo exchange == unsharded framify/TabCNN."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.ops import frames as frame_ops
from amt_tools_tpu.parallel import get_mesh
from amt_tools_tpu.parallel.cp import framify_time_sharded, shard_time


@pytest.fixture(scope='module')
def mesh():
    return get_mesh()


def test_framify_matches_unsharded(mesh):
    rng = np.random.RandomState(0)
    feats = rng.rand(2, 1, 16, 64).astype(np.float32)   # T=64 over 8 devices

    want = np.asarray(frame_ops.framify(jnp.asarray(feats), 9, pad=True))

    sharded = shard_time(jnp.asarray(feats), mesh)
    got = np.asarray(framify_time_sharded(sharded, 9, mesh))

    np.testing.assert_array_equal(got, want)


def test_framify_edge_zeros(mesh):
    """Track-edge windows see zeros, exactly like the unsharded zero pad."""

    feats = jnp.ones((1, 1, 4, 64))
    sharded = shard_time(feats, mesh)
    windows = np.asarray(framify_time_sharded(sharded, 9, mesh))

    # First frame's window: 4 zero-padded slots then ones
    np.testing.assert_array_equal(windows[0, 0, 0, 0], [0, 0, 0, 0, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(windows[0, 0, 0, -1], [1, 1, 1, 1, 1, 0, 0, 0, 0])


def test_validation_errors(mesh):
    with pytest.raises(ValueError, match='divisible'):
        shard_time(jnp.zeros((1, 1, 4, 30)), mesh)
    with pytest.raises(ValueError, match='halo'):
        framify_time_sharded(jnp.zeros((1, 1, 4, 16)), 9, mesh)


def test_tabcnn_whole_track_time_sharded(mesh):
    """TabCNN logits over a time-sharded track == single-device logits."""

    from amt_tools_tpu.models import TabCNN
    from amt_tools_tpu.parallel import replicate

    profile = tools.GuitarProfile()
    model = TabCNN(dim_in=48, profile=profile, model_complexity=1)

    rng = np.random.RandomState(1)
    feats = rng.rand(1, 1, 48, 128).astype(np.float32)   # (B, C, F, T)

    pre = model.pre_proc({tools.KEY_FEATS: jnp.asarray(feats)})
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           pre[tools.KEY_FEATS], train=False)

    want = np.asarray(model.apply(variables, pre[tools.KEY_FEATS],
                                  train=False)[tools.KEY_TABLATURE])

    # Context-parallel path: halo-exchange windows, then the per-window
    # model runs under GSPMD with the window batch sharded along time
    sharded_feats = shard_time(jnp.asarray(feats), mesh)
    windows = framify_time_sharded(sharded_feats, model.frame_width, mesh)
    windows = jnp.transpose(windows, (0, 3, 2, 4, 1))     # (B, T, F, W, C)

    variables_r = replicate(variables, mesh)
    got = np.asarray(model.apply(variables_r, windows,
                                 train=False)[tools.KEY_TABLATURE])

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_framify_win_length_one(mesh):
    """halo == 0: single-frame windows, no neighbor exchange."""

    feats = jnp.asarray(np.random.RandomState(2).rand(1, 1, 4, 64)
                        .astype(np.float32))
    want = np.asarray(frame_ops.framify(feats, 1, pad=True))
    got = np.asarray(framify_time_sharded(shard_time(feats, mesh), 1, mesh))
    np.testing.assert_array_equal(got, want)
