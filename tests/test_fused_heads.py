"""GroupedAcousticModel: fused-head layout equals the per-head stacks.

The grouped stack (``models/onsetsframes.py:GroupedAcousticModel``) is a
layout transformation of the per-head ``AcousticModel``s — block-diagonal
grouped convs + per-channel BatchNorm — so converting a per-head checkpoint
with ``fuse_acoustic_variables`` must reproduce the per-head outputs
exactly (reference architecture: ``/root/reference/amt_tools/models/
onsetsframes.py:330-463``, one stack per head).
"""

import numpy as np
import pytest

import jax
import jax.tree_util as jtu

from amt_tools_tpu import tools
from amt_tools_tpu.models import OnsetsFrames, OnsetsFrames2
from amt_tools_tpu.models.common import run_on_batch
from amt_tools_tpu.models.onsetsframes import (fuse_acoustic_variables,
                                               unfuse_acoustic_variables)


def _make_batch(rng, dim_out, num_frames=16):
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 72, num_frames).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, num_frames) > 0.9
                               ).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()

    return batch


@pytest.mark.parametrize('model_cls', [OnsetsFrames, OnsetsFrames2])
def test_fused_heads_matches_per_head(model_cls):
    profile = tools.PianoProfile()
    rng = np.random.RandomState(0)
    dim_out = profile.get_range_len()
    batch = _make_batch(rng, dim_out)

    kw = dict(dim_in=72, profile=profile, model_complexity=2)
    m_ref = model_cls(fused_heads=False, **kw)
    m_fused = model_cls(fused_heads=True, **kw)

    pre = m_ref.pre_proc(dict(batch))
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v_ref = m_ref.init(rngs, pre[tools.KEY_FEATS], train=False)

    v_conv = fuse_acoustic_variables(v_ref, m_ref.head_names)

    # The converted tree must match the fused model's own init structure
    v_shape = jax.eval_shape(
        lambda: m_fused.init(rngs, pre[tools.KEY_FEATS], train=False))
    assert (jtu.tree_structure(v_shape) == jtu.tree_structure(v_conv))
    for (path, a), (_, b) in zip(jtu.tree_flatten_with_path(v_shape)[0],
                                 jtu.tree_flatten_with_path(v_conv)[0]):
        assert a.shape == b.shape, (path, a.shape, b.shape)

    out_ref, _ = run_on_batch(m_ref, v_ref, batch, train=False)
    out_fused, _ = run_on_batch(m_fused, v_conv, batch, train=False)

    for key in (tools.KEY_ONSETS, tools.KEY_MULTIPITCH):
        np.testing.assert_allclose(np.asarray(out_ref[key]),
                                   np.asarray(out_fused[key]), atol=1e-5)

    loss_ref = float(out_ref[tools.KEY_LOSS][tools.KEY_LOSS_TOTAL])
    loss_fused = float(out_fused[tools.KEY_LOSS][tools.KEY_LOSS_TOTAL])
    assert abs(loss_ref - loss_fused) < 1e-3

    # Unfusing restores the original tree bit-for-bit
    v_back = unfuse_acoustic_variables(v_conv, m_ref.head_names)
    for (path, a), (_, b) in zip(jtu.tree_flatten_with_path(v_ref)[0],
                                 jtu.tree_flatten_with_path(v_back)[0]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), path


def test_fused_heads_with_velocity_head():
    profile = tools.PianoProfile()
    rng = np.random.RandomState(1)
    dim_out = profile.get_range_len()
    batch = _make_batch(rng, dim_out)
    batch[tools.KEY_VELOCITY] = (batch[tools.KEY_MULTIPITCH] *
                                 rng.rand(2, dim_out, 16)).astype(np.float32)

    kw = dict(dim_in=72, profile=profile, model_complexity=2,
              estimate_velocity=True)
    m_ref = OnsetsFrames2(fused_heads=False, **kw)
    m_fused = OnsetsFrames2(fused_heads=True, **kw)

    assert m_ref.head_names == ('pitch', 'onset', 'offset', 'velocity')

    pre = m_ref.pre_proc(dict(batch))
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v_ref = m_ref.init(rngs, pre[tools.KEY_FEATS], train=False)
    v_conv = fuse_acoustic_variables(v_ref, m_ref.head_names)

    out_ref, _ = run_on_batch(m_ref, v_ref, batch, train=False)
    out_fused, _ = run_on_batch(m_fused, v_conv, batch, train=False)

    np.testing.assert_allclose(np.asarray(out_ref[tools.KEY_VELOCITY]),
                               np.asarray(out_fused[tools.KEY_VELOCITY]),
                               atol=1e-5)
