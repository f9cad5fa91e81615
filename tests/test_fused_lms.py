"""Grouped language models: one scan, identical math, converters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.models import (OnsetsFrames, OnsetsFrames2,
                                  fuse_lm_variables, unfuse_lm_variables)
from amt_tools_tpu.tools.instrument import PianoProfile


@pytest.mark.parametrize('velocity', [False, True])
@pytest.mark.parametrize('use_lengths', [False, True])
def test_fused_lms_matches_per_head_lms(velocity, use_lengths):
    """fused_lms=True + fused variables == per-head model, all heads."""

    profile = PianoProfile()
    kw = dict(dim_in=48, profile=profile, model_complexity=2,
              estimate_velocity=velocity)

    m_ref = OnsetsFrames2(fused_lms=False, **kw)
    m_fused = OnsetsFrames2(fused_lms=True, **kw)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(2, 9, 48, 1).astype(np.float32))
    lengths = jnp.asarray([9, 5]) if use_lengths else None

    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v_ref = m_ref.init(rngs, feats, train=False)
    v_fused = fuse_lm_variables(v_ref, m_ref._fused_lm_streams)

    # The converted tree matches what the fused model initializes
    v_check = m_fused.init(rngs, feats, train=False)
    assert (jax.tree_util.tree_structure(v_check)
            == jax.tree_util.tree_structure(v_fused))

    out_ref = m_ref.apply(v_ref, feats, train=False, lengths=lengths)
    out_fused = m_fused.apply(v_fused, feats, train=False, lengths=lengths)

    assert set(out_ref) == set(out_fused)
    for key in out_ref:
        np.testing.assert_allclose(np.asarray(out_fused[key]),
                                   np.asarray(out_ref[key]),
                                   rtol=1e-5, atol=1e-5, err_msg=key)

    # Round trip back to the per-head layout
    v_back = unfuse_lm_variables(v_fused, m_ref._fused_lm_streams)
    for a, b in zip(jax.tree_util.tree_leaves(v_back),
                    jax.tree_util.tree_leaves(v_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_lms_trains():
    import optax

    from amt_tools_tpu.train import init_state, make_train_step

    profile = PianoProfile()
    dim_out = profile.get_range_len()
    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 48, 12).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 12) > 0.9
                               ).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()

    model = OnsetsFrames2(dim_in=48, profile=profile, model_complexity=2,
                          fused_lms=True)
    state = init_state(model, optax.adam(6e-4), batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optax.adam(6e-4))

    losses = []
    for _ in range(5):
        state, loss = step(state, dict(batch))
        losses.append(float(loss[tools.KEY_LOSS_TOTAL]))

    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_fused_lms_rejects_v1():
    profile = PianoProfile()
    model = OnsetsFrames(dim_in=48, profile=profile, model_complexity=2,
                         fused_lms=True)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 6, 48, 1).astype(np.float32))

    with pytest.raises(ValueError, match='fused_lms'):
        model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, feats, train=False)


def test_converters_validate_stream_arity():
    profile = PianoProfile()
    m = OnsetsFrames2(dim_in=48, profile=profile, model_complexity=2,
                      estimate_velocity=True)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 6, 48, 1).astype(np.float32))
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v = m.init(rngs, feats, train=False)

    # 3 LM subtrees present, but only 2 streams named
    with pytest.raises(ValueError, match='velocity'):
        fuse_lm_variables(v, ('onset', 'offset'))

    fused = fuse_lm_variables(v, m._fused_lm_streams)

    # 3-stream group, but the default 2-stream order requested
    with pytest.raises(ValueError, match='streams'):
        unfuse_lm_variables(fused, ('onset', 'offset'))


def test_fused_lms_rejected_by_online_model():
    from amt_tools_tpu.models import OnsetsFramesOnline

    profile = PianoProfile()
    model = OnsetsFramesOnline(dim_in=48, profile=profile,
                               model_complexity=2, fused_lms=True)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 6, 48, 1).astype(np.float32))

    with pytest.raises(ValueError, match='online'):
        model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, feats, train=False)
