"""Pipeline parallelism on the real flagship models.

Proves the GPipe machinery (``parallel/pp.py``) carries the actual
Onsets & Frames models — heterogeneous conv/LSTM/dense stages mapped onto
uniform dispatch-by-index stages (``parallel/pp_flagship.py``) — with
logits exactly matching the sequential ``model.apply`` and gradients
flowing end-to-end (including v2's ``detach_heads`` stop-gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from amt_tools_tpu import tools
from amt_tools_tpu.models import OnsetsFrames, OnsetsFrames2
from amt_tools_tpu.parallel.pp_flagship import (flagship_pipeline_forward,
                                                flagship_stage_names)
from amt_tools_tpu.tools.instrument import PianoProfile


def _setup(cls, batch, frames=12, dim_in=16, **kwargs):
    model = cls(dim_in=dim_in, profile=PianoProfile(), in_channels=1,
                model_complexity=2, **kwargs)

    feats = jax.random.normal(jax.random.PRNGKey(0),
                              (batch, frames, dim_in, 1))
    variables = model.init(jax.random.PRNGKey(1), feats[:1], False, None)

    return model, variables, feats


def _pipe_mesh(model, extra_axes=()):
    stages = len(flagship_stage_names(model))
    shape = [stages] + [n for _, n in extra_axes]
    count = int(np.prod(shape))

    devices = np.array(jax.devices()[:count]).reshape(shape)
    return Mesh(devices, ('pipe',) + tuple(name for name, _ in extra_axes))


def _assert_matches(model, variables, feats, output):
    reference = model.apply(variables, feats, False, None)

    assert set(output) == set(reference)
    for key in reference:
        np.testing.assert_allclose(output[key], reference[key],
                                   rtol=2e-5, atol=2e-5, err_msg=key)


def test_onsetsframes2_pipeline_exact():
    """4-stage (pitch/onset/offset/refine) v2 == sequential forward."""

    model, variables, feats = _setup(OnsetsFrames2, batch=8)
    mesh = _pipe_mesh(model)

    output = flagship_pipeline_forward(model, variables, feats, mesh,
                                       num_micro=4)

    _assert_matches(model, variables, feats, output)


def test_onsetsframes2_pipeline_dp_x_pp():
    """The same 4 stages composed with a data axis (2 x 4 mesh)."""

    model, variables, feats = _setup(OnsetsFrames2, batch=8)
    mesh = _pipe_mesh(model, extra_axes=(('data', 2),))

    output = flagship_pipeline_forward(model, variables, feats, mesh,
                                       num_micro=4, batch_axis='data')

    _assert_matches(model, variables, feats, output)


def test_onsetsframes_v1_pipeline_exact():
    """v1 maps to 3 stages (pitch/onset/refine)."""

    model, variables, feats = _setup(OnsetsFrames, batch=6)
    mesh = _pipe_mesh(model)

    output = flagship_pipeline_forward(model, variables, feats, mesh,
                                       num_micro=3)

    _assert_matches(model, variables, feats, output)


def test_onsetsframes2_velocity_pipeline_exact():
    """The velocity head becomes a 5th stage (5-device pipe)."""

    model, variables, feats = _setup(OnsetsFrames2, batch=5,
                                     estimate_velocity=True)
    mesh = _pipe_mesh(model)

    output = flagship_pipeline_forward(model, variables, feats, mesh,
                                       num_micro=5)

    assert tools.KEY_VELOCITY in output
    _assert_matches(model, variables, feats, output)


def test_pipeline_gradients_match_sequential():
    """d loss / d feats agrees with the sequential model — the schedule,
    switch dispatch, and detach_heads stop-gradients all differentiate."""

    from amt_tools_tpu.parallel.pp import pipeline_apply, shard_params_pp
    from amt_tools_tpu.parallel.pp_flagship import (flagship_pipeline_params,
                                                    flagship_stage_fn,
                                                    pack_pipeline_inputs,
                                                    unpack_pipeline_outputs)

    model, variables, feats = _setup(OnsetsFrames2, batch=4, frames=8)
    mesh = _pipe_mesh(model)

    # Sharded stage params live outside the differentiated function (the
    # explicit device_puts in shard_params_pp must not be grad-traced)
    stage_params = shard_params_pp(flagship_pipeline_params(model, variables),
                                   mesh)
    stage_fn = flagship_stage_fn(model, feats.shape[1:])

    def seq_loss(feats):
        out = model.apply(variables, feats, False, None)
        return sum(jnp.sum(out[k] ** 2) for k in
                   (tools.KEY_ONSETS, tools.KEY_MULTIPITCH))

    def pipe_loss(feats):
        payload = pack_pipeline_inputs(model, feats, num_micro=4)
        payload = pipeline_apply(stage_params, payload, stage_fn, mesh)
        out = unpack_pipeline_outputs(model, payload,
                                      feats.shape[2] * feats.shape[3])
        return sum(jnp.sum(out[k] ** 2) for k in
                   (tools.KEY_ONSETS, tools.KEY_MULTIPITCH))

    grad_seq = jax.jit(jax.grad(seq_loss))(feats)
    grad_pipe = jax.jit(jax.grad(pipe_loss))(feats)

    np.testing.assert_allclose(grad_pipe, grad_seq, rtol=5e-4, atol=5e-5)
