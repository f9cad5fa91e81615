"""Pipeline parallelism: GPipe schedule == sequential stage execution."""

import numpy as np

import jax
import jax.numpy as jnp

from amt_tools_tpu.parallel import (get_mesh, pipeline_apply, shard_params_pp,
                                    stack_stage_params)


def _stage_fn(params, y):
    """One pipeline stage: a gated residual dense block (shape-preserving)."""

    w, b = params['w'], params['b']
    return y + jnp.tanh(y @ w + b)


def _make_stages(num_stages, width, rng):
    per_stage = [{'w': jnp.asarray(rng.randn(width, width) * 0.3,
                                   dtype=jnp.float32),
                  'b': jnp.asarray(rng.randn(width) * 0.1, dtype=jnp.float32)}
                 for _ in range(num_stages)]
    return per_stage, stack_stage_params(per_stage)


def _sequential(per_stage, x):
    for params in per_stage:
        x = jax.vmap(lambda mb, p=params: _stage_fn(p, mb))(x)
    return x


def test_pipeline_matches_sequential():
    rng = np.random.RandomState(0)
    num_stages, num_micro, mb, width = 4, 6, 2, 16

    mesh = get_mesh(devices=jax.devices()[:num_stages], axis_names=('pipe',))
    per_stage, stacked = _make_stages(num_stages, width, rng)
    stacked = shard_params_pp(stacked, mesh)

    x = jnp.asarray(rng.randn(num_micro, mb, width), dtype=jnp.float32)

    got = pipeline_apply(stacked, x, _stage_fn, mesh)
    ref = _sequential(per_stage, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    rng = np.random.RandomState(1)
    num_stages, num_micro, mb, width = 4, 5, 2, 8

    mesh = get_mesh(devices=jax.devices()[:num_stages], axis_names=('pipe',))
    per_stage, stacked = _make_stages(num_stages, width, rng)
    sharded = shard_params_pp(stacked, mesh)

    x = jnp.asarray(rng.randn(num_micro, mb, width), dtype=jnp.float32)
    target = jnp.asarray(rng.randn(num_micro, mb, width), dtype=jnp.float32)

    def loss_pp(params):
        out = pipeline_apply(params, x, _stage_fn, mesh)
        return jnp.mean((out - target) ** 2)

    def loss_seq(stacked_params):
        per = [jax.tree_util.tree_map(lambda p, s=s: p[s], stacked_params)
               for s in range(num_stages)]
        return jnp.mean((_sequential(per, x) - target) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(sharded)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)

    for got, ref in zip(jax.tree_util.tree_leaves(g_pp),
                        jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


def test_pipeline_composes_with_data_parallelism():
    """dp x pp: microbatches shard over 'data' while stages pipeline."""

    rng = np.random.RandomState(2)
    num_stages, num_micro, mb, width = 4, 6, 4, 16

    mesh = get_mesh(devices=jax.devices()[:8], axis_names=('data', 'pipe'),
                    shape=(2, num_stages))
    per_stage, stacked = _make_stages(num_stages, width, rng)

    # Params: stage-sharded over 'pipe', replicated over 'data'
    stacked = shard_params_pp(stacked, mesh)

    x = jnp.asarray(rng.randn(num_micro, mb, width), dtype=jnp.float32)

    got = pipeline_apply(stacked, x, _stage_fn, mesh, batch_axis='data')
    ref = _sequential(per_stage, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_stage_count_mismatch_raises():
    import pytest

    rng = np.random.RandomState(3)
    mesh = get_mesh(devices=jax.devices()[:4], axis_names=('pipe',))
    _, stacked = _make_stages(3, 8, rng)  # 3 stages on a 4-device axis

    with pytest.raises(ValueError):
        shard_params_pp(stacked, mesh)
