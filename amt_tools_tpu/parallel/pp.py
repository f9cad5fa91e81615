"""Pipeline parallelism: GPipe-style microbatch schedule over a ``pipe`` axis.

Beyond-reference scaling capability (the reference has no parallelism of any
kind, SURVEY §2.8): a stack of S sequential stages is laid out one stage per
device along a ``pipe`` mesh axis, and M microbatches flow through the
classic GPipe schedule — at tick t, device d runs stage d on microbatch
``t - d`` while its predecessor's output for microbatch ``t - d + 1`` is in
flight over ICI (``jax.lax.ppermute`` inside ``shard_map``). The whole
schedule is a ``lax.scan`` over ``M + S - 1`` ticks, so it jits to one
executable, differentiates (reverse-mode flows back through the permutes),
and composes with a ``data`` axis on the same mesh (dp x pp).

Pipeline bubble: the first/last ``S - 1`` ticks run partially idle; the
steady-state efficiency is ``M / (M + S - 1)`` — pick M >> S as usual.

The models shipped here are small enough that dp (+tp) covers the paper
workloads; this module is the general mechanism for deeper stage-uniform
stacks (e.g. multi-layer recurrent language models).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ['pipeline_apply', 'shard_params_pp', 'stack_stage_params']


def stack_stage_params(per_stage_params):
    """Stack a list of S identical-structure stage pytrees on a new axis 0."""

    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves),
                                  *per_stage_params)


def shard_params_pp(stage_params, mesh, axis='pipe'):
    """Place stage-stacked parameters (leading axis S) one stage per device."""

    size = mesh.shape[axis]

    def place(leaf):
        if leaf.shape[0] != size:
            raise ValueError(
                f'stage-stacked leaf has leading dim {leaf.shape[0]}, but '
                f'mesh axis "{axis}" has {size} devices — one stage per '
                f'device is required.')
        spec = P(*((axis,) + (None,) * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, stage_params)


def pipeline_apply(stage_params, x, stage_fn, mesh, axis='pipe',
                   batch_axis=None):
    """Run microbatches through S pipelined stages: one stage per device.

    Parameters
    ----------
    stage_params : pytree
        Stage-stacked parameters — every leaf carries a leading axis of
        size S = ``mesh.shape[axis]`` (see :func:`stack_stage_params`),
        sharded one-stage-per-device (:func:`shard_params_pp`).
    x : ndarray (M, mb, ...)
        M microbatches. Every stage must map an (mb, ...) activation to an
        identically-shaped one (uniform pipe buffer — the ppermute payload).
    stage_fn : callable
        ``stage_fn(params_s, y) -> y`` for a single stage.
    mesh : jax.sharding.Mesh
        Mesh carrying the ``axis`` dimension (optionally others, e.g. a
        ``data`` axis for dp x pp).
    batch_axis : str, optional
        Name of a mesh axis the microbatch dimension (axis 1 of ``x``) is
        data-parallel over; activations then stay sharded across it through
        the pipeline.

    Returns
    -------
    (M, mb, ...) outputs, replicated over the ``axis`` dimension.
    """

    num_stages = mesh.shape[axis]
    num_micro = x.shape[0]

    # Microbatch batch dim optionally sharded over a data axis
    data_spec = (batch_axis,) + (None,) * (x.ndim - 2)
    x_spec = P(*((None,) + data_spec))
    param_spec = P(axis)

    forward = [(i, i + 1) for i in range(num_stages - 1)]

    def local_fn(params, x_local):
        # My stage's parameters (shard_map leaves the leading block axis)
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage_id = jax.lax.axis_index(axis)

        def tick(carry, t):
            cur, out = carry

            # Stage 0 ingests microbatch t (clipped reads past the end feed
            # garbage that is never emitted)
            x_t = jax.lax.dynamic_index_in_dim(
                x_local, jnp.clip(t, 0, num_micro - 1), keepdims=False)
            inp = jnp.where(stage_id == 0, x_t, cur)

            y = stage_fn(params, inp)

            # The last stage emits microbatch t - (S - 1)
            out_idx = jnp.clip(t - (num_stages - 1), 0, num_micro - 1)
            emit = jnp.logical_and(stage_id == num_stages - 1,
                                   t >= num_stages - 1)
            prev = jax.lax.dynamic_index_in_dim(out, out_idx, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(emit, y, prev), out_idx, 0)

            # Hand my activation to the next stage over ICI
            cur = jax.lax.ppermute(y, axis, forward)

            return (cur, out), None

        # The carries become device-varying over the pipe axis (ppermute /
        # per-stage writes); their initial zeros must carry the same type
        def _varying(v):
            if hasattr(jax.lax, 'pcast'):
                return jax.lax.pcast(v, axis, to='varying')
            return jax.lax.pvary(v, axis)

        carry0 = (_varying(jnp.zeros_like(x_local[0])),
                  _varying(jnp.zeros_like(x_local)))
        (cur, out), _ = jax.lax.scan(tick, carry0,
                                     jnp.arange(num_micro + num_stages - 1))

        # Only the last stage holds real outputs; sum-replicate across the
        # pipe axis (all other contributions are zero)
        out = jnp.where(stage_id == num_stages - 1, out, jnp.zeros_like(out))

        return jax.lax.psum(out, axis)

    return shard_map(local_fn, mesh=mesh,
                     in_specs=(param_spec, x_spec),
                     out_specs=x_spec)(stage_params, x)
