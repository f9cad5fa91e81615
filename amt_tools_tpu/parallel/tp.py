"""Tensor-parallel parameter sharding rules.

The transcription models are small enough that data parallelism alone covers
the paper workloads, but the mesh plumbing is kept general (SURVEY §2.8): a
second ``model`` axis can shard the wide projection matrices — the acoustic
models' dense layers, the hoisted LSTM input projections, and the output
heads — column-wise across devices. XLA inserts the all-gathers/reductions
implied by the shardings; no explicit collectives are written.

Usage::

    mesh = get_mesh(axis_names=('data', 'model'), shape=(4, 2))
    state = state.replace(params=shard_params_tp(state.params, mesh))
    batch = shard_batch(batch, mesh)          # 'data' axis as usual
    train_step = make_train_step(model, optimizer, mesh=mesh)
"""

import re

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ['tp_rules_default', 'shard_params_tp']


def tp_rules_default(axis='model'):
    """Default param-path -> PartitionSpec rules for the built-in models.

    Column-parallel sharding of every wide kernel: dense/dense1 projections,
    LSTM input projections + recurrent kernels, and output-layer Dense
    kernels. Biases and small parameters stay replicated.
    """

    return [
        # Hoisted LSTM input projections: (E, 4H) sharded on 4H
        (r'.*input_proj(_fwd|_bwd)?/kernel$', P(None, axis)),
        (r'.*recurrent_kernel(_fwd|_bwd)?$', P(None, axis)),
        # Acoustic model / TabCNN dense projections: (E, D) sharded on D
        (r'.*(Dense_\d+|dense1)/kernel$', P(None, axis)),
        # Grouped acoustic stack: per-head dense kernels (H, E, D) on D
        (r'.*head_kernels$', P(None, axis)),
    ]


def _param_spec(path, rules):
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec

    return P()


def shard_params_tp(params, mesh, rules=None, axis='model'):
    """Place parameters on the mesh according to tensor-parallel rules.

    Kernels whose sharded dimension is not divisible by the axis size fall
    back to replication (correctness first).
    """

    if rules is None:
        rules = tp_rules_default(axis)

    axis_size = mesh.shape[axis]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    placed = []
    for key_path, leaf in flat:
        path = '/'.join(str(getattr(k, 'key', k)) for k in key_path)
        spec = _param_spec(path, rules)

        # Head-fused (nn.vmap-stacked) kernels carry extra leading axes;
        # left-pad the spec so the rule's dims keep naming the trailing ones
        if len(spec) and leaf.ndim > len(spec):
            spec = P(*((None,) * (leaf.ndim - len(spec)) + tuple(spec)))

        # Check divisibility of each sharded dimension
        for dim, name in enumerate(spec):
            if name is not None and (leaf.ndim <= dim or
                                     leaf.shape[dim] % axis_size != 0):
                spec = P()
                break

        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))

    return jax.tree_util.tree_unflatten(treedef, placed)
