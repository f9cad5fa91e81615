"""Device mesh construction and data-parallel sharding helpers.

TPU-native scaling design (SURVEY §2.8): a 1-D ``data`` mesh axis over all
local devices (ICI within a slice); multi-host runs extend the same mesh over
DCN via ``jax.distributed.initialize``. Batches are sharded on their leading
axis, parameters/optimizer state are replicated, and the compiled train step
gets its gradient all-reduce from XLA — no explicit collective calls needed.
A ``model`` axis is provisioned for future tensor parallelism (the models'
output layers are small, so TP is headroom, not a requirement).
"""

import warnings

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    'get_mesh',
    'shard_batch',
    'pad_shard_batch',
    'replicate',
    'data_parallel_shardings',
    'local_batch_to_global',
]


def get_mesh(devices=None, axis_names=('data',), shape=None):
    """Build a device mesh; 1-D over all devices by default.

    ``shape`` reshapes the device list for multi-axis meshes, e.g.
    ``get_mesh(axis_names=('data', 'model'), shape=(4, 2))``.
    """

    if devices is None:
        devices = jax.devices()

    devices = np.asarray(devices)

    if shape is not None:
        devices = devices.reshape(shape)
    elif len(axis_names) == 1:
        devices = devices.reshape(-1)
    else:
        raise ValueError('shape is required for multi-axis meshes.')

    return Mesh(devices, axis_names)


def data_parallel_shardings(mesh, axis='data'):
    """(batch_sharding, replicated_sharding) for a data-parallel step."""

    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    return batch_sharding, replicated


def shard_batch(batch, mesh, axis='data'):
    """Place a host batch dict onto the mesh, sharded on the leading axis.

    Leaves whose leading dimension is not divisible by the mesh axis size
    (or scalars) are replicated instead. Replicating a batched leaf means
    every device runs the FULL batch — axis_size times the work — so a
    warning is raised when that happens; use a device-divisible batch size
    (drop the remainder in the loader) or :func:`pad_shard_batch`.
    """

    batch_sharding, replicated = data_parallel_shardings(mesh, axis)
    axis_size = mesh.shape[axis]

    def place(leaf):
        leaf = np.asarray(leaf) if not hasattr(leaf, 'ndim') else leaf
        if getattr(leaf, 'ndim', 0) >= 1 and leaf.shape[0] % axis_size == 0:
            return jax.device_put(leaf, batch_sharding)
        if getattr(leaf, 'ndim', 0) >= 1 and leaf.shape[0] > 1:
            warnings.warn(
                f'shard_batch: leaf with leading dim {leaf.shape[0]} is not '
                f'divisible by mesh axis "{axis}" ({axis_size}); replicating '
                f'it — every device computes the full batch. Use a divisible '
                f'batch size or pad_shard_batch().', stacklevel=3)
        return jax.device_put(leaf, replicated)

    return jax.tree_util.tree_map(place, batch)


def pad_shard_batch(batch, mesh, axis='data'):
    """Zero-pad batched leaves to a mesh-divisible size, then shard.

    Returns ``(sharded_batch, valid)`` where ``valid`` is a sharded bool
    vector over the padded leading axis marking real examples. Callers use
    it to mask per-example losses/metrics; padding rows are zeros. Leaves
    whose leading dimension differs from the (majority) batch size are
    replicated unchanged.
    """

    axis_size = mesh.shape[axis]
    batch_sharding, replicated = data_parallel_shardings(mesh, axis)

    sizes = [leaf.shape[0] for leaf in jax.tree_util.tree_leaves(batch)
             if getattr(leaf, 'ndim', 0) >= 1]
    if not sizes:
        raise ValueError('pad_shard_batch: no batched leaves to shard.')
    batch_size = max(set(sizes), key=sizes.count)
    padded_size = -(-batch_size // axis_size) * axis_size

    def place(leaf):
        # Don't pull device-resident leaves through the host unless padding
        # actually has to happen
        if not hasattr(leaf, 'ndim'):
            leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == batch_size:
            if padded_size != batch_size:
                leaf = np.asarray(leaf)
                pad = np.zeros((padded_size - batch_size,) + leaf.shape[1:],
                               dtype=leaf.dtype)
                leaf = np.concatenate([leaf, pad], axis=0)
            return jax.device_put(leaf, batch_sharding)
        return jax.device_put(leaf, replicated)

    valid = np.arange(padded_size) < batch_size
    return (jax.tree_util.tree_map(place, batch),
            jax.device_put(valid, batch_sharding))


def replicate(tree, mesh):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""

    _, replicated = data_parallel_shardings(mesh)

    return jax.device_put(tree, replicated)


def local_batch_to_global(local_batches, mesh, axis='data'):
    """Assemble per-process local batches into one global sharded array.

    Multi-host entry point: each process contributes its local shard
    (``jax.make_array_from_process_local_data``). On a single process this is
    equivalent to :func:`shard_batch`.
    """

    batch_sharding, _ = data_parallel_shardings(mesh, axis)

    def place(leaf):
        return jax.make_array_from_process_local_data(batch_sharding, np.asarray(leaf))

    return jax.tree_util.tree_map(place, local_batches)
