"""Context parallelism: time-axis sharding with halo exchange.

Long-track headroom beyond the reference (SURVEY §5.7): per-frame models
with bounded receptive fields (TabCNN's 9-frame windows) can shard the TIME
axis of a whole track across the mesh. Each device holds a contiguous block
of frames and fetches the ``frame_width // 2``-frame halos from its
neighbors over ICI (``jax.lax.ppermute`` inside ``shard_map``) — the edge
devices receive zeros, matching the zero padding an unsharded run applies
at the track boundaries, so the windows are IDENTICAL to the unsharded
ones. The per-window model then runs embarrassingly parallel under GSPMD.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import frames as frame_ops

__all__ = ['framify_time_sharded', 'shard_time']


def shard_time(feats, mesh, axis='data'):
    """Place (..., T) features on the mesh, sharded on the time axis.

    T must divide evenly by the mesh axis (pad the track first otherwise).
    """

    size = mesh.shape[axis]
    if feats.shape[-1] % size:
        raise ValueError(f'time axis ({feats.shape[-1]} frames) must be '
                         f'divisible by the mesh axis ({size}); pad first.')

    spec = P(*((None,) * (feats.ndim - 1) + (axis,)))

    return jax.device_put(feats, NamedSharding(mesh, spec))


def framify_time_sharded(feats, win_length, mesh, axis='data'):
    """(..., T) time-sharded activations -> (..., T, W) context windows.

    Produces exactly ``ops.frames.framify(feats, win_length, pad=True)``
    without ever gathering the track onto one device: interior window
    overlap comes from neighbor halos over ICI; track edges see zeros.
    ``win_length // 2`` must not exceed the per-device block length.
    """

    size = mesh.shape[axis]
    halo = win_length // 2

    if feats.shape[-1] % size:
        raise ValueError('time axis must divide the mesh axis; pad first.')
    if halo > feats.shape[-1] // size:
        raise ValueError(f'halo ({halo}) exceeds the per-device block '
                         f'({feats.shape[-1] // size} frames); use fewer '
                         f'devices or longer tracks.')

    in_spec = P(*((None,) * (feats.ndim - 1) + (axis,)))
    out_spec = P(*((None,) * (feats.ndim - 1) + (axis, None)))

    fwd = [(i, i + 1) for i in range(size - 1)]   # my right edge -> next's left halo
    bwd = [(i + 1, i) for i in range(size - 1)]   # my left edge -> prev's right halo

    def local_fn(local):
        if halo == 0:
            # Single-frame windows need no neighbor context (and [-0:]
            # would slice the whole block)
            return frame_ops.framify(local, win_length, pad=True)

        # ppermute leaves devices with no source at ZERO — exactly the
        # zero padding the unsharded framify applies at track edges
        left = jax.lax.ppermute(local[..., -halo:], axis, fwd)
        right = jax.lax.ppermute(local[..., :halo], axis, bwd)

        ext = jnp.concatenate([left, local, right], axis=-1)

        return frame_ops.framify(ext, win_length, pad=False)

    return shard_map(local_fn, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(feats)
