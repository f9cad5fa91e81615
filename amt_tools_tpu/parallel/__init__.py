"""Parallelism: device meshes, sharding rules, and multi-host setup.

The reference is strictly single-device (an unresolved multi-GPU TODO at its
``train.py:62-64``); here data parallelism over a ``jax.sharding.Mesh`` is a
first-class component — batches shard over the ``data`` axis, parameters are
replicated, and XLA inserts the gradient ``psum`` over ICI automatically.
"""

from .mesh import (get_mesh, shard_batch, pad_shard_batch, replicate,
                   data_parallel_shardings, local_batch_to_global)
from .tp import tp_rules_default, shard_params_tp
from .cp import framify_time_sharded, shard_time
from .pp import pipeline_apply, shard_params_pp, stack_stage_params

__all__ = ['get_mesh', 'shard_batch', 'pad_shard_batch', 'replicate',
           'data_parallel_shardings',
           'local_batch_to_global', 'tp_rules_default', 'shard_params_tp',
           'framify_time_sharded', 'shard_time',
           'pipeline_apply', 'shard_params_pp', 'stack_stage_params']
