"""Training loop: jitted data-parallel steps, orbax checkpointing, resume.

Functional re-design of the reference's ``amt_tools/train.py:19-191``:

- The mutable PyTorch loop (zero_grad -> backward -> step) becomes a single
  jitted ``train_step`` (value_and_grad over the total loss + optax update)
  with donated state, compiled once and reused every batch.
- ``torch.save(model)`` whole-object pickles become orbax state checkpoints
  (params + batch stats + optimizer state + step + RNG key — the reference
  leaves dataset RNG state unsaved, its ``train.py:170`` TODO).
- Resume scans the checkpoint directory with the same latest-first semantics
  (``train.py:72-113``).
- Data parallelism: pass a ``jax.sharding.Mesh``; batches shard over the
  ``data`` axis and XLA inserts the gradient all-reduce (first-class here,
  an open TODO in the reference at ``train.py:62-64``).
"""

import os
import re
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import tools
from .evaluate import validate, log_results
from .models.common import run_on_batch

__all__ = [
    'TrainState',
    'init_state',
    'make_train_step',
    'train',
    'trainable_batch',
    'save_checkpoint',
    'load_checkpoint',
    'latest_checkpoint',
]


class TrainState(struct.PyTreeNode):
    """Complete training state: everything needed to resume exactly."""

    step: jnp.ndarray
    params: Any = struct.field(pytree_node=True)
    batch_stats: Any = struct.field(pytree_node=True)
    opt_state: Any = struct.field(pytree_node=True)
    rng: jnp.ndarray = None

    def variables(self):
        """Flax variable collections for model application."""

        variables = {'params': self.params}
        if self.batch_stats:
            variables['batch_stats'] = self.batch_stats

        return variables


def init_state(model, optimizer, example_batch, rng=None):
    """Initialize parameters, batch statistics, and optimizer state."""

    if rng is None:
        rng = jax.random.PRNGKey(0)

    init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)

    batch = model.pre_proc(dict(example_batch))
    # Jitted init: the eager path materializes every intermediate op by op,
    # which on a remote-attached device costs a round trip per op (measured
    # in MINUTES for whole-track inits through the axon tunnel). RNG draws
    # are identical either way (threefry is trace-deterministic).
    init_fn = jax.jit(lambda rngs, feats: model.init(rngs, feats,
                                                     train=False))
    variables = init_fn({'params': init_rng, 'dropout': dropout_rng},
                        batch[tools.KEY_FEATS])

    params = variables['params']
    batch_stats = variables.get('batch_stats', {})

    opt_state = optimizer.init(params)

    return TrainState(step=jnp.asarray(0), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      rng=state_rng)


def make_train_step(model, optimizer, mesh=None, donate=True, accum_steps=1):
    """Build the jitted training step for a model + optimizer pair.

    With a mesh, inputs are expected sharded (``parallel.shard_batch``) and
    XLA emits the gradient ``psum`` over the ``data`` axis automatically.

    ``accum_steps`` > 1 runs gradient accumulation inside the one jitted
    step: the batch splits into that many microbatches, a ``lax.scan``
    computes and averages their gradients (peak activation memory is ONE
    microbatch's), and the optimizer applies a single update — an effective
    batch beyond the HBM limit (composes with ``model.remat``). Gradients
    equal the per-microbatch average exactly; with BatchNorm models the
    running statistics thread through the microbatches sequentially (the
    same statistics ``accum_steps`` separate forward passes would produce),
    and each microbatch draws its own dropout noise.
    """

    def micro_grads(params, batch_stats, batch, rng):
        """Gradients + (loss dict, mutated vars) for one (micro)batch."""

        def loss_fn(params):
            variables = {'params': params}
            if batch_stats:
                variables['batch_stats'] = batch_stats

            output, mutated = run_on_batch(model, variables, batch, train=True,
                                           rngs={'dropout': rng})

            loss = output[tools.KEY_LOSS]

            return loss[tools.KEY_LOSS_TOTAL], (loss, mutated)

        return jax.grad(loss_fn, has_aux=True)(params)

    def apply_update(state, grads, loss, batch_stats):
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state)

        return new_state, loss

    def train_step(state, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)

        grads, (loss, mutated) = micro_grads(state.params, state.batch_stats,
                                             batch, step_rng)

        return apply_update(state, grads, loss,
                            mutated.get('batch_stats', state.batch_stats))

    def train_step_accum(state, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def split(leaf):
            if leaf.shape[0] % accum_steps:
                raise ValueError(f'batch size {leaf.shape[0]} is not '
                                 f'divisible by accum_steps={accum_steps}')
            return leaf.reshape((accum_steps, leaf.shape[0] // accum_steps)
                                + leaf.shape[1:])

        micro = jax.tree_util.tree_map(split, batch)
        first = jax.tree_util.tree_map(lambda x: x[0], micro)

        # Zero accumulators with the exact structures one microbatch yields
        grads_shape, (loss_shape, _) = jax.eval_shape(
            micro_grads, state.params, state.batch_stats, first, step_rng)
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

        def body(carry, xs):
            grads_acc, loss_acc, batch_stats = carry
            microbatch, k = xs

            grads, (loss, mutated) = micro_grads(
                state.params, batch_stats, microbatch,
                jax.random.fold_in(step_rng, k))

            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            loss_acc = jax.tree_util.tree_map(jnp.add, loss_acc, loss)

            return (grads_acc, loss_acc,
                    mutated.get('batch_stats', batch_stats)), None

        carry0 = (zeros(grads_shape), zeros(loss_shape), state.batch_stats)
        (grads, loss, batch_stats), _ = jax.lax.scan(
            body, carry0, (micro, jnp.arange(accum_steps)))

        mean = lambda tree: jax.tree_util.tree_map(
            lambda x: x / accum_steps, tree)

        return apply_update(state, mean(grads), mean(loss), batch_stats)

    step_fn = train_step_accum if accum_steps > 1 else train_step

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


##################################################
# CHECKPOINTING                                  #
##################################################


def _checkpoint_path(log_dir, iteration):
    return os.path.join(os.path.abspath(log_dir),
                        f'{tools.MODEL_STATE}-{iteration}.{tools.CKPT_EXT}')


def save_checkpoint(state, log_dir, iteration):
    """Save the full training state under ``log_dir/model-<iter>.ckpt``."""

    import orbax.checkpoint as ocp

    path = _checkpoint_path(log_dir, iteration)

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, jax.device_get(state), force=True)
    checkpointer.wait_until_finished()

    return path


def latest_checkpoint(log_dir, max_iteration=None):
    """Find the newest checkpoint (optionally capped at ``max_iteration``).

    Returns ``(path, iteration)`` or ``(None, 0)``.
    """

    if not os.path.isdir(log_dir):
        return None, 0

    pattern = re.compile(rf'^{tools.MODEL_STATE}-(\d+)\.{tools.CKPT_EXT}$')

    candidates = []
    for name in os.listdir(log_dir):
        match = pattern.match(name)
        if match:
            iteration = int(match.group(1))
            if max_iteration is None or iteration <= max_iteration:
                candidates.append((iteration, name))

    if not candidates:
        return None, 0

    iteration, name = max(candidates)

    return os.path.join(os.path.abspath(log_dir), name), iteration


def load_checkpoint(path, abstract_state):
    """Restore a training state saved by :func:`save_checkpoint`."""

    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()

    return checkpointer.restore(path, abstract_state)


##################################################
# TRAIN LOOP                                     #
##################################################


def train(model, train_loader, optimizer, iterations, checkpoints=0,
          log_dir='.', scheduler=None, resume=True, single_batch=False,
          val_set=None, estimator=None, evaluator=None, vis_fnc=None,
          state=None, rng=None, mesh=None, writer=None, val_bucket=128,
          val_batch_size=1, accum_steps=1):
    """Training loop (signature-compatible with the reference ``train()``).

    Parameters mirror ``train.py:19-60`` of the reference; JAX-specific
    additions: ``state`` (a prepared TrainState), ``rng`` (seed key),
    ``mesh`` (data-parallel device mesh), ``writer`` (any object with
    ``add_scalar``; defaults to tensorboardX if available, else a no-op).
    ``log_dir=None`` runs ephemerally: no scalar logs, no checkpoint saves,
    no resume scan — useful for benchmarks and throwaway fits.

    ``scheduler`` mirrors the reference's per-iteration LR scheduler
    (``train.py:143-145``): pass an optax-style schedule — a callable
    mapping the optimizer step count to a multiplier on the base learning
    rate (e.g. ``optax.warmup_cosine_decay_schedule(0., 1., 100, 2000)``).
    It is chained onto the optimizer via ``optax.scale_by_schedule``, so its
    state (the step count) lives in ``opt_state`` and survives checkpointing
    and resume. Unlike the reference's epoch-level stepping, the schedule
    advances per optimizer step (per batch) — compute warmup/decay horizons
    in optimizer steps (iterations x batches per pass). Incompatible with a
    prepared ``state`` (raises); chain the schedule into your optimizer
    yourself in that case.

    ``val_bucket`` pads whole-track validation to frame-count buckets so one
    compiled executable serves every track length (0 disables);
    ``val_batch_size`` > 1 evaluates several same-bucket tracks per forward
    (~4x faster whole-dataset validation measured on v5e).

    ``accum_steps`` > 1 enables in-step gradient accumulation (see
    ``make_train_step``): each loader batch splits into that many
    microbatches whose gradients are averaged into one optimizer update,
    bounding peak activation memory at one microbatch's.

    Returns the final TrainState.
    """

    if scheduler is not None:
        if not callable(scheduler):
            raise ValueError('scheduler must be an optax-style schedule: a '
                             'callable mapping step count -> LR multiplier.')
        if state is not None:
            raise ValueError(
                'scheduler and a prepared state cannot be combined: the '
                'schedule is chained onto the optimizer here, so a state '
                'built from any other optimizer mismatches. Either pass '
                'state=None, or chain optax.scale_by_schedule into your '
                'optimizer yourself and pass scheduler=None.')
        optimizer = optax.chain(optimizer, optax.scale_by_schedule(scheduler))

    # log_dir=None: ephemeral run — no scalar logging, no checkpoint saves,
    # no resume scan (checkpoints would have nowhere to live)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)

    if writer is None:
        writer = _make_writer(log_dir) if log_dir is not None \
            else _NullWriter()

    # Peek one batch to initialize state. The peeked iterator is reused for
    # the first pass so no batch is dropped and the loader's shuffle RNG is
    # not advanced by an extra epoch. (Loaders must be re-iterable when
    # iterations > 1.)
    first_iter = iter(train_loader)
    first_batch = next(first_iter)
    device_first = _place_batch(first_batch, mesh)

    import itertools
    pending_pass = itertools.chain([first_batch], first_iter)

    if state is None:
        state = init_state(model, optimizer, device_first, rng=rng)
        if mesh is not None:
            from .parallel import replicate
            state = state.replace(
                params=replicate(state.params, mesh),
                batch_stats=replicate(state.batch_stats, mesh),
                opt_state=replicate(state.opt_state, mesh))

    start_iter = 0

    if resume and log_dir is not None:
        path, ckpt_iter = latest_checkpoint(log_dir, max_iteration=iterations)
        if path is not None:
            state = load_checkpoint(path, jax.device_get(state))
            state = jax.tree_util.tree_map(jnp.asarray, state)
            start_iter = ckpt_iter

    train_step = make_train_step(model, optimizer, mesh=mesh,
                                 accum_steps=accum_steps)

    pending_log = None  # previous pass's loss reduction, fetched async

    for global_iter in range(start_iter, iterations):
        # Loop through the dataset (one pass per outer iteration); the first
        # pass consumes the iterator the init batch was peeked from
        epoch = pending_pass if pending_pass is not None else train_loader
        pending_pass = None

        # Losses stay on device during the pass (a per-step np.asarray would
        # synchronize and defeat JAX's async dispatch); the device-put
        # look-ahead keeps the next batch's transfer overlapped with compute
        epoch_losses = []

        for device_batch in _prefetch_batches(epoch, mesh):
            state, loss = train_step(state, device_batch)

            epoch_losses.append(loss)

            if single_batch:
                break

        # ONE jitted reduction for the whole pass's losses, fetched
        # asynchronously and logged at the NEXT pass boundary: the earlier
        # eager per-key stacking + blocking per-key np.asarray cost several
        # round trips per pass on remote-attached devices (~1.9 s/pass
        # through the axon tunnel, the largest term of the loop/step gap),
        # and even one blocking fetch idles the host behind the device's
        # queued steps while the next pass's crops could already be under
        # way. Scalars reach the writer one pass later in WALL time but at
        # their own `step`, so logs/plots are unchanged (RESULTS.md round 4).
        pending_log = _flush_loss_log(writer, pending_log)
        pending_log = (_start_loss_reduction(epoch_losses), global_iter + 1)

        local_iter = global_iter - start_iter

        if checkpoints == 0:
            checkpoint = False
        else:
            checkpoint = (local_iter + 1) % max(1, iterations // checkpoints) == 0

        done_training = (global_iter + 1) == iterations

        if checkpoint or done_training:
            if log_dir is not None:
                save_checkpoint(state, log_dir, global_iter + 1)

            if vis_fnc is not None:
                vis_fnc(model, state, global_iter + 1)

            if checkpoint and val_set is not None and evaluator is not None:
                validate(model, state.variables(), val_set, evaluator,
                         estimator, bucket=val_bucket,
                         batch_size=val_batch_size)
                evaluator.finalize(writer, global_iter + 1)

    _flush_loss_log(writer, pending_log)

    return state


@jax.jit
def _pack_loss_means(losses):
    """Per-key means of a tuple of flat loss dicts as one (K,) vector.

    Key order is sorted; the whole pass reduces in one dispatch and ships
    in one transfer (retraces only when the pass length or key set
    changes).
    """

    keys = sorted(losses[0])

    return jnp.stack([
        jnp.mean(jnp.stack([l[k] for l in losses]).astype(jnp.float32))
        for k in keys])


def _start_loss_reduction(epoch_losses):
    """Dispatch one pass's loss reduction and start its async host copy.

    Returns an opaque handle for :func:`_flush_loss_log`; None when the
    pass produced no losses.
    """

    if not epoch_losses:
        return None

    keys = sorted(epoch_losses[0])
    packed = _pack_loss_means(tuple(epoch_losses))

    try:
        packed.copy_to_host_async()
    except Exception:
        pass  # best-effort: np.asarray in the flush works either way

    return keys, packed


def _flush_loss_log(writer, pending_log):
    """Log a previously started loss reduction (blocking fetch, usually a
    no-op by now thanks to the async copy). Returns None for reassignment."""

    if pending_log is None:
        return None

    reduction, step = pending_log
    if reduction is not None:
        keys, packed = reduction
        values = np.asarray(packed)
        log_results({k: float(v) for k, v in zip(keys, values)}, writer,
                    step=step, tag=f'{tools.TRAIN}/{tools.KEY_LOSS}')

    return None


def _prefetch_batches(iterable, mesh, depth=2):
    """Yield device-placed batches with a transfer look-ahead of ``depth``."""

    from collections import deque

    queue = deque()
    for batch in iterable:
        queue.append(_place_batch(batch, mesh))
        if len(queue) >= depth:
            yield queue.popleft()

    while queue:
        yield queue.popleft()


def trainable_batch(batch):
    """Strip unbatchable entries (track ids, notes, pitch lists) from a batch.

    Use this before feeding loader batches into a jitted train step directly;
    the ``train()`` loop applies it automatically.
    """

    return {k: v for k, v in batch.items()
            if tools.utils._is_array(v) and k not in
            (tools.KEY_NOTES, tools.KEY_PITCHLIST, tools.KEY_TRACK)}


_trainable_batch = trainable_batch


def _place_batch(batch, mesh):
    """Move a host batch onto device(s).

    Raw audio and frame times never flow into the jitted step (models
    train on precomputed features; losses use frame-aligned labels), so
    they are not uploaded — at recipe shapes the audio is over half the
    batch's bytes. They stay in the HOST batch for callers that want them.
    """

    batch = _trainable_batch(batch)

    if tools.KEY_FEATS in batch:
        for key in (tools.KEY_AUDIO, tools.KEY_TIMES):
            batch.pop(key, None)

    if mesh is not None:
        from .parallel import shard_batch
        return shard_batch(batch, mesh)

    return tools.dict_to_jax(batch)


class _NullWriter:
    """No-op scalar writer used when tensorboardX is unavailable."""

    def add_scalar(self, *args, **kwargs):
        pass

    def close(self):
        pass


def _make_writer(log_dir):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        return _NullWriter()
