"""Checkpoint-resume must continue training exactly (RNG lives in the state)."""

import numpy as np
import pytest

import jax
import optax

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import GuitarProfile
from amt_tools_tpu.models import TabCNN
from amt_tools_tpu.train import train


class _Loader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        return iter([self.batch])


@pytest.fixture(scope='module')
def fixture():
    profile = GuitarProfile()
    model = TabCNN(dim_in=48, profile=profile, model_complexity=1)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(4, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (4, 6, 8)).astype(np.float32),
    }

    return model, batch


def test_resume_exact_continuation(fixture, tmp_path):
    """train(6) in one shot == train(3) then resume to 6, parameter-exact.

    This validates that everything training depends on (params, optimizer
    state, step counter, dropout RNG) round-trips through the checkpoint —
    the RNG folding by step makes the dropout streams line up.
    """

    model, batch = fixture
    loader = _Loader(batch)

    # One-shot run to 6 iterations
    opt = optax.adam(1e-3)
    state_a = train(model, loader, opt, iterations=6, checkpoints=0,
                    log_dir=str(tmp_path / 'oneshot'), resume=False,
                    rng=jax.random.PRNGKey(7))

    # Interrupted run: 3 iterations, checkpoint, fresh process resumes to 6
    opt = optax.adam(1e-3)
    train(model, loader, opt, iterations=3, checkpoints=1,
          log_dir=str(tmp_path / 'resumed'), resume=False,
          rng=jax.random.PRNGKey(7))

    opt = optax.adam(1e-3)
    state_b = train(model, loader, opt, iterations=6, checkpoints=0,
                    log_dir=str(tmp_path / 'resumed'), resume=True,
                    rng=jax.random.PRNGKey(123))  # different seed: must be ignored

    assert int(state_a.step) == int(state_b.step) == 6

    leaves_a = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

def test_scheduler_resume_exact(fixture, tmp_path):
    """A warmup/decay schedule's state (step count) survives checkpointing.

    Mirrors the reference's per-iteration scheduler stepping
    (reference train.py:143-145) via optax.scale_by_schedule: one-shot
    train(6) == train(3) + resume(6) bit-for-bit, and the schedule actually
    changes the trajectory (different params than the unscheduled run).
    """

    import optax as _optax
    model, batch = fixture
    loader = _Loader(batch)

    schedule = _optax.warmup_cosine_decay_schedule(
        init_value=0.1, peak_value=1.0, warmup_steps=2, decay_steps=6)

    state_a = train(model, loader, _optax.adam(1e-3), iterations=6,
                    checkpoints=0, log_dir=str(tmp_path / 'sched_oneshot'),
                    resume=False, rng=jax.random.PRNGKey(7),
                    scheduler=schedule)

    train(model, loader, _optax.adam(1e-3), iterations=3, checkpoints=1,
          log_dir=str(tmp_path / 'sched_resumed'), resume=False,
          rng=jax.random.PRNGKey(7), scheduler=schedule)
    state_b = train(model, loader, _optax.adam(1e-3), iterations=6,
                    checkpoints=0, log_dir=str(tmp_path / 'sched_resumed'),
                    resume=True, rng=jax.random.PRNGKey(123),
                    scheduler=schedule)

    # Unscheduled control: must diverge from the scheduled runs
    state_c = train(model, loader, _optax.adam(1e-3), iterations=6,
                    checkpoints=0, log_dir=str(tmp_path / 'sched_control'),
                    resume=False, rng=jax.random.PRNGKey(7))

    leaves_a = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
    leaves_c = jax.tree_util.tree_leaves(jax.device_get(state_c.params))

    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    assert any(not np.allclose(np.asarray(a), np.asarray(c))
               for a, c in zip(leaves_a, leaves_c))


def test_scheduler_must_be_callable(fixture, tmp_path):
    model, batch = fixture
    with pytest.raises(ValueError, match='callable'):
        train(model, _Loader(batch), optax.adam(1e-3), iterations=1,
              log_dir=str(tmp_path), scheduler='step_lr')
