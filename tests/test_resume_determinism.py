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
