"""Two-process DCN data parallelism == single-process (SURVEY §2.8).

Spawns 2 subprocesses (4 virtual CPU devices each) that form one 8-device
global mesh via ``jax.distributed.initialize``; each contributes its local
half-batch through ``local_batch_to_global`` and runs one jitted train step.
Both processes' loss and updated-parameter checksum must agree with each
other and with the same step executed on a single-process 8-device mesh.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _parse(output):
    loss = float(re.search(r'DCN_LOSS ([\-\d.]+)', output).group(1))
    param = float(re.search(r'DCN_PARAM ([\-\d.]+)', output).group(1))
    return loss, param


@pytest.fixture(scope='module')
def dcn_outputs():
    port = _free_port()
    num_processes = 2

    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, 'dcn_worker.py'),
         str(port), str(pid), str(num_processes)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(num_processes)]

    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        outputs.append((proc.returncode, out))

    return outputs


def test_both_processes_succeed(dcn_outputs):
    for rc, out in dcn_outputs:
        assert rc == 0, f'worker failed:\n{out[-3000:]}'


def test_processes_agree(dcn_outputs):
    results = [_parse(out) for rc, out in dcn_outputs]
    (loss0, param0), (loss1, param1) = results

    assert np.isfinite(loss0)
    np.testing.assert_allclose(loss0, loss1, rtol=1e-7)
    np.testing.assert_allclose(param0, param1, rtol=1e-7)


def test_matches_single_process(dcn_outputs):
    """The distributed step reproduces the single-process 8-device step."""

    import jax
    import optax

    from amt_tools_tpu import tools
    from amt_tools_tpu.tools.instrument import GuitarProfile
    from amt_tools_tpu.models import TabCNN
    from amt_tools_tpu.parallel import get_mesh, shard_batch, replicate
    from amt_tools_tpu.train import init_state, make_train_step

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(8, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (8, 6, 8)).astype(np.float32),
    }

    mesh = get_mesh()
    sharded = shard_batch(batch, mesh)

    model = TabCNN(dim_in=48, profile=GuitarProfile(), model_complexity=1)
    optimizer = optax.adam(1e-3)

    state = init_state(model, optimizer, sharded, rng=jax.random.PRNGKey(0))
    state = state.replace(params=replicate(state.params, mesh),
                          batch_stats=replicate(state.batch_stats, mesh),
                          opt_state=replicate(state.opt_state, mesh))

    step = make_train_step(model, optimizer, mesh=mesh, donate=False)
    new_state, loss = step(state, sharded)

    leaves = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    checksum = float(sum(np.sum(np.asarray(l, dtype=np.float64)) for l in leaves))

    dcn_loss, dcn_param = _parse(dcn_outputs[0][1])

    np.testing.assert_allclose(float(loss[tools.KEY_LOSS_TOTAL]), dcn_loss,
                               rtol=1e-6)
    np.testing.assert_allclose(checksum, dcn_param, rtol=1e-6)
