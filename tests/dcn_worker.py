"""Multi-process (DCN) worker: one data-parallel train step on a global mesh.

Launched by ``test_multiprocess_dcn.py`` as 2 processes x 4 virtual CPU
devices = one 8-device global mesh. Each process feeds only its local half
of the batch through ``local_batch_to_global``
(``jax.make_array_from_process_local_data``); XLA's gradient all-reduce then
spans processes over DCN — the multi-node plan of SURVEY §2.8 that the
reference leaves as a TODO (its ``train.py:62-64``).

Usage: ``python dcn_worker.py <coordinator_port> <process_id> <num_processes>``
Prints ``DCN_LOSS <loss>`` and ``DCN_PARAM <checksum>`` on success.
"""

import os
import sys


def main():
    port, process_id, num_processes = (int(a) for a in sys.argv[1:4])

    # Must be set before jax import: virtual local devices for this process
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    flags = ' '.join(f for f in flags.split()
                     if 'xla_force_host_platform_device_count' not in f)
    os.environ['XLA_FLAGS'] = (flags +
                               ' --xla_force_host_platform_device_count=4').strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')

    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=num_processes,
                               process_id=process_id)

    import numpy as np
    import optax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from amt_tools_tpu import tools
    from amt_tools_tpu.tools.instrument import GuitarProfile
    from amt_tools_tpu.models import TabCNN
    from amt_tools_tpu.parallel import get_mesh, local_batch_to_global, replicate
    from amt_tools_tpu.train import init_state, make_train_step

    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes

    mesh = get_mesh()  # 1-D data mesh over ALL global devices

    # The full deterministic batch; each process contributes its own half
    rng = np.random.RandomState(0)
    full_batch = {
        tools.KEY_FEATS: rng.rand(8, 1, 48, 8).astype(np.float32),
        tools.KEY_TABLATURE: rng.randint(-1, 20, (8, 6, 8)).astype(np.float32),
    }
    local = {k: v[process_id * 4:(process_id + 1) * 4]
             for k, v in full_batch.items()}

    global_batch = local_batch_to_global(local, mesh)
    assert global_batch[tools.KEY_FEATS].shape[0] == 8

    profile = GuitarProfile()
    model = TabCNN(dim_in=48, profile=profile, model_complexity=1)
    optimizer = optax.adam(1e-3)

    state = init_state(model, optimizer, global_batch, rng=jax.random.PRNGKey(0))
    state = state.replace(params=replicate(state.params, mesh),
                          batch_stats=replicate(state.batch_stats, mesh),
                          opt_state=replicate(state.opt_state, mesh))

    step = make_train_step(model, optimizer, mesh=mesh, donate=False)
    new_state, loss = step(state, global_batch)

    total = float(loss[tools.KEY_LOSS_TOTAL])

    # Checksum over the (replicated) updated parameters: must agree across
    # processes and with the single-process run
    leaves = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    checksum = float(sum(np.sum(np.asarray(l, dtype=np.float64)) for l in leaves))

    print(f'DCN_LOSS {total:.10f}')
    print(f'DCN_PARAM {checksum:.10f}')

    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
