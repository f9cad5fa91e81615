"""Production batch serving: audio clips in, note lists out, one executable.

Demonstrates :class:`amt_tools_tpu.serving.TranscriptionPipeline` — the
TPU-native serving surface with no reference counterpart (the reference's
closest flow is the per-track host loop in ``amt_tools/inference.py:12-47``):
feature extraction, the model forward, activation thresholding, and the
full note decode are compiled into ONE XLA executable, and the host
receives fixed-capacity compact note buffers. Dispatch of batch n+1
overlaps finalization of batch n (JAX async dispatch), which is the loop
behind ``bench.py``'s ~19,000x real-time headline.

Run:  python serve_batch.py [checkpoint=<orbax log_dir>] [batch_size=16]
                            [clip_seconds=20] [data_parallel=false]

Without a checkpoint the model serves with activity-calibrated random
weights (pipeline demonstration, not a useful transcription).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import numpy as np

from amt_tools_tpu import tools
from amt_tools_tpu.config import Experiment

ex = Experiment('ServeBatch_OF2_MelSpec')


@ex.config
def config():
    # Number of clips per dispatched batch
    batch_size = 16

    # Seconds of audio per clip (static shape: one compile per length)
    clip_seconds = 20

    # Orbax checkpoint directory (from train()) to serve; empty = random
    # weights with activity-calibrated output biases
    checkpoint = ''

    # Shard clips across all local devices (batch must divide their count)
    data_parallel = False

    # Maximum notes decoded per clip on device
    capacity = 1024

    # Serve the acoustic conv stacks as int8 MXU contractions (identical
    # parameter tree — see ops/qconv.py). 'static' = calibrated per-layer
    # activation scales (measured +12.6% over bf16 on v5e, RESULTS.md);
    # true = calibration-free dynamic scales (slower than bf16); false =
    # bf16 only.
    quant = False


@ex.automain
def serve(batch_size, clip_seconds, checkpoint, data_parallel, capacity,
          quant):
    import jax
    import jax.numpy as jnp

    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.serving import TranscriptionPipeline
    from amt_tools_tpu.datasets.synthetic import render_notes, random_notes

    sample_rate, hop = 16000, 512

    profile = tools.PianoProfile()
    data_proc = MelSpec(sample_rate=sample_rate, hop_length=hop, n_mels=229)
    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=3,
                          dtype=jnp.bfloat16, quant_acoustic=quant)

    # --- parameters: trained checkpoint or calibrated random init ---
    rng = np.random.RandomState(0)

    def probe_batch():
        # Built lazily: only the calibration paths below consume it
        return np.stack([render_notes(*random_notes(profile, clip_seconds,
                                                    30, rng),
                                      sample_rate, clip_seconds, seed=b)
                         for b in range(2)])

    num_samples = int(sample_rate * clip_seconds)
    feats_shape = model.pre_proc({tools.KEY_FEATS: jnp.zeros(
        (1, 1, 229, 1 + num_samples // hop))})

    variables = jax.jit(lambda x: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        x, train=False))(feats_shape[tools.KEY_FEATS])

    if checkpoint:
        import optax

        from amt_tools_tpu.train import (init_state, latest_checkpoint,
                                         load_checkpoint)

        path, iteration = latest_checkpoint(checkpoint)
        if path is None:
            raise FileNotFoundError(f'No checkpoint under {checkpoint}')

        # Abstract state mirroring train()'s optimizer (adam, the paper
        # recipes' default — a schedule-chained optimizer changes the
        # opt_state tree, so serve the matching optimizer if you used one)
        abstract = init_state(model, optax.adam(1e-3),
                              {tools.KEY_FEATS: np.zeros(
                                  (1, 1, 229, 8), np.float32)},
                              rng=jax.random.PRNGKey(0))
        state = load_checkpoint(path, jax.device_get(abstract))

        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        print(f'serving checkpoint at iteration {iteration}: {path}')
    if quant == 'static' or not checkpoint:
        probe = jnp.asarray(probe_batch())

    if quant == 'static':
        # Static int8 needs calibrated activation scales before any forward
        # is interpreted (serve on representative-loudness audio)
        from amt_tools_tpu.serving import calibrate_quant_stats
        variables = calibrate_quant_stats(model, variables, data_proc, probe)

    if not checkpoint:
        # Random weights stay silent (sparse-activity prior); calibrate the
        # output biases to trained-model-like firing rates for the demo
        from amt_tools_tpu.serving import calibrate_activity
        variables = calibrate_activity(model, variables, data_proc, probe)

    mesh = None
    if data_parallel:
        from amt_tools_tpu.parallel import get_mesh
        mesh = get_mesh()
        print(f'data-parallel serving over {mesh.devices.size} devices')

    pipeline = TranscriptionPipeline(model, variables, data_proc,
                                     capacity=capacity, mesh=mesh)

    # --- synthesize a stream of batches (stand-in for real traffic) ---
    def make_batch(seed):
        clips = []
        r = np.random.RandomState(seed)
        for b in range(batch_size):
            pitches, intervals = random_notes(profile, clip_seconds, 30, r)
            clips.append(render_notes(pitches, intervals, sample_rate,
                                      clip_seconds, seed=seed * 997 + b))
        return np.stack(clips)

    batches = [make_batch(s) for s in range(4)]

    # Warm-up (compile)
    pipeline(batches[0])

    # Steady-state serving loop: overlap dispatch n+1 with finalize n
    start = time.perf_counter()
    pending = pipeline.dispatch(batches[0])
    all_notes = []
    for nxt in batches[1:]:
        upcoming = pipeline.dispatch(nxt)
        all_notes.append(pipeline.finalize(pending))
        pending = upcoming
    all_notes.append(pipeline.finalize(pending))
    elapsed = time.perf_counter() - start

    total_notes = sum(len(p) for batch in all_notes for (p, _) in batch)
    audio_seconds = len(batches) * batch_size * clip_seconds
    print(f'{len(batches)} batches x {batch_size} clips x {clip_seconds}s '
          f'in {elapsed:.2f}s -> {audio_seconds / elapsed:.0f}x real time, '
          f'{total_notes} notes decoded on device')

    # Notes arrive as (pitches, (onset, offset) intervals) per clip
    pitches, intervals = all_notes[0][0]
    for p, (on, off) in list(zip(pitches, intervals))[:5]:
        print(f'  pitch {p:5.1f}  {on:7.3f}s -> {off:7.3f}s')
