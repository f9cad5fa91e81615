"""Freeze the serving pipeline into a deployment artifact and smoke it.

Demonstrates :mod:`amt_tools_tpu.export` — no reference counterpart (the
reference's inference needs the full torch model zoo importable on every
serving host, ``amt_tools/inference.py:12-47``): one ``jax.export`` call
captures audio -> features -> forward -> threshold -> note decode as a
single StableHLO module with the weights baked in, and the loader side
needs only jax + numpy.

Run:  python export_artifact.py [checkpoint=<orbax log_dir>]
                                [out=serving.amtx] [clip_seconds=20]
                                [quant=false] [capacity=1024]

Without a checkpoint the artifact freezes activity-calibrated random
weights (deployment-flow demonstration, not a useful transcription).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import numpy as np

from amt_tools_tpu import tools
from amt_tools_tpu.config import Experiment

ex = Experiment('ExportArtifact_OF2_MelSpec')


@ex.config
def config():
    # Orbax checkpoint directory (from train()) to freeze; empty = random
    # weights with activity-calibrated output biases
    checkpoint = ''

    # Artifact path
    out = 'serving.amtx'

    # Seconds of audio per clip (static: baked into the artifact)
    clip_seconds = 20

    # Serve the acoustic stacks as int8 MXU contractions (ops/qconv.py):
    # 'static' = calibrated activation scales (fast mode), true = dynamic
    # scales (calibration-free), false = bf16
    quant = False

    # Maximum notes decoded per clip on device
    capacity = 1024


@ex.automain
def export(checkpoint, out, clip_seconds, quant, capacity):
    import jax
    import jax.numpy as jnp

    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.serving import TranscriptionPipeline, calibrate_activity
    from amt_tools_tpu.export import save_serving, load_serving
    from amt_tools_tpu.datasets.synthetic import render_notes, random_notes

    sample_rate, hop = 16000, 512

    profile = tools.PianoProfile()
    data_proc = MelSpec(sample_rate=sample_rate, hop_length=hop, n_mels=229)
    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=3,
                          dtype=jnp.bfloat16, quant_acoustic=quant)

    rng = np.random.RandomState(0)
    num_samples = int(sample_rate * clip_seconds)
    feats_shape = model.pre_proc({tools.KEY_FEATS: jnp.zeros(
        (1, 1, 229, 1 + num_samples // hop))})

    variables = jax.jit(lambda x: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        x, train=False))(feats_shape[tools.KEY_FEATS])

    def probe_batch(seed, count=2):
        r = np.random.RandomState(seed)
        return np.stack([render_notes(*random_notes(profile, clip_seconds,
                                                    30, r),
                                      sample_rate, clip_seconds, seed=seed + b)
                         for b in range(count)])

    if checkpoint:
        import optax

        from amt_tools_tpu.train import (init_state, latest_checkpoint,
                                         load_checkpoint)

        path, iteration = latest_checkpoint(checkpoint)
        if path is None:
            raise FileNotFoundError(f'No checkpoint under {checkpoint}')

        abstract = init_state(model, optax.adam(1e-3),
                              {tools.KEY_FEATS: np.zeros(
                                  (1, 1, 229, 8), np.float32)},
                              rng=jax.random.PRNGKey(0))
        state = load_checkpoint(path, jax.device_get(abstract))

        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        print(f'freezing checkpoint at iteration {iteration}: {path}')
    if quant == 'static':
        # Calibrated scales must exist before export freezes the graph
        from amt_tools_tpu.serving import calibrate_quant_stats
        variables = calibrate_quant_stats(model, variables, data_proc,
                                          jnp.asarray(probe_batch(7)))

    if not checkpoint:
        variables = calibrate_activity(model, variables, data_proc,
                                       jnp.asarray(probe_batch(0)))

    pipeline = TranscriptionPipeline(model, variables, data_proc,
                                     capacity=capacity)

    # batch_size matters only when symbolic-batch export is unsupported
    # (e.g. Pallas custom calls on TPU): pin it to the smoke batch below so
    # the fallback artifact still serves this script's probe
    meta = save_serving(out, pipeline, num_samples, batch_size=2)
    size_mb = os.path.getsize(out) / 1e6
    print(f'wrote {out}: {size_mb:.1f} MB, {meta}')

    # --- deployment-side smoke: reload and compare against the live run.
    # Note agreement, not bit-equality: the artifact and the live pipeline
    # are two separately compiled executables of the same program, and in
    # bf16 their fusion-order rounding can flip logits sitting exactly on
    # the 0.5 threshold (f32 pipelines round-trip bit-identically, see
    # tests/test_export.py).
    artifact = load_serving(out)
    audio = probe_batch(7)

    frozen = artifact(audio)
    live = pipeline(jnp.asarray(audio))

    for clip, ((p_f, i_f), (p_l, i_l)) in enumerate(zip(frozen, live)):
        set_f = {(p, round(on, 4), round(off, 4))
                 for p, (on, off) in zip(p_f, i_f)}
        set_l = {(p, round(on, 4), round(off, 4))
                 for p, (on, off) in zip(p_l, i_l)}
        common = len(set_f & set_l)
        print(f'clip {clip}: artifact {len(set_f)} notes / live '
              f'{len(set_l)}, agreeing {common}')
