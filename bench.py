"""Headline benchmark: full-pipeline (audio -> notes) real-time factor + MFU.

Measures audio-seconds transcribed per wall-clock second per chip for the
flagship Onsets & Frames v2 pipeline — on-device MelSpec feature extraction
fused into the jitted forward pass, thresholded frame/onset activations, and
the FULL note decode on device (``ops.decode.notes_on_device``): the host
receives fixed-capacity compact note buffers (pitch, onset frame, offset
frame, count), so the hot loop ships notes, not activation maps, and host
work is O(notes) per clip.

Also reports achieved model FLOP/s against the chip's peak (MFU), computed
from the compiled executable's XLA cost analysis.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``vs_baseline`` is the ratio against the 100x-real-time north-star target
(BASELINE.json) — the reference itself publishes no benchmark numbers and its
librosa+PyTorch pipeline is strictly slower than real time on CPU features.

``python bench.py sweep`` additionally prints a batch-size sweep to stderr
(dispatch-latency knee diagnostics); ``python bench.py breakdown`` prints
per-component timings (mel / forward / decode / fused pipeline).
"""

import json
import os
import sys
import time

import numpy as np

NOTE_CAPACITY = 2048  # per 60 s clip; ~17 notes/s headroom vs ~2/s typical


def _log(msg):
    """Progress to stderr (stdout carries only the one JSON line)."""

    print(f'[bench] {msg}', file=sys.stderr, flush=True)




def build_pipeline(batch_size, clip_seconds=60.0, complexity=3):
    import jax
    import jax.numpy as jnp

    from amt_tools_tpu import tools
    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.datasets.synthetic import render_notes, random_notes
    from amt_tools_tpu.ops import decode

    sample_rate, hop = 16000, 512

    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=sample_rate, hop_length=hop, n_mels=229)
    # bf16 serving: params stay f32, compute runs in bfloat16 (measured
    # 1.39x on the full forward on v5e); losses/decode stay f32-accurate
    model = OnsetsFrames2(dim_in=229, profile=profile,
                          model_complexity=complexity,
                          dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    clips = []
    for b in range(batch_size):
        pitches, intervals = random_notes(profile, clip_seconds, 120, rng)
        clips.append(render_notes(pitches, intervals, sample_rate,
                                  clip_seconds, seed=b))
    audio = jnp.asarray(np.stack(clips))

    num_frames = mel.get_expected_frames(clips[0])
    feats_shape = model.pre_proc(
        {tools.KEY_FEATS: jnp.zeros((batch_size, 1, 229, num_frames))})
    init_fn = jax.jit(lambda rngs, feats: model.init(rngs, feats, train=False))
    variables = init_fn({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)},
                        feats_shape[tools.KEY_FEATS])
    jax.block_until_ready(variables)

    # Activity calibration: shift the output-head biases so the untrained
    # network fires at trained-model-like rates (multi-pitch ~3% of cells,
    # onsets ~2 impulses/s/clip). Decode cost is activity-dependent; with
    # raw random weights the sparse-activity bias prior keeps every output
    # silent and the note decode would be benchmarked on empty maps.
    from amt_tools_tpu.serving import TranscriptionPipeline, calibrate_activity

    variables = calibrate_activity(model, variables, mel,
                                   jnp.asarray(np.stack(clips[:4])))

    pipeline = TranscriptionPipeline(model, variables, mel,
                                     capacity=NOTE_CAPACITY)

    return pipeline, audio


def measure(pipeline, audio, runs=8):
    """Steady-state pipelined throughput: dispatch batch n+1 (JAX async)
    before host-finalizing batch n, as a production serving loop would."""

    start = time.perf_counter()
    pending = pipeline.dispatch(audio)
    for _ in range(runs - 1):
        upcoming = pipeline.dispatch(audio)
        pipeline.finalize(pending)
        pending = upcoming
    notes = pipeline.finalize(pending)
    elapsed = time.perf_counter() - start

    return elapsed, notes


def main():
    import jax

    cache_dir = os.path.expanduser('~/.cache/jax')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    batch_size, clip_seconds, runs = 128, 60.0, 8

    _log('building pipeline (initializing parameters)...')
    pipeline, audio = build_pipeline(batch_size, clip_seconds)

    from amt_tools_tpu import profiling

    _log('compiling device pipeline...')
    t0 = time.perf_counter()
    # Model+feature FLOPs per dispatched batch, from XLA's own accounting
    flops_per_run = 0.0
    try:
        flops_per_run = profiling.compiled_flops(
            pipeline._pipeline, pipeline.variables, audio)
    except Exception as exc:
        _log(f'cost analysis unavailable: {exc}')
    _log(f'compile: {time.perf_counter() - t0:.1f}s')

    # Warm-up run (also materializes any lazy host state)
    t0 = time.perf_counter()
    pipeline(audio)
    _log(f'first run: {time.perf_counter() - t0:.1f}s')

    elapsed, notes = measure(pipeline, audio, runs)

    total_notes = sum(len(p) for p, _ in notes)
    _log(f'decoded {total_notes} notes/batch on device '
         f'({total_notes / max(1, len(notes))} per clip avg)')

    audio_seconds = batch_size * clip_seconds
    rtf = audio_seconds * runs / elapsed

    achieved_flops = flops_per_run * runs / elapsed
    peak = profiling.peak_flops(jax.devices()[0])
    mfu = achieved_flops / peak if peak else 0.0
    _log(f'achieved {achieved_flops / 1e12:.2f} TFLOP/s, peak {peak / 1e12:.0f} '
         f'TFLOP/s (bf16), MFU {mfu * 100:.2f}%')

    result = {
        'metric': 'full_pipeline_realtime_factor',
        'value': round(rtf, 2),
        'unit': 'audio-sec/sec/chip',
        'vs_baseline': round(rtf / 100.0, 3),
        'mfu_pct': round(mfu * 100, 2),
        'achieved_tflops': round(achieved_flops / 1e12, 2),
        'notes_per_batch': total_notes,
    }
    print(json.dumps(result))


def breakdown():
    """Per-component timings at the headline config (stderr only).

    Times each pipeline stage in isolation with a forced device sync —
    the where-does-the-time-go table behind the headline number.
    """

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import tools
    from amt_tools_tpu.ops import decode

    pipeline, audio = build_pipeline(128, 60.0)
    model, variables, mel = pipeline.model, pipeline.variables, pipeline.data_proc

    num_frames = 1 + audio.shape[-1] // 512
    feats = jax.jit(lambda a: model.pre_proc(
        {tools.KEY_FEATS: mel.process_jax(a)})[tools.KEY_FEATS])(audio)
    jax.block_until_ready(feats)

    raw = jax.jit(lambda v, f: model.apply(v, f, train=False))(variables, feats)
    mp = decode.threshold(jax.nn.sigmoid(
        jnp.swapaxes(raw[tools.KEY_MULTIPITCH], -1, -2)), 0.5)
    on = decode.threshold(jax.nn.sigmoid(
        jnp.swapaxes(raw[tools.KEY_ONSETS], -1, -2)), 0.5)
    jax.block_until_ready((mp, on))

    def timeit(name, fn, *args, runs=6):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(runs):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        _log(f'{name:28s} {(time.perf_counter() - t0) / runs * 1e3:7.1f} ms')

    timeit('mel frontend', jax.jit(mel.process_jax), audio)
    timeit('model forward (O&F2 c3)',
           jax.jit(lambda v, f: model.apply(v, f, train=False)),
           variables, feats)
    timeit('note decode',
           jax.jit(jax.vmap(lambda m, o: decode.notes_on_device(
               m, o, capacity=NOTE_CAPACITY))), mp, on)
    timeit('fused pipeline (end to end)',
           pipeline._pipeline, pipeline.variables, audio)


def sweep():
    """Batch-size sweep: find the dispatch-latency knee (stderr only)."""

    import jax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    for batch_size in (1, 4, 16, 64, 128, 192):
        pipeline, audio = build_pipeline(batch_size)
        pipeline(audio)  # compile+warm
        elapsed, _ = measure(pipeline, audio, runs=6)
        rtf = batch_size * 60.0 * 6 / elapsed
        per_dispatch_ms = elapsed / 6 * 1000
        _log(f'batch {batch_size:4d}: {rtf:10.1f}x RT, '
             f'{per_dispatch_ms:7.1f} ms/dispatch')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'sweep':
        sweep()
    elif len(sys.argv) > 1 and sys.argv[1] == 'breakdown':
        breakdown()
    else:
        main()
