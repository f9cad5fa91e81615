"""Headline benchmark: full-pipeline (audio -> notes) real-time factor.

Measures audio-seconds transcribed per wall-clock second per chip for the
flagship Onsets & Frames v2 pipeline — on-device MelSpec feature extraction
fused into the jitted forward pass, thresholded frame/onset activations, and
the vectorized host note decode — on synthetic piano audio (MAESTRO-style
16 kHz / hop 512 / 229 mels configuration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the 100x-real-time north-star target
(BASELINE.json) — the reference itself publishes no benchmark numbers and its
librosa+PyTorch pipeline is strictly slower than real time on CPU features.
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    """Progress to stderr (stdout carries only the one JSON line)."""

    print(f'[bench] {msg}', file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser('~/.cache/jax')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import tools
    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.datasets.synthetic import render_notes, random_notes
    from amt_tools_tpu.ops import decode

    # MAESTRO-style configuration (of_2 recipe: 16 kHz, hop 512, 229 mels)
    sample_rate, hop = 16000, 512
    clip_seconds = 60.0
    batch_size = 64

    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=sample_rate, hop_length=hop, n_mels=229)
    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=3)

    # Synthetic piano clips with real note content
    rng = np.random.RandomState(0)
    clips = []
    for b in range(batch_size):
        pitches, intervals = random_notes(profile, clip_seconds, 120, rng)
        clips.append(render_notes(pitches, intervals, sample_rate,
                                  clip_seconds, seed=b))
    audio = jnp.asarray(np.stack(clips))

    # Initialize parameters (jit the initializer: eager init dispatches
    # hundreds of tiny ops over the device tunnel)
    num_frames = mel.get_expected_frames(clips[0])
    feats_shape = model.pre_proc(
        {tools.KEY_FEATS: jnp.zeros((batch_size, 1, 229, num_frames))})
    _log('initializing parameters...')
    init_fn = jax.jit(lambda rngs, feats: model.init(rngs, feats, train=False))
    variables = init_fn({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)},
                        feats_shape[tools.KEY_FEATS])
    jax.block_until_ready(variables)
    _log('parameters ready')

    @jax.jit
    def device_pipeline(variables, audio):
        """Audio -> features -> model -> thresholded activation maps."""

        feats = mel.process_jax(audio)                      # (B, 1, F, T)
        batch = model.pre_proc({tools.KEY_FEATS: feats})
        raw = model.apply(variables, batch[tools.KEY_FEATS], train=False)

        # Bit-packed activations: 32x smaller device->host transfer
        multi_pitch = decode.pack_bits(decode.threshold(
            jax.nn.sigmoid(jnp.swapaxes(raw[tools.KEY_MULTIPITCH], -1, -2)), 0.5))
        onsets = decode.pack_bits(decode.threshold(
            jax.nn.sigmoid(jnp.swapaxes(raw[tools.KEY_ONSETS], -1, -2)), 0.5))

        return multi_pitch, onsets

    times = mel.get_times(clips[0])

    def full_pipeline(variables, audio):
        multi_pitch, onsets = device_pipeline(variables, audio)
        multi_pitch = decode.unpack_bits(multi_pitch, num_frames)
        onsets = decode.unpack_bits(onsets, num_frames)

        # Host note decode (vectorized suffix scans) per track
        all_notes = []
        for b in range(batch_size):
            pitches, intervals = tools.multi_pitch_to_notes(
                multi_pitch[b], times, profile, onsets=onsets[b])
            all_notes.append((pitches, intervals))

        return all_notes

    def host_decode(packed):
        multi_pitch = decode.unpack_bits(packed[0], num_frames)
        onsets = decode.unpack_bits(packed[1], num_frames)

        all_notes = []
        for b in range(batch_size):
            pitches, intervals = tools.multi_pitch_to_notes(
                multi_pitch[b], times, profile, onsets=onsets[b])
            all_notes.append((pitches, intervals))

        return all_notes

    # Warm up / compile
    _log('compiling device pipeline...')
    t0 = time.perf_counter()
    full_pipeline(variables, audio)
    _log(f'compile+first run: {time.perf_counter() - t0:.1f}s')

    # Steady-state pipelined throughput: dispatch batch n+1 (JAX async)
    # before host-decoding batch n, as a production serving loop would
    runs = 8
    start = time.perf_counter()
    pending = device_pipeline(variables, audio)
    for _ in range(runs - 1):
        upcoming = device_pipeline(variables, audio)
        host_decode(pending)
        pending = upcoming
    host_decode(pending)
    elapsed = time.perf_counter() - start

    audio_seconds = batch_size * clip_seconds
    rtf = audio_seconds * runs / elapsed

    result = {
        'metric': 'full_pipeline_realtime_factor',
        'value': round(rtf, 2),
        'unit': 'audio-sec/sec/chip',
        'vs_baseline': round(rtf / 100.0, 3),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
