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

The headline config is the deployable int8-static serving mode
(`quant_acoustic='static'`: calibrated per-layer activation scales, int8 MXU
conv stacks, float parameter tree unchanged — ≈1.13x median over bf16 on
v5e (same-process trained A/Bs; pooled band 1.05-1.26 across sessions,
RESULTS.md); the ratio varies with tunnel weather, which is why
the JSON line carries a SAME-process bf16 control measured with the same
median-of-windows protocol, plus the int8-vs-bf16 note-agreement F1 and a
trained-weights companion RTF/agreement, so the number ships with its own
fidelity checks). ``python bench.py bf16`` runs the float headline.

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




def build_pipeline(batch_size, clip_seconds=60.0, complexity=3, quant=False,
                   quant_lm=False):
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
                          dtype=jnp.bfloat16, quant_acoustic=quant,
                          quant_lm=quant_lm)

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
    from amt_tools_tpu.serving import (TranscriptionPipeline,
                                       calibrate_activity,
                                       calibrate_quant_stats)

    probe_audio = jnp.asarray(np.stack(clips[:4]))

    if quant == 'static' or quant_lm == 'static':
        # Static int8 scales must exist before any forward is interpreted
        # (activity calibration reads logit quantiles off the quantized
        # forward, so it runs after the scales are sane)
        variables = calibrate_quant_stats(model, variables, mel, probe_audio)

    variables = calibrate_activity(model, variables, mel, probe_audio)

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


def measure_windows(pipeline, audio, runs, windows, tag=''):
    """Median-of-windows protocol: several full pipelined windows, sorted.

    The tunnel's delivered throughput wanders across seconds/minutes
    (RESULTS.md "Measurement integrity"), so a single short window is
    noisy. Every number bench.py reports — headline AND control — uses
    the same window count and the median, so ratios between them cancel
    the weather symmetrically (round-3 advisor finding).

    Returns (sorted elapsed list, last window's notes).
    """

    elapsed_all = []
    notes = None
    for w in range(windows):
        elapsed_w, notes = measure(pipeline, audio, runs)
        elapsed_all.append(elapsed_w)
        _log(f'{tag}window {w + 1}/{windows}: {elapsed_w:.2f}s')

    return sorted(elapsed_all), notes


def main(quant=False, control=False, quant_lm=False, emit=True):
    import jax

    cache_dir = os.path.expanduser('~/.cache/jax')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    # Headline config; env overrides exist so code paths (incl. the int8
    # agreement check) can be smoke-run on CPU at toy sizes before a chip run
    batch_size = int(os.environ.get('AMT_BENCH_BATCH', 128))
    clip_seconds = float(os.environ.get('AMT_BENCH_CLIP_SECONDS', 60.0))
    runs = int(os.environ.get('AMT_BENCH_RUNS', 8))

    _log('building pipeline (initializing parameters)...')
    pipeline, audio = build_pipeline(batch_size, clip_seconds, quant=quant,
                                     quant_lm=quant_lm)

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

    windows = int(os.environ.get('AMT_BENCH_WINDOWS', 5))
    elapsed_all, notes = measure_windows(pipeline, audio, runs, windows)
    elapsed = elapsed_all[len(elapsed_all) // 2]

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

    serving_dtype = ('int8-static' if quant == 'static'
                     else 'int8-dynamic' if quant else 'bf16')

    # Dtype-qualified metric name: BENCH_r0N.json rows with different
    # serving dtypes must not collide under one name (round-3 advisor)
    suffix = {'int8-static': '_int8_static',
              'int8-dynamic': '_int8_dynamic', 'bf16': ''}[serving_dtype]

    result = {
        'metric': f'full_pipeline_realtime_factor{suffix}',
        'value': round(rtf, 2),
        'unit': 'audio-sec/sec/chip',
        'vs_baseline': round(rtf / 100.0, 3),
        # MFU convention: XLA's cost analysis counts the int8 convs'
        # MACs identically to float ones, so 'mfu_pct' is the
        # bf16-equivalent utilization (comparable across rounds/dtypes);
        # quantized modes also report against the int8 MXU peak below.
        'mfu_pct': round(mfu * 100, 2),
        'achieved_tflops': round(achieved_flops / 1e12, 2),
        'notes_per_batch': total_notes,
        # Median-of-windows protocol: spread across the measured windows so
        # the recorded number carries its own weather error bar
        'rtf_window_min': round(audio_seconds * runs / elapsed_all[-1], 2),
        'rtf_window_max': round(audio_seconds * runs / elapsed_all[0], 2),
    }

    result['serving_dtype'] = serving_dtype
    if quant:
        peak_int8 = profiling.peak_flops(jax.devices()[0], dtype='int8')
        if peak_int8:
            result['mfu_pct_vs_int8_peak'] = round(
                achieved_flops / peak_int8 * 100, 2)

    if quant:
        result['quant_mode'] = 'static' if quant == 'static' else 'dynamic'
        # Honesty companion: how well do the int8 pipeline's decoded notes
        # agree with the bf16 pipeline's on the same audio? The reference
        # pipeline reuses the quant pipeline's (calibrated) variables — the
        # parameter trees are identical — so the comparison isolates
        # quantization error rather than mixing in calibration drift.
        from amt_tools_tpu.serving import TranscriptionPipeline

        _log('building bf16 reference pipeline for agreement check...')
        # Same model config with only quant toggled off (flax clone)
        float_model = pipeline.model.clone(quant_acoustic=False,
                                           quant_lm=False)
        ref_pipeline = TranscriptionPipeline(float_model, pipeline.variables,
                                             pipeline.data_proc,
                                             capacity=NOTE_CAPACITY)
        ref_notes = ref_pipeline(audio)

        matched = total_ref = total_q = 0
        for (p_q, i_q), (p_r, i_r) in zip(notes, ref_notes):
            set_q = {(int(p), round(float(on), 4), round(float(off), 4))
                     for p, (on, off) in zip(p_q, i_q)}
            set_r = {(int(p), round(float(on), 4), round(float(off), 4))
                     for p, (on, off) in zip(p_r, i_r)}
            matched += len(set_q & set_r)
            total_q += len(set_q)
            total_ref += len(set_r)
        precision = matched / max(1, total_q)
        recall = matched / max(1, total_ref)
        f1 = 2 * precision * recall / max(1e-12, precision + recall)
        _log(f'int8 vs bf16 note agreement: P {precision:.4f} '
             f'R {recall:.4f} F1 {f1:.4f} ({total_q} vs {total_ref} notes)')
        result['note_agreement_f1_vs_bf16'] = round(f1, 4)

        if control:
            # Time the bf16 pipeline in the SAME process so the control
            # shares the tunnel weather with the headline (cross-process
            # throughput varies up to ~1.7x, RESULTS.md "Measurement
            # integrity"), with the SAME window count + median protocol so
            # the speedup ratio cancels the weather symmetrically.
            _log('timing bf16 control pipeline...')
            ref_pipeline(audio)  # warm-up (agreement run above compiled it)
            ctrl_all, _ = measure_windows(ref_pipeline, audio, runs, windows,
                                          tag='control ')
            elapsed_ctrl = ctrl_all[len(ctrl_all) // 2]
            rtf_ctrl = audio_seconds * runs / elapsed_ctrl
            result['rtf_bf16_control'] = round(rtf_ctrl, 2)
            result['rtf_bf16_control_window_min'] = round(
                audio_seconds * runs / ctrl_all[-1], 2)
            result['rtf_bf16_control_window_max'] = round(
                audio_seconds * runs / ctrl_all[0], 2)
            result['int8_speedup_vs_bf16'] = round(rtf / rtf_ctrl, 3)
            # Weather band: the ratio under the most adversarial pairing of
            # windows — the honest min/max envelope of the speedup claim
            result['int8_speedup_window_band'] = [
                round((audio_seconds * runs / elapsed_all[-1]) / (
                    audio_seconds * runs / ctrl_all[0]), 3),
                round((audio_seconds * runs / elapsed_all[0]) / (
                    audio_seconds * runs / ctrl_all[-1]), 3)]
            _log(f'bf16 control: {rtf_ctrl:.0f}x RT (int8-static speedup '
                 f'{rtf / rtf_ctrl:.3f}x, window band '
                 f'{result["int8_speedup_window_band"]})')

    if control and os.environ.get('AMT_BENCH_TRAINED', '1') != '0':
        # Trained-weights companion in the SAME driver JSON (round-3
        # verdict item 8): the decision-grade deployable number is the
        # trained model's RTF + int8 agreement, not only the
        # calibrated-random approximation. Best-effort: the headline
        # must survive a training failure.
        try:
            trained = _trained_companion(pipeline, audio, runs, windows)
            result.update(trained)
        except Exception as exc:
            _log(f'trained-weights companion failed ({type(exc).__name__}: '
                 f'{exc}); headline carries the calibrated-random number only')

    if emit:
        print(json.dumps(result))

    return result


def _trained_companion(headline_pipeline, audio, runs, windows):
    """Measure the trained-weights pipeline for the default JSON line.

    Trains (or loads the cached) synthetic-recipe flagship, rebuilds the
    int8-static pipeline on those weights (fresh quant calibration), and
    returns trained RTF + int8-vs-bf16 note agreement on trained logits.
    """

    from amt_tools_tpu.serving import (TranscriptionPipeline,
                                       calibrate_quant_stats)

    params, batch_stats = _train_flagship_variables()
    variables = {'params': params, 'batch_stats': batch_stats}

    data_proc = headline_pipeline.data_proc
    quant_model = headline_pipeline.model  # already quant_acoustic='static'
    q_variables = calibrate_quant_stats(quant_model, variables, data_proc,
                                        audio[:4])
    q_pipeline = TranscriptionPipeline(quant_model, q_variables, data_proc,
                                       capacity=NOTE_CAPACITY)

    _log('timing trained-weights int8-static pipeline...')
    q_pipeline(audio)  # compile + warm
    elapsed_all, q_notes = measure_windows(q_pipeline, audio, runs, windows,
                                           tag='trained ')
    elapsed = elapsed_all[len(elapsed_all) // 2]
    audio_seconds = audio.shape[0] * audio.shape[-1] / 16000.0
    rtf = audio_seconds * runs / elapsed

    # Agreement vs the bf16 decode of the same trained weights
    float_model = quant_model.clone(quant_acoustic=False, quant_lm=False)
    ref_pipeline = TranscriptionPipeline(float_model, q_variables, data_proc,
                                         capacity=NOTE_CAPACITY)
    ref_notes = ref_pipeline(audio)

    matched = total_q = total_ref = 0
    for (p_q, i_q), (p_r, i_r) in zip(q_notes, ref_notes):
        set_q = {(int(p), round(float(on), 4), round(float(off), 4))
                 for p, (on, off) in zip(p_q, i_q)}
        set_r = {(int(p), round(float(on), 4), round(float(off), 4))
                 for p, (on, off) in zip(p_r, i_r)}
        matched += len(set_q & set_r)
        total_q += len(set_q)
        total_ref += len(set_r)
    f1 = 2 * matched / max(1, total_q + total_ref)

    _log(f'trained int8-static: {rtf:.0f}x RT, note agreement F1 {f1:.4f} '
         f'vs bf16 ({total_q} vs {total_ref} notes)')

    return {
        'trained_rtf_int8_static': round(rtf, 2),
        'trained_notes_per_clip': round(total_q / max(1, audio.shape[0]), 1),
        'trained_int8_agreement_f1': round(f1, 4),
    }


def _count_notes(groups):
    """Total decoded notes across per-clip groups (flat or stacked)."""

    total = 0
    for g in groups:
        if isinstance(g, dict):
            total += sum(len(p) for p, _ in g.values())
        else:
            total += len(g[0])

    return total


def build_tabcnn_pipeline(batch_size, clip_seconds=60.0, grouped='auto'):
    """Guitar-flagship serving pipeline: CQT -> TabCNN -> stacked decode.

    Paper-recipe features (22.05 kHz, CQT 192 bins at 24/octave, hop 512,
    reference ``examples/papers/tabcnn.py:40-59``) with bf16 compute and
    the full on-device tablature -> stacked multi-pitch -> per-string note
    decode (``serving.TablaturePipeline``).
    """

    import jax
    import jax.numpy as jnp

    from amt_tools_tpu import tools
    from amt_tools_tpu.features import CQT
    from amt_tools_tpu.models import TabCNN
    from amt_tools_tpu.datasets.synthetic import render_notes, random_notes
    from amt_tools_tpu.serving import (TablaturePipeline,
                                       calibrate_tablature_activity)

    sample_rate, hop = 22050, 512

    profile = tools.GuitarProfile(num_frets=19)
    # exact='high': the 3-pass bf16x3 contraction (1.47x the 6-pass f32
    # kernel at this shape; <=2e-4 on the dB feature scale — note-decode
    # agreement is pinned by test_tablature_pipeline). grouped='auto':
    # support-grouped wavelet banks in ONE fused Pallas kernel — chip
    # A/B 2026-08-20: 1.7-1.9x at CQT-module scale, 1.051x end-to-end
    # (12,831x vs 12,212x RT, band [0.92, 1.11]), decode agreement
    # 13538 vs 13537 notes (`python bench.py tabcnn grouped-ab`)
    cqt = CQT(sample_rate=sample_rate, hop_length=hop,
              n_bins=192, bins_per_octave=24, exact='high', grouped=grouped)
    # fullseq: the exact-equivalent whole-sequence forward — the windowed
    # graph materializes a frame_width-fold larger conv activation (40 GB
    # at this config, HBM-infeasible; measured round 4)
    model = TabCNN(dim_in=cqt.get_feature_size(), profile=profile,
                   dtype=jnp.bfloat16, fullseq=True)

    rng = np.random.RandomState(0)
    clips = []
    for b in range(batch_size):
        # ~2 notes/s/clip of guitar-range material (GuitarSet-like density)
        pitches, intervals = random_notes(profile, clip_seconds,
                                          int(2 * clip_seconds), rng)
        clips.append(render_notes(pitches, intervals, sample_rate,
                                  clip_seconds, seed=b))
    audio = jnp.asarray(np.stack(clips))

    num_frames = cqt.get_expected_frames(clips[0])
    feats_shape = model.pre_proc(
        {tools.KEY_FEATS: jnp.zeros((batch_size, 1, 192, num_frames))})
    init_fn = jax.jit(lambda rngs, feats: model.init(rngs, feats, train=False))
    variables = init_fn({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)},
                        feats_shape[tools.KEY_FEATS])
    jax.block_until_ready(variables)

    # Raise the silence-class biases so ~5% of (string, frame) cells decode
    # to a fret — trained-model-like duty cycle (same rationale as the O&F
    # calibrate_activity: decode cost is activity-dependent)
    probe_audio = jnp.asarray(np.stack(clips[:4]))
    variables = calibrate_tablature_activity(model, variables, cqt,
                                             probe_audio)

    # Per-STRING capacity: 60 s at ~5%/string duty -> well under 512 segments
    pipeline = TablaturePipeline(model, variables, cqt, capacity=512)

    return pipeline, audio


def bench_tabcnn(emit=True):
    """Guitar-flagship serving benchmark (``python bench.py tabcnn``).

    The TablaturePipeline counterpart of the O&F headline: one XLA
    executable runs CQT feature extraction, the TabCNN forward, softmax
    tablature decode, stacked multi-pitch expansion, and per-string note
    decode; the host receives fixed-capacity note buffers per string.
    Same median-of-windows protocol and XLA-cost-analysis MFU as ``main``.
    """

    import jax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import profiling

    batch_size = int(os.environ.get('AMT_BENCH_BATCH', 64))
    clip_seconds = float(os.environ.get('AMT_BENCH_CLIP_SECONDS', 60.0))
    runs = int(os.environ.get('AMT_BENCH_RUNS', 8))
    windows = int(os.environ.get('AMT_BENCH_WINDOWS', 5))

    pipeline = audio = None
    while True:
        # The whole build + first run sits under the backoff: the init
        # forward and activity calibration also run at full batch and can
        # be what hits the HBM wall
        try:
            _log(f'building TabCNN pipeline (batch {batch_size})...')
            pipeline, audio = build_tabcnn_pipeline(batch_size, clip_seconds)

            _log('compiling device pipeline...')
            t0 = time.perf_counter()
            flops_per_run = 0.0
            try:
                flops_per_run = profiling.compiled_flops(
                    pipeline._pipeline, pipeline.variables, audio)
            except Exception as exc:
                _log(f'cost analysis unavailable: {exc}')
            _log(f'compile: {time.perf_counter() - t0:.1f}s')

            t0 = time.perf_counter()
            pipeline(audio)
            _log(f'first run: {time.perf_counter() - t0:.1f}s')
            break
        except Exception as exc:
            if batch_size <= 8:
                raise
            _log(f'batch {batch_size} failed ({type(exc).__name__}); '
                 f'backing off')
            batch_size //= 2

    elapsed_all, notes = measure_windows(pipeline, audio, runs, windows)
    elapsed = elapsed_all[len(elapsed_all) // 2]

    total_notes = _count_notes(notes)
    _log(f'decoded {total_notes} notes/batch on device '
         f'({total_notes / max(1, len(notes)):.1f} per clip avg)')

    audio_seconds = batch_size * clip_seconds
    rtf = audio_seconds * runs / elapsed

    achieved_flops = flops_per_run * runs / elapsed
    peak = profiling.peak_flops(jax.devices()[0])
    mfu = achieved_flops / peak if peak else 0.0
    _log(f'achieved {achieved_flops / 1e12:.2f} TFLOP/s, peak '
         f'{peak / 1e12:.0f} TFLOP/s (bf16), MFU {mfu * 100:.2f}%')

    result = {
        'metric': 'tabcnn_pipeline_realtime_factor',
        'value': round(rtf, 2),
        'unit': 'audio-sec/sec/chip',
        'vs_baseline': round(rtf / 100.0, 3),
        'mfu_pct': round(mfu * 100, 2),
        'achieved_tflops': round(achieved_flops / 1e12, 2),
        'notes_per_batch': total_notes,
        'rtf_window_min': round(audio_seconds * runs / elapsed_all[-1], 2),
        'rtf_window_max': round(audio_seconds * runs / elapsed_all[0], 2),
        'serving_dtype': 'bf16',
    }
    if emit:
        print(json.dumps(result))

    return result


def bench_tabcnn_grouped_ab():
    """Grouped-CQT vs full-bank A/B on the guitar pipeline.

    ``python bench.py tabcnn grouped-ab``. The support-grouped wavelet
    bank drops ~58% of the CQT contraction's structural-zero tiles
    (``features/cqt.py`` grouping note) and runs as ONE fused Pallas
    kernel walking a static (group, tile) job list — this measures
    whether the tile savings survive the job-list overhead end-to-end.
    Same interleaved-window protocol as ``bench.py ab`` so tunnel drift
    cancels; both arms share the init RNG so parameters are identical.
    """

    import jax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    batch_size = int(os.environ.get('AMT_BENCH_BATCH', 64))
    clip_seconds = float(os.environ.get('AMT_BENCH_CLIP_SECONDS', 60.0))
    runs = int(os.environ.get('AMT_BENCH_RUNS', 8))
    windows = int(os.environ.get('AMT_BENCH_WINDOWS', 5))

    _log(f'building full-bank pipeline (batch {batch_size})...')
    full, audio = build_tabcnn_pipeline(batch_size, clip_seconds)
    _log('building grouped pipeline...')
    grp, _ = build_tabcnn_pipeline(batch_size, clip_seconds, grouped='auto')

    _log('compiling both arms...')
    t0 = time.perf_counter()
    full(audio)
    _log(f'full-bank compile+run: {time.perf_counter() - t0:.1f}s')
    t0 = time.perf_counter()
    grp(audio)
    _log(f'grouped compile+run: {time.perf_counter() - t0:.1f}s')

    g_elapsed, f_elapsed = [], []
    for w in range(windows):
        eg, g_notes = measure(grp, audio, runs)
        ef, f_notes = measure(full, audio, runs)
        g_elapsed.append(eg)
        f_elapsed.append(ef)
        _log(f'window {w + 1}/{windows}: grouped {eg:.2f}s full {ef:.2f}s '
             f'(ratio {ef / eg:.3f})')

    # Decode agreement: identical params, only the CQT layout differs —
    # note counts must match to within rounding noise
    ng, nf = _count_notes(g_notes), _count_notes(f_notes)
    _log(f'notes/batch: grouped {ng} vs full {nf}')

    g_elapsed.sort()
    f_elapsed.sort()
    audio_seconds = batch_size * clip_seconds
    rtf_g = audio_seconds * runs / g_elapsed[len(g_elapsed) // 2]
    rtf_f = audio_seconds * runs / f_elapsed[len(f_elapsed) // 2]
    band = [round((audio_seconds * runs / g_elapsed[-1]) /
                  (audio_seconds * runs / f_elapsed[0]), 3),
            round((audio_seconds * runs / g_elapsed[0]) /
                  (audio_seconds * runs / f_elapsed[-1]), 3)]

    result = {
        'metric': 'tabcnn_grouped_cqt_speedup',
        'value': round(rtf_g / rtf_f, 3),
        'unit': 'x (median-of-windows ratio, same process)',
        'vs_baseline': round(rtf_g / rtf_f, 3),
        'tabcnn_rtf_grouped': round(rtf_g, 2),
        'tabcnn_rtf_full_bank': round(rtf_f, 2),
        'speedup_window_band': band,
        'notes_grouped': ng,
        'notes_full_bank': nf,
        'windows': windows,
    }
    _log(f'grouped-CQT A/B: grouped {rtf_g:.0f}x vs full {rtf_f:.0f}x -> '
         f'{rtf_g / rtf_f:.3f}x (band {band})')
    print(json.dumps(result))

    return result


def bench_tabcnn_roofline():
    """Per-stage roofline of the guitar pipeline (``bench.py tabcnn roofline``).

    For each stage (CQT frontend, fullseq TabCNN forward, tablature note
    decode, fused pipeline): measured ms, XLA-accounted GFLOP and GB of
    memory traffic, achieved TFLOP/s vs the MXU peak and achieved GB/s vs
    the HBM peak — the quantitative form of 'bandwidth-shaped, not
    MXU-shaped' (round-4 verdict item 2). Also sweeps the fused pipeline
    over batch 32/64/128. Stderr table + one JSON line.
    """

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import profiling, tools

    batch_size = int(os.environ.get('AMT_BENCH_BATCH', 64))
    clip_seconds = float(os.environ.get('AMT_BENCH_CLIP_SECONDS', 60.0))

    pipeline, audio = build_tabcnn_pipeline(batch_size, clip_seconds)
    model, variables, cqt = pipeline.model, pipeline.variables, pipeline.data_proc

    peak_flops = profiling.peak_flops(jax.devices()[0])
    peak_bw = profiling.peak_hbm_bw(jax.devices()[0])

    def stage(name, fn, *args, runs=6, cost=None):
        jitted = jax.jit(fn)
        flops, nbytes = 0.0, 0.0
        if cost is not None:
            # Analytic cost: XLA's cost analysis reports ~0 for Pallas
            # custom kernels (their FLOPs/bytes are opaque to the HLO)
            flops, nbytes = cost
        else:
            try:
                flops, nbytes = profiling.compiled_cost(jitted, *args)
            except Exception as exc:
                _log(f'cost analysis unavailable for {name}: {exc}')
        out = jitted(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(runs):
            out = jitted(*args)
        jax.block_until_ready(out)
        secs = (time.perf_counter() - t0) / runs

        tflops = flops / secs / 1e12
        gbs = nbytes / secs / 1e9
        _log(f'{name:26s} {secs * 1e3:7.1f} ms  {flops / 1e9:8.1f} GFLOP  '
             f'{nbytes / 1e9:7.2f} GB  '
             f'{tflops:7.2f} TFLOP/s ({tflops * 1e12 / peak_flops * 100:5.1f}% MXU)  '
             f'{gbs:7.1f} GB/s ({gbs * 1e9 / peak_bw * 100:5.1f}% HBM)')

        return {'ms': round(secs * 1e3, 1), 'gflop': round(flops / 1e9, 1),
                'gb': round(nbytes / 1e9, 3),
                'mxu_pct': round(tflops * 1e12 / peak_flops * 100, 1),
                'hbm_pct': round(gbs * 1e9 / peak_bw * 100, 1)}, out

    _log(f'roofline at batch {batch_size} x {clip_seconds:.0f}s '
         f'(peaks: {peak_flops / 1e12:.0f} TFLOP/s bf16, '
         f'{peak_bw / 1e9:.0f} GB/s HBM)')

    # Analytic cost for the Pallas CQT (XLA cost analysis reports ~0 for
    # custom kernels). FLOPs: the wavelet contraction is frames x support
    # x 2*n_bins MACs per clip, executed as `passes` MXU passes (6 for the
    # f32 contraction, 3 for bf16x3) — pass-weighted so mxu_pct reads as
    # hardware-pipe occupancy. Bytes: per (frame-block, support-tile) grid
    # step the kernel DMAs the audio span + one bank tile, plus the output.
    support, n_bins, hop = cqt._support, cqt.n_bins, cqt.hop_length
    block_t, tile_s = 64, 2048
    num_samples = audio.shape[-1]
    frames = 1 + num_samples // hop
    num_blocks = -(-frames // block_t)
    num_tiles = support // tile_s
    passes = {True: 6, 'high': 3, False: 1}[getattr(cqt, 'exact', True)]
    span = (block_t - 1) * hop + tile_s
    cqt_flops = batch_size * num_blocks * block_t * support * 2 * n_bins \
        * 2 * passes
    cqt_bytes = batch_size * (
        num_blocks * num_tiles * (span + tile_s * 2 * n_bins) * 4
        + num_blocks * block_t * n_bins * 4 + num_samples * 4)

    r_cqt, feats = stage('CQT frontend', cqt.process_jax, audio,
                         cost=(cqt_flops, cqt_bytes))

    def forward(feats):
        # variables closed over (weights as compile-time constants): passing
        # them as runtime args makes XLA cross-program-prefetch each one,
        # which crashes this tunnel's AOT compile helper (HTTP 500)
        batch = model.pre_proc({tools.KEY_FEATS: feats})
        return model.apply(variables, batch[tools.KEY_FEATS], train=False)

    r_fwd, raw = stage('TabCNN forward (fullseq)', forward, feats)

    from amt_tools_tpu.models.common import SoftmaxGroups
    head = SoftmaxGroups(dim_in=0,
                         dim_out=model.num_groups * model.num_classes,
                         num_groups=model.num_groups,
                         num_classes=model.num_classes)
    tablature = jax.jit(head.finalize_output)(raw[tools.KEY_TABLATURE])
    jax.block_until_ready(tablature)

    decode_fn = pipeline._decode_fn_for(512)
    r_dec, _ = stage('note decode (per string)',
                     lambda t: decode_fn(t), tablature)

    # Fused cost = XLA's accounting (which sees everything except the
    # Pallas CQT custom call) + the analytic CQT cost from above
    fused_xla = (0.0, 0.0)
    try:
        fused_xla = profiling.compiled_cost(
            jax.jit(pipeline._pipeline), variables, audio)
    except Exception as exc:
        _log(f'cost analysis unavailable for fused pipeline: {exc}')
    r_fused, _ = stage('fused pipeline', pipeline._pipeline, variables, audio,
                       cost=(fused_xla[0] + cqt_flops,
                             fused_xla[1] + cqt_bytes))

    # Batch sweep of the fused pipeline (RTF per batch size)
    sweep = {}
    runs = int(os.environ.get('AMT_BENCH_RUNS', 6))
    for b in (32, 64, 128):
        try:
            p_b, audio_b = (pipeline, audio) if b == batch_size \
                else build_tabcnn_pipeline(b, clip_seconds)
            p_b(audio_b)  # compile + warm
            elapsed, _ = measure(p_b, audio_b, runs)
            rtf = b * clip_seconds * runs / elapsed
            sweep[b] = round(rtf, 1)
            _log(f'batch {b:4d}: {rtf:9.1f}x RT')
        except Exception as exc:
            _log(f'batch {b} failed ({type(exc).__name__}: {exc})')

    result = {
        'metric': 'tabcnn_roofline_hbm_pct_fused',
        'value': r_fused['hbm_pct'],
        'unit': '% of HBM bandwidth (fused pipeline, XLA-accounted traffic)',
        'vs_baseline': 0.0,
        'stages': {'cqt': r_cqt, 'forward': r_fwd, 'decode': r_dec,
                   'fused': r_fused},
        'batch_sweep_rtf': sweep,
    }
    print(json.dumps(result))


def breakdown(quant='static'):
    """Per-component timings at the headline config (stderr only).

    Times each pipeline stage in isolation with a forced device sync —
    the where-does-the-time-go table behind the headline number. Defaults
    to the int8-static headline serving mode; ``bench.py breakdown bf16``
    times the float pipeline.
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

    _log(f'breakdown at serving mode: '
         f'{"int8-static" if quant == "static" else "bf16"}')
    pipeline, audio = build_pipeline(128, 60.0, quant=quant)
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

    # In-forward sub-stages: where the forward's time goes. Fresh modules
    # with the model's hyperparams applied to the matching variable slices
    # — each stage isolated with its own sync.
    from amt_tools_tpu.models.onsetsframes import (AcousticModel,
                                                   LanguageModel)

    def sub_vars(name):
        out = {'params': variables['params'][name]}
        for coll in ('batch_stats', 'quant_stats'):
            if coll in variables and name in variables[coll]:
                out[coll] = variables[coll][name]
        return out

    am = AcousticModel(model.dim_in, model.dim_am,
                       model_complexity=model.model_complexity,
                       dtype=model.dtype, quant=model.quant_acoustic)
    am_vars = sub_vars('pitch_am')
    timeit('  one acoustic stack (of 3)',
           jax.jit(lambda v, f: am.apply(v, f, train=False)), am_vars, feats)

    emb = jax.jit(lambda v, f: am.apply(v, f, train=False))(am_vars, feats)
    jax.block_until_ready(emb)

    lm = LanguageModel(model.dim_am, model.dim_lm, dtype=model.dtype,
                       quant=getattr(model, 'quant_lm', False))
    lm_vars = sub_vars('onset_lm')
    timeit('  one BiLSTM LM (of 3)',
           jax.jit(lambda v, e: lm.apply(v, e, train=False)), lm_vars, emb)

    timeit('note decode',
           jax.jit(jax.vmap(lambda m, o: decode.notes_on_device(
               m, o, capacity=NOTE_CAPACITY))), mp, on)
    timeit('fused pipeline (end to end)',
           pipeline._pipeline, pipeline.variables, audio)


def bench_train():
    """Training benchmark: steps/s + training MFU (``python bench.py train``).

    Measures the full jitted training step (loss + backward + optax update,
    donated state) on the flagship O&F2-c3 at the paper-recipe shape
    (batch 8 x 625 frames, ``examples/papers/of_2.py``) and at a saturating
    batch, in f32 and bf16. Prints per-config lines to stderr and ONE JSON
    line (recipe-config steps/s) to stdout — the training-side counterpart
    of the serving headline, same rigor (XLA cost analysis for FLOPs).
    """

    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import profiling, tools
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state, make_train_step

    num_frames = 625  # of_2.py recipe crop
    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    peak = profiling.peak_flops(jax.devices()[0])

    def one_config(batch_size, bf16, steps=100, remat=False, fused_lms=False,
                   pallas_lms=False):
        # NOTE: timings MUST amortize over a long step horizon. Through the
        # axon tunnel, short windows (and even per-step block_until_ready)
        # report impossibly fast times (>100% MFU) from queue pipelining;
        # 100 chained donated steps measured end-to-end give the true rate
        # (cross-checked against loss-decreasing 200-step runs).
        model = OnsetsFrames2(dim_in=229, profile=profile,
                              model_complexity=3, remat=remat,
                              fused_lms=fused_lms, pallas_lms=pallas_lms,
                              dtype=jnp.bfloat16 if bf16 else None)
        optimizer = optax.adam(6e-4)

        rng = np.random.RandomState(0)
        batch = {
            tools.KEY_FEATS: rng.rand(batch_size, 1, 229, num_frames)
            .astype(np.float32),
            tools.KEY_MULTIPITCH: (rng.rand(batch_size, dim_out, num_frames)
                                   > 0.97).astype(np.float32),
        }

        state = init_state(model, optimizer, batch)
        step = make_train_step(model, optimizer)

        flops = 0.0
        try:
            flops = profiling.compiled_flops(step, state, batch)
        except Exception as exc:
            _log(f'cost analysis unavailable: {exc}')

        # Warm-up (compile + first-step allocs); state is donated each call.
        # Fetching the loss VALUE (not block_until_ready) forces a real
        # device round trip before the timed region starts.
        for _ in range(2):
            state, loss = step(state, batch)
        float(loss[tools.KEY_LOSS_TOTAL])

        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch)
        float(loss[tools.KEY_LOSS_TOTAL])
        elapsed = time.perf_counter() - t0

        steps_per_sec = steps / elapsed
        mfu = flops * steps_per_sec / peak if peak else 0.0
        _log(f'train batch {batch_size:3d} {"bf16" if bf16 else "f32 "}'
             f'{" remat" if remat else ""}{" fused-lm" if fused_lms else ""}'
             f'{" pallas-lm" if pallas_lms else ""}: '
             f'{steps_per_sec:6.2f} steps/s, '
             f'{steps_per_sec * batch_size * num_frames * 512 / 16000:9.1f}x RT, '
             f'MFU {mfu * 100:5.2f}%')

        return steps_per_sec, mfu

    _log('training benchmark: O&F2-c3, 625-frame crops (of_2.py recipe)')
    recipe_sps, recipe_mfu = one_config(8, bf16=False)
    recipe16_sps, recipe16_mfu = one_config(8, bf16=True)

    # Saturating batch: largest power-of-two that fits (training activations
    # are the memory driver; back off on OOM)
    sat_sps = sat_mfu = 0.0
    sat_batch = 0
    for batch_size in (64, 32, 16):
        try:
            sat_sps, sat_mfu = one_config(batch_size, bf16=True)
            sat_batch = batch_size
            break
        except Exception as exc:
            _log(f'batch {batch_size} failed ({type(exc).__name__}); backing off')

    # Rematerialized batch 32: jax.checkpoint on the acoustic conv stacks
    # trades one recompute for their activation memory. Measured sweet spot
    # on the 16 GB chip — batch 48+ crosses the HBM cliff even with remat
    # (per-block checkpointing fits but is slower; see RESULTS.md round 3)
    remat_sps = remat_mfu = 0.0
    remat_batch = 0
    for batch_size in (32, 16):
        try:
            remat_sps, remat_mfu = one_config(batch_size, bf16=True,
                                              remat=True, steps=60)
            remat_batch = batch_size
            break
        except Exception as exc:
            _log(f'remat batch {batch_size} failed ({type(exc).__name__}); '
                 f'backing off')

    # Grouped language models: onset+offset LMs share ONE scan — attacks
    # the recurrence's sequential step count, but measured SLOWER on v5e
    # (RESULTS.md round 3); benched to keep the comparison honest
    fused_sps = fused_mfu = 0.0
    try:
        fused_sps, fused_mfu = one_config(8, bf16=True, fused_lms=True)
    except Exception as exc:
        _log(f'fused-lm config failed ({type(exc).__name__}: {exc})')

    fused_remat_sps = 0.0
    fused_remat_batch = 0
    for batch_size in (32, 16):
        try:
            fused_remat_sps, _ = one_config(batch_size, bf16=True, remat=True,
                                            fused_lms=True, steps=60)
            fused_remat_batch = batch_size
            break
        except Exception as exc:
            _log(f'fused-lm remat batch {batch_size} failed '
                 f'({type(exc).__name__}); backing off')

    # The orchestration gap: the bare device step above vs what the REAL
    # train() loop (dataset crops, collate, transfers, loss logging)
    # delivers end-to-end at the same recipe shape, in the same process
    # (round-3 verdict item 3 — the loop used to deliver ~half the step
    # rate and the bench JSON hid it)
    loop_sps = loop_first_sps = 0.0
    try:
        loop_sps, loop_first_sps = _measure_train_loop()
    except Exception as exc:
        _log(f'train() loop measurement failed ({type(exc).__name__}: {exc})')
    if loop_sps and recipe_sps:
        _log(f'train() loop: {loop_sps:.2f} steps/s steady-state '
             f'({loop_sps / recipe_sps * 100:.0f}% of the bare device step; '
             f'first pass incl. feature computation {loop_first_sps:.2f})')

    result = {
        'metric': 'train_steps_per_sec',
        'value': round(recipe_sps, 3),
        'unit': 'steps/sec (batch 8 x 625 frames, f32)',
        'vs_baseline': round(recipe_sps / 3.54, 3),  # round-2 measured anchor
        'loop_steps_per_sec': round(loop_sps, 3),
        'loop_vs_device_step_pct': round(
            loop_sps / recipe_sps * 100, 1) if recipe_sps else 0.0,
        'train_mfu_pct': round(recipe_mfu * 100, 2),
        'bf16_steps_per_sec': round(recipe16_sps, 3),
        'bf16_mfu_pct': round(recipe16_mfu * 100, 2),
        'saturating_batch': sat_batch,
        'saturating_steps_per_sec': round(sat_sps, 3),
        'saturating_mfu_pct': round(sat_mfu * 100, 2),
        'remat_batch': remat_batch,
        'remat_steps_per_sec': round(remat_sps, 3),
        'remat_mfu_pct': round(remat_mfu * 100, 2),
        'fused_lms_steps_per_sec': round(fused_sps, 3),
        'fused_lms_mfu_pct': round(fused_mfu * 100, 2),
        'fused_lms_remat_batch': fused_remat_batch,
        'fused_lms_remat_steps_per_sec': round(fused_remat_sps, 3),
    }
    print(json.dumps(result))


def bench_train_pallas():
    """Pallas-LSTM TRAINING A/B at the measured sweet spot.

    ``python bench.py train pallas``. The round-3 negative (scan faster
    than the Pallas BPTT kernel) was measured at batch 8, where per-step
    overhead dominates; the round-4 verdict asked for the re-measure at
    the best training config — batch 32 + whole-stack remat, bf16 —
    where the recurrence is a larger slice of the step. Interleaved
    A/B not needed (same process, back to back); prints one JSON line.
    """

    import jax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    # Reuse bench_train's one_config via a tiny closure copy: simplest is
    # to call bench_train's internals, so re-bind here.
    results = {}
    for pallas in (False, True):
        sps, mfu_val = _train_one_config(batch_size=32, bf16=True, remat=True,
                                         steps=60, pallas_lms=pallas)
        results['pallas' if pallas else 'scan'] = (sps, mfu_val)

    scan_sps, pallas_sps = results['scan'][0], results['pallas'][0]
    _log(f'batch-32 remat bf16: scan {scan_sps:.2f} steps/s vs pallas-lm '
         f'{pallas_sps:.2f} steps/s ({pallas_sps / scan_sps:.3f}x)')

    print(json.dumps({
        'metric': 'train_pallas_lm_vs_scan_speedup',
        'value': round(pallas_sps / scan_sps, 3),
        'unit': 'x (batch 32 + remat, bf16, 60 donated steps)',
        'vs_baseline': round(pallas_sps / scan_sps, 3),
        'scan_steps_per_sec': round(scan_sps, 3),
        'pallas_steps_per_sec': round(pallas_sps, 3),
    }))


def bench_train_lr_equivalence():
    """Batch-32 ↔ batch-8 recipe equivalence (``bench.py train lrscale``).

    Measures what the recipe-equivalence guidance (RESULTS.md) claims:
    train O&F2-c3 on a real synthetic corpus at the of_2 recipe (batch 8,
    lr 6e-4) and at batch 32 under unscaled / sqrt / linear lr scaling,
    at EQUAL SAMPLE BUDGET (batch·steps constant), same init, dropout on,
    seeds pinned — then compare final train loss and a fixed held-out
    eval-mode loss + frame F1. One JSON line.
    """

    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import tools
    from amt_tools_tpu.datasets import SyntheticPiano
    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state, make_train_step

    fs, hop, crop = 16000, 512, 625  # of_2.py recipe crop
    base_steps = int(os.environ.get('AMT_BENCH_LR_STEPS', 500))

    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=fs, hop_length=hop, n_mels=229)
    corpus = SyntheticPiano(base_dir='.', data_proc=mel, profile=profile,
                            num_frames=None, num_tracks=16,
                            track_duration=24.0, notes_per_track=60,
                            save_data=False, seed=0)
    _log('precomputing corpus features...')
    tracks = {t: corpus.get_track_data(t) for t in corpus.tracks}
    train_tracks, holdout = corpus.tracks[:12], corpus.tracks[12:]

    def crops(stream, n):
        feats_l, mp_l, on_l = [], [], []
        for _ in range(n):
            td = tracks[train_tracks[stream.randint(len(train_tracks))]]
            nf = td[tools.KEY_FEATS].shape[-1]
            start = stream.randint(0, nf - crop)
            feats_l.append(td[tools.KEY_FEATS][..., start:start + crop])
            mp_l.append(td[tools.KEY_MULTIPITCH][:, start:start + crop])
            on_l.append(td[tools.KEY_ONSETS][:, start:start + crop])
        return {tools.KEY_FEATS: np.stack(feats_l).astype(np.float32),
                tools.KEY_MULTIPITCH: np.stack(mp_l).astype(np.float32),
                tools.KEY_ONSETS: np.stack(on_l).astype(np.float32)}

    # Fixed held-out batch (same for every config)
    hold_stream = np.random.RandomState(99)
    saved_train = train_tracks
    train_tracks = holdout
    eval_batch = crops(hold_stream, 8)
    train_tracks = saved_train

    def run(batch_size, lr, steps):
        model = OnsetsFrames2(dim_in=229, profile=profile,
                              model_complexity=3, dtype=jnp.bfloat16)
        optimizer = optax.adam(lr)
        init_batch = crops(np.random.RandomState(0), batch_size)
        state = init_state(model, optimizer, init_batch,
                           rng=jax.random.PRNGKey(3))
        step = make_train_step(model, optimizer)

        stream = np.random.RandomState(7)
        tail_losses = []
        for s in range(steps):
            state, loss = step(state, crops(stream, batch_size))
            if s >= steps * 3 // 4:
                tail_losses.append(loss[tools.KEY_LOSS_TOTAL])
        tail = float(np.mean([float(v) for v in tail_losses]))

        # Held-out: eval-mode loss + frame P/R/F1 at threshold 0.5
        variables = state.variables()
        pre = model.pre_proc(dict(eval_batch))

        @jax.jit
        def eval_fn(variables, pre):
            out = model.apply(variables, pre[tools.KEY_FEATS], train=False)
            post = model.post_proc({**pre, tools.KEY_OUTPUT: out})
            pred = post[tools.KEY_MULTIPITCH]
            mp = pre[tools.KEY_MULTIPITCH]
            tp = jnp.sum(pred * mp)
            return (post[tools.KEY_LOSS][tools.KEY_LOSS_TOTAL],
                    tp, pred.sum(), mp.sum())

        ev_loss, tp, p_sum, t_sum = [
            float(v) for v in eval_fn(variables, pre)]
        pr = tp / max(p_sum, 1.0)
        rc = tp / max(t_sum, 1.0)
        f1 = 2 * pr * rc / max(pr + rc, 1e-9)

        _log(f'batch {batch_size:2d} lr {lr:.1e} x{steps}: train tail-loss '
             f'{tail:7.3f}  held-out loss {ev_loss:7.3f}  frame F1 {f1:.3f}')
        return {'train_tail_loss': round(tail, 3),
                'holdout_loss': round(ev_loss, 3),
                'holdout_frame_f1': round(f1, 4)}

    _log(f'lr-equivalence: equal sample budget = 8 x {base_steps}')
    out = {
        'recipe_b8_lr6e-4': run(8, 6e-4, base_steps),
        'b32_lr6e-4_unscaled': run(32, 6e-4, base_steps // 4),
        'b32_lr1.2e-3_sqrt': run(32, 1.2e-3, base_steps // 4),
        'b32_lr2.4e-3_linear': run(32, 2.4e-3, base_steps // 4),
    }

    print(json.dumps({
        'metric': 'train_lr_equivalence_holdout_f1_gap',
        'value': round(out['b32_lr6e-4_unscaled']['holdout_frame_f1']
                       - out['recipe_b8_lr6e-4']['holdout_frame_f1'], 4),
        'unit': 'frame-F1 delta (batch-32 unscaled lr vs batch-8 recipe, '
                'equal sample budget)',
        'vs_baseline': 0.0,
        'configs': out,
    }))


def _train_one_config(batch_size, bf16, steps=100, remat=False,
                      fused_lms=False, pallas_lms=False):
    """One donated-step training measurement (shared by train benches)."""

    import jax
    import jax.numpy as jnp
    import optax

    from amt_tools_tpu import profiling, tools
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state, make_train_step

    num_frames = 625
    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    peak = profiling.peak_flops(jax.devices()[0])

    model = OnsetsFrames2(dim_in=229, profile=profile,
                          model_complexity=3, remat=remat,
                          fused_lms=fused_lms, pallas_lms=pallas_lms,
                          dtype=jnp.bfloat16 if bf16 else None)
    optimizer = optax.adam(6e-4)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(batch_size, 1, 229, num_frames)
        .astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(batch_size, dim_out, num_frames)
                               > 0.97).astype(np.float32),
    }

    state = init_state(model, optimizer, batch)
    step = make_train_step(model, optimizer)

    flops = 0.0
    try:
        flops = profiling.compiled_flops(step, state, batch)
    except Exception as exc:
        _log(f'cost analysis unavailable: {exc}')

    for _ in range(2):
        state, loss = step(state, batch)
    float(loss[tools.KEY_LOSS_TOTAL])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    float(loss[tools.KEY_LOSS_TOTAL])
    elapsed = time.perf_counter() - t0

    steps_per_sec = steps / elapsed
    mfu = flops * steps_per_sec / peak if peak else 0.0
    _log(f'train batch {batch_size:3d} {"bf16" if bf16 else "f32 "}'
         f'{" remat" if remat else ""}{" fused-lm" if fused_lms else ""}'
         f'{" pallas-lm" if pallas_lms else ""}: '
         f'{steps_per_sec:6.2f} steps/s, MFU {mfu * 100:5.2f}%')

    return steps_per_sec, mfu


def _train_quick_result():
    """Recipe-shape training numbers for the scoreboard (no sweep).

    One f32 device-step measurement at the of_2 recipe shape (batch 8 x
    625 frames) plus the real ``train()`` loop at the same shape — the
    two numbers whose ratio is the orchestration overhead (closed to 99%
    in round 4; driver-captured here so a regression is visible).
    """

    import jax
    import jax.numpy as jnp
    import optax

    from amt_tools_tpu import profiling, tools
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state, make_train_step

    num_frames, batch_size, steps = 625, 8, 60
    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    peak = profiling.peak_flops(jax.devices()[0])

    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=3)
    optimizer = optax.adam(6e-4)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(batch_size, 1, 229, num_frames)
        .astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(batch_size, dim_out, num_frames)
                               > 0.97).astype(np.float32),
    }

    state = init_state(model, optimizer, batch)
    step = make_train_step(model, optimizer)

    flops = 0.0
    try:
        flops = profiling.compiled_flops(step, state, batch)
    except Exception as exc:
        _log(f'cost analysis unavailable: {exc}')

    for _ in range(2):
        state, loss = step(state, batch)
    float(loss[tools.KEY_LOSS_TOTAL])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    float(loss[tools.KEY_LOSS_TOTAL])
    device_sps = steps / (time.perf_counter() - t0)
    mfu = flops * device_sps / peak if peak else 0.0
    _log(f'train device step: {device_sps:.2f} steps/s, MFU {mfu * 100:.2f}%')

    del state, step  # release the training HBM before the loop run
    loop_sps, loop_first_sps = _measure_train_loop(passes=3, num_tracks=48)
    _log(f'train() loop: {loop_sps:.2f} steps/s '
         f'({loop_sps / device_sps * 100:.0f}% of the device step)')

    return {
        'train_device_steps_s': round(device_sps, 3),
        'train_loop_steps_s': round(loop_sps, 3),
        'train_loop_vs_device_pct': round(loop_sps / device_sps * 100, 1),
        'train_mfu_pct': round(mfu * 100, 2),
    }


def _measure_train_loop(passes=4, num_workers=4, num_tracks=64,
                        num_frames=625, batch_size=8, model_complexity=3):
    """Steady-state steps/s of the REAL ``train()`` loop at the of_2 shape.

    Trains O&F2-c3 (f32, batch 8 x 625-frame crops — the device-step
    comparator's exact shape) on a RAM-cached synthetic dataset through the
    full orchestration path: DataLoader crops + collate (on
    ``num_workers`` threads), prefetch, device transfer, jitted step, and
    per-pass loss logging. Pass boundaries are timestamped via the loop's
    own ``writer`` hook (the loss stacking at each pass end synchronizes
    with the device, so marks are honest). The first pass additionally
    computes + caches every track's features; it is reported separately.

    Returns (steady_state_steps_per_sec, first_pass_steps_per_sec).
    """

    import jax
    import optax

    from amt_tools_tpu import tools
    from amt_tools_tpu.datasets import DataLoader, SyntheticPiano
    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import train

    class _TimingWriter:
        """Records wall-clock at each distinct logging step (= pass end)."""

        def __init__(self):
            self.marks = {}

        def add_scalar(self, tag, value, global_step=0, **kwargs):
            if global_step not in self.marks:
                self.marks[global_step] = time.perf_counter()

        def close(self):
            pass

    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=229)
    model = OnsetsFrames2(dim_in=229, profile=profile,
                          model_complexity=model_complexity)

    _log(f'train() loop measurement: building synthetic corpus...')
    duration = (num_frames * 512 / 16000) + 4.0
    train_set = SyntheticPiano(base_dir='.', data_proc=mel,
                               num_frames=num_frames, num_tracks=num_tracks,
                               track_duration=duration,
                               notes_per_track=int(2.5 * duration),
                               save_data=False, seed=0)
    loader = DataLoader(train_set, batch_size=batch_size, shuffle=True,
                        drop_last=True, seed=0, num_workers=num_workers)

    writer = _TimingWriter()
    t0 = time.perf_counter()
    train(model, loader, optax.adam(6e-4), iterations=passes, checkpoints=0,
          log_dir=None, rng=jax.random.PRNGKey(0), writer=writer)

    steps = len(loader)
    marks = [writer.marks[s] for s in sorted(writer.marks)]
    first_sps = steps / (marks[0] - t0)
    steady_sps = (len(marks) - 1) * steps / (marks[-1] - marks[0])

    return steady_sps, first_sps


def _trained_variables_path():
    from amt_tools_tpu import tools

    return os.path.join(tools.DEFAULT_GENERATED_DIR, 'bench_trained',
                        'of2c3_synthetic.npz')


def _train_flagship_variables(steps_target=1200):
    """Train O&F2-c3 on the synthetic-piano recipe; cache params as npz.

    The synthetic domain has exact ground truth at bench-like note density
    (~2.5 notes/s), so the trained heads fire at *earned* rates — the
    decode cost in ``bench.py trained`` reflects a real trained model
    instead of the calibrated-bias approximation.
    """

    import jax
    import jax.numpy as jnp
    import optax

    from amt_tools_tpu import tools
    from amt_tools_tpu.datasets import DataLoader, SyntheticPiano
    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import train

    path = _trained_variables_path()
    if os.path.exists(path):
        data = np.load(path, allow_pickle=True)
        return data['params'][()], data['batch_stats'][()]

    profile = tools.PianoProfile()
    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=229)
    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=3)

    batch_size = 8
    train_set = SyntheticPiano(base_dir='.', data_proc=mel, num_frames=312,
                               num_tracks=48, track_duration=12.0,
                               notes_per_track=30, save_data=False, seed=0)
    loader = DataLoader(train_set, batch_size=batch_size, shuffle=True,
                        drop_last=True, seed=0)

    iterations = max(1, steps_target // len(loader))
    scheduler = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=1.0, warmup_steps=60,
        decay_steps=iterations * len(loader))

    _log(f'training flagship on synthetic recipe '
         f'({iterations} x {len(loader)} steps)...')
    state = train(model, loader, optax.adam(6e-4), iterations=iterations,
                  checkpoints=0, log_dir=None, scheduler=scheduler,
                  rng=jax.random.PRNGKey(0))

    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, params=np.array(params, dtype=object),
             batch_stats=np.array(batch_stats, dtype=object))

    return params, batch_stats


def bench_trained():
    """Serving benchmark with TRAINED weights (``python bench.py trained``).

    Same headline config (O&F2-c3 bf16 serving, batch 128 x 60 s clips,
    full on-device decode), but the weights come from a synthetic-recipe
    training run (cached under ``generated/bench_trained/``) instead of the
    calibrated-bias random initialization — the decode runs on activations
    the model actually earned.
    """

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu import profiling, tools
    from amt_tools_tpu.serving import TranscriptionPipeline

    params, batch_stats = _train_flagship_variables()

    batch_size, clip_seconds, runs = 128, 60.0, 8
    pipeline, audio = build_pipeline(batch_size, clip_seconds)

    # Swap in the trained weights (same model/dtype/pipeline graph)
    variables = {'params': params, 'batch_stats': batch_stats}
    pipeline = TranscriptionPipeline(pipeline.model, variables,
                                     pipeline.data_proc,
                                     capacity=NOTE_CAPACITY)

    flops_per_run = 0.0
    try:
        flops_per_run = profiling.compiled_flops(
            pipeline._pipeline, pipeline.variables, audio)
    except Exception as exc:
        _log(f'cost analysis unavailable: {exc}')

    pipeline(audio)  # compile + warm
    elapsed, notes = measure(pipeline, audio, runs)

    total_notes = sum(len(p) for p, _ in notes)
    rtf = batch_size * clip_seconds * runs / elapsed
    peak = profiling.peak_flops(jax.devices()[0])
    mfu = flops_per_run * runs / elapsed / peak if peak else 0.0

    _log(f'trained-weights serving: {rtf:.0f}x RT, MFU {mfu * 100:.2f}%, '
         f'{total_notes} notes/batch '
         f'({total_notes / batch_size:.1f}/clip; synthesized ~120/clip)')

    # Int8 fidelity where it matters: TRAINED logits sit far from the 0.5
    # threshold, unlike the calibrated-random headline whose activity is at
    # the threshold by construction (a worst case for any perturbation —
    # even f32 vs bf16 disagrees there, RESULTS.md). Same trained weights
    # through the int8 pipeline, note-level agreement vs the bf16 decode.
    _log('building int8 pipeline on the trained weights...')
    from amt_tools_tpu.serving import calibrate_quant_stats

    quant_model = pipeline.model.clone(quant_acoustic='static')
    q_variables = calibrate_quant_stats(quant_model, variables,
                                        pipeline.data_proc, audio[:4])
    quant_pipeline = TranscriptionPipeline(
        quant_model, q_variables,
        pipeline.data_proc, capacity=NOTE_CAPACITY)
    q_elapsed, q_notes = measure(quant_pipeline, audio, runs)
    q_rtf = batch_size * clip_seconds * runs / q_elapsed

    matched = total_q = 0
    for (p_q, i_q), (p_r, i_r) in zip(q_notes, notes):
        set_q = {(int(p), round(float(on), 4), round(float(off), 4))
                 for p, (on, off) in zip(p_q, i_q)}
        set_r = {(int(p), round(float(on), 4), round(float(off), 4))
                 for p, (on, off) in zip(p_r, i_r)}
        matched += len(set_q & set_r)
        total_q += len(set_q)
    f1 = 2 * matched / max(1, total_q + total_notes)
    _log(f'int8 on trained weights: {q_rtf:.0f}x RT, note agreement F1 '
         f'{f1:.4f} vs bf16 ({total_q} vs {total_notes} notes)')

    result = {
        'metric': 'trained_pipeline_realtime_factor',
        'value': round(rtf, 2),
        'unit': 'audio-sec/sec/chip',
        'vs_baseline': round(rtf / 100.0, 3),
        'mfu_pct': round(mfu * 100, 2),
        'notes_per_clip': round(total_notes / batch_size, 1),
        'int8_realtime_factor': round(q_rtf, 2),
        'int8_note_agreement_f1': round(f1, 4),
    }
    print(json.dumps(result))


def scoreboard():
    """Default driver capture: ONE JSON line with all four perf stories.

    Round-4 verdict item 1 — the driver's end-of-round ``python bench.py``
    must evidence every headline the docs claim, not just serving:

    * **value** = the TRAINED-weights int8-static RTF (the deployable
      configuration), with its int8-vs-bf16 note-agreement F1;
    * the calibrated-random companion (former headline) + same-process
      bf16 control and speedup band;
    * the guitar flagship (``tabcnn_rtf``, ``tabcnn_mfu_pct``);
    * training (``train_device_steps_s``, ``train_loop_steps_s``,
      ``train_mfu_pct``);
    * streaming (``streaming_device_ms_per_frame``).

    Companions are best-effort: a failure in any one logs to stderr and
    drops its keys; the serving headline always ships.
    """

    headline = main(quant='static', control=True, emit=False)

    trained_rtf = headline.get('trained_rtf_int8_static')
    lead = trained_rtf if trained_rtf else headline['value']
    result = {
        'metric': ('trained_pipeline_realtime_factor_int8_static'
                   if trained_rtf else
                   'full_pipeline_realtime_factor_int8_static'),
        'value': lead,
        'unit': 'audio-sec/sec/chip',
        'vs_baseline': round(lead / 100.0, 3),
        'trained_int8_agreement_f1': headline.get('trained_int8_agreement_f1'),
        'trained_notes_per_clip': headline.get('trained_notes_per_clip'),
        # Calibrated-random companion: same serving graph, random-init
        # weights with activity-calibrated biases (the documented
        # worst-case agreement regime) + its same-process bf16 control
        'random_rtf_int8_static': headline['value'],
        'random_int8_agreement_f1': headline.get('note_agreement_f1_vs_bf16'),
        'random_rtf_window_min': headline['rtf_window_min'],
        'random_rtf_window_max': headline['rtf_window_max'],
        'mfu_pct': headline['mfu_pct'],
        'achieved_tflops': headline['achieved_tflops'],
        'mfu_pct_vs_int8_peak': headline.get('mfu_pct_vs_int8_peak'),
        'rtf_bf16_control': headline.get('rtf_bf16_control'),
        'int8_speedup_vs_bf16': headline.get('int8_speedup_vs_bf16'),
        'int8_speedup_window_band': headline.get('int8_speedup_window_band'),
        'serving_dtype': 'int8-static',
    }

    try:
        tab = bench_tabcnn(emit=False)
        result['tabcnn_rtf'] = tab['value']
        result['tabcnn_mfu_pct'] = tab['mfu_pct']
        result['tabcnn_rtf_window_min'] = tab['rtf_window_min']
        result['tabcnn_rtf_window_max'] = tab['rtf_window_max']
    except Exception as exc:
        _log(f'tabcnn companion failed ({type(exc).__name__}: {exc})')

    try:
        result.update(_train_quick_result())
    except Exception as exc:
        _log(f'training companion failed ({type(exc).__name__}: {exc})')

    try:
        stream = bench_streaming(emit=False)
        result['streaming_device_ms_per_frame'] = stream['value']
        result['streaming_blocking_p50_ms'] = stream['blocking_p50_ms']
    except Exception as exc:
        _log(f'streaming companion failed ({type(exc).__name__}: {exc})')

    print(json.dumps(result))


def bench_ab():
    """Trained-weights int8-static vs bf16 A/B (``python bench.py ab``).

    The decision protocol for whether int8-static keeps the headline
    (round-4 verdict item 4): BOTH pipelines carry the SAME trained
    parameter tree, both are measured in THIS process with the same
    median-of-windows protocol, in interleaved A/B/A/B window order so
    slow tunnel drift cancels rather than biasing one arm. Run across
    >= 3 sessions; the pooled median decides. Prints one JSON line.
    """

    import jax

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from amt_tools_tpu.serving import (TranscriptionPipeline,
                                       calibrate_quant_stats)

    batch_size = int(os.environ.get('AMT_BENCH_BATCH', 128))
    clip_seconds = float(os.environ.get('AMT_BENCH_CLIP_SECONDS', 60.0))
    runs = int(os.environ.get('AMT_BENCH_RUNS', 8))
    windows = int(os.environ.get('AMT_BENCH_WINDOWS', 5))

    params, batch_stats = _train_flagship_variables()
    variables = {'params': params, 'batch_stats': batch_stats}

    _log('building trained-weights pipelines (int8-static + bf16)...')
    base, audio = build_pipeline(batch_size, clip_seconds, quant='static')
    data_proc = base.data_proc

    quant_model = base.model
    q_variables = calibrate_quant_stats(quant_model, variables, data_proc,
                                        audio[:4])
    q_pipeline = TranscriptionPipeline(quant_model, q_variables, data_proc,
                                       capacity=NOTE_CAPACITY)
    f_pipeline = TranscriptionPipeline(
        quant_model.clone(quant_acoustic=False, quant_lm=False), q_variables,
        data_proc, capacity=NOTE_CAPACITY)

    q_pipeline(audio)  # compile + warm both arms before any timing
    f_pipeline(audio)

    # Interleaved windows: any monotone tunnel drift hits both arms equally
    q_elapsed, f_elapsed = [], []
    for w in range(windows):
        eq, _ = measure(q_pipeline, audio, runs)
        ef, _ = measure(f_pipeline, audio, runs)
        q_elapsed.append(eq)
        f_elapsed.append(ef)
        _log(f'window {w + 1}/{windows}: int8 {eq:.2f}s bf16 {ef:.2f}s '
             f'(ratio {ef / eq:.3f})')

    q_elapsed.sort()
    f_elapsed.sort()
    audio_seconds = batch_size * clip_seconds
    rtf_q = audio_seconds * runs / q_elapsed[len(q_elapsed) // 2]
    rtf_f = audio_seconds * runs / f_elapsed[len(f_elapsed) // 2]
    band = [round((audio_seconds * runs / q_elapsed[-1]) /
                  (audio_seconds * runs / f_elapsed[0]), 3),
            round((audio_seconds * runs / q_elapsed[0]) /
                  (audio_seconds * runs / f_elapsed[-1]), 3)]

    result = {
        'metric': 'trained_int8_vs_bf16_speedup',
        'value': round(rtf_q / rtf_f, 3),
        'unit': 'x (median-of-windows ratio, same process, trained weights)',
        'vs_baseline': round(rtf_q / rtf_f, 3),
        'trained_rtf_int8_static': round(rtf_q, 2),
        'trained_rtf_bf16': round(rtf_f, 2),
        'speedup_window_band': band,
        'windows': windows,
    }
    _log(f'trained A/B: int8 {rtf_q:.0f}x vs bf16 {rtf_f:.0f}x -> '
         f'{rtf_q / rtf_f:.3f}x (band {band})')
    print(json.dumps(result))


def bench_streaming(emit=True):
    """Streaming step latency, device time separated from tunnel RTT.

    ``python bench.py streaming``. Two measurements of the same compiled
    ``OnsetsFramesOnline`` step (stateful carries, 1 frame/dispatch):

    * **blocking**: host waits for each step — what a remote client of the
      tunneled chip observes (p50/p99; RTT-dominated through axon).
    * **chained**: N carry-dependent steps dispatched asynchronously, one
      block at the end — the carries serialize execution on device, so
      (elapsed - one RTT) / N bounds the true per-step device+queue time.
      This replaces the earlier *asserted* "sub-ms locally" with a number.
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
    from amt_tools_tpu.models import OnsetsFramesOnline

    profile = tools.PianoProfile()
    model = OnsetsFramesOnline(dim_in=229, profile=profile,
                               model_complexity=2)

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, 1, 229, 1).astype(np.float32))

    carries = model.init_carries(1)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           model.pre_proc({tools.KEY_FEATS: frame})
                           [tools.KEY_FEATS], carries=carries)

    @jax.jit
    def step(variables, frame, carries):
        batch = model.pre_proc({tools.KEY_FEATS: frame})
        return model.apply(variables, batch[tools.KEY_FEATS], carries=carries)

    # Compile + warm (fetch a VALUE: through the axon tunnel,
    # block_until_ready alone under-reports — see bench_train note)
    raw, carries = step(variables, frame, carries)
    _ = np.asarray(raw[tools.KEY_ONSETS])

    # Blocking per-dispatch latency (client-observed: result fetched)
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        raw, carries = step(variables, frame, carries)
        _ = np.asarray(raw[tools.KEY_ONSETS])
        lat.append(time.perf_counter() - t0)
    p50, p99 = np.percentile(lat, [50, 99]) * 1e3
    rtt = float(np.min(lat))

    # Chained async: carry dependence serializes N steps on device; the
    # long horizon amortizes any queueing artifacts
    chain = 2000
    t0 = time.perf_counter()
    for _ in range(chain):
        raw, carries = step(variables, frame, carries)
    _ = np.asarray(raw[tools.KEY_ONSETS])
    elapsed = time.perf_counter() - t0

    device_ms = max(0.0, elapsed - rtt) / chain * 1e3

    _log(f'blocking dispatch: p50 {p50:.1f} ms, p99 {p99:.1f} ms '
         f'(min {rtt * 1e3:.1f} ms ~ RTT floor)')
    _log(f'chained x{chain}: {elapsed:.3f} s total -> '
         f'{device_ms:.3f} ms/step device+queue time')
    _log(f'real-time budget/frame at hop 512 @ 16 kHz: 32 ms')

    result = {
        'metric': 'streaming_device_step_ms',
        'value': round(device_ms, 3),
        'unit': 'ms/frame (device+queue, 1-frame dispatch)',
        'vs_baseline': round(32.0 / max(device_ms, 1e-6), 1),
        'blocking_p50_ms': round(p50, 1),
        'blocking_p99_ms': round(p99, 1),
    }
    if emit:
        print(json.dumps(result))

    return result


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
        bf16 = len(sys.argv) > 2 and sys.argv[2] == 'bf16'
        breakdown(quant=False if bf16 else 'static')
    elif len(sys.argv) > 1 and sys.argv[1] == 'train':
        if len(sys.argv) > 2 and sys.argv[2] == 'pallas':
            bench_train_pallas()
        elif len(sys.argv) > 2 and sys.argv[2] == 'lrscale':
            bench_train_lr_equivalence()
        else:
            bench_train()
    elif len(sys.argv) > 1 and sys.argv[1] == 'streaming':
        bench_streaming()
    elif len(sys.argv) > 1 and sys.argv[1] == 'trained':
        bench_trained()
    elif len(sys.argv) > 1 and sys.argv[1] == 'tabcnn':
        if len(sys.argv) > 2 and sys.argv[2] == 'roofline':
            bench_tabcnn_roofline()
        elif len(sys.argv) > 2 and sys.argv[2] == 'grouped-ab':
            bench_tabcnn_grouped_ab()
        else:
            bench_tabcnn()
    elif len(sys.argv) > 1 and sys.argv[1] == 'int8':
        # 'static' = calibrated per-layer activation scales (the fast
        # mode); `int8 dynamic` benches the calibration-free runtime
        # scales (measured 0.81x bf16 on v5e, RESULTS.md)
        dynamic = len(sys.argv) > 2 and sys.argv[2] == 'dynamic'
        main(quant=True if dynamic else 'static')
    elif len(sys.argv) > 1 and sys.argv[1] == 'int8lm':
        # int8-static convs PLUS int8-static LM input projections (the
        # remaining big bf16 matmuls) — A/B candidate for the headline
        main(quant='static', quant_lm='static', control=True)
    elif len(sys.argv) > 1 and sys.argv[1] == 'bf16':
        # The pre-round-3 headline config (float compute throughout)
        main()
    elif len(sys.argv) > 1 and sys.argv[1] == 'ab':
        bench_ab()
    elif len(sys.argv) > 1 and sys.argv[1] == 'serving':
        # The round-4 default: serving headline only (int8-static +
        # same-process bf16 control + agreement + trained companion)
        main(quant='static', control=True)
    else:
        # Default: the full scoreboard — trained-weights int8-static
        # headline plus guitar / training / streaming companion keys, all
        # in ONE JSON line (AMT_BENCH_SCOREBOARD=0 restores serving-only)
        if os.environ.get('AMT_BENCH_SCOREBOARD', '1') == '0':
            main(quant='static', control=True)
        else:
            scoreboard()
