"""The default ``python bench.py`` scoreboard emits all four perf stories.

Structural test: the sub-benchmarks are stubbed (the real measurements need
the chip), and the scoreboard's single JSON line must lead with the
trained-weights int8-static RTF and carry the guitar / training / streaming
companion keys (round-4 verdict item 1 — every documented headline must be
driver-captured in BENCH_r0N.json).
"""

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), '..', 'bench.py')
    spec = importlib.util.spec_from_file_location('bench_under_test', path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _run_scoreboard(monkeypatch, bench, headline):
    monkeypatch.setattr(bench, 'main',
                        lambda quant, control, emit: dict(headline))
    monkeypatch.setattr(bench, 'bench_tabcnn', lambda emit: {
        'value': 8047.0, 'mfu_pct': 4.0,
        'rtf_window_min': 7900.0, 'rtf_window_max': 8100.0})
    monkeypatch.setattr(bench, '_train_quick_result', lambda: {
        'train_device_steps_s': 7.1, 'train_loop_steps_s': 7.0,
        'train_loop_vs_device_pct': 98.6, 'train_mfu_pct': 6.2})
    monkeypatch.setattr(bench, 'bench_streaming', lambda emit: {
        'value': 0.474, 'blocking_p50_ms': 11.0})

    out = io.StringIO()
    with redirect_stdout(out):
        bench.scoreboard()

    lines = [l for l in out.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, 'scoreboard must print exactly one JSON line'
    return json.loads(lines[0])


HEADLINE = {
    'metric': 'full_pipeline_realtime_factor_int8_static',
    'value': 23810.0, 'unit': 'audio-sec/sec/chip', 'vs_baseline': 238.1,
    'mfu_pct': 34.8, 'achieved_tflops': 68.5, 'notes_per_batch': 5604,
    'rtf_window_min': 22942.0, 'rtf_window_max': 23944.0,
    'serving_dtype': 'int8-static', 'mfu_pct_vs_int8_peak': 17.4,
    'quant_mode': 'static', 'note_agreement_f1_vs_bf16': 0.8307,
    'rtf_bf16_control': 21700.0, 'int8_speedup_vs_bf16': 1.097,
    'int8_speedup_window_band': [1.054, 1.107],
    'trained_rtf_int8_static': 24192.0, 'trained_notes_per_clip': 107.2,
    'trained_int8_agreement_f1': 0.9625,
}


def test_scoreboard_leads_with_trained_weights(monkeypatch):
    bench = _load_bench()
    result = _run_scoreboard(monkeypatch, bench, HEADLINE)

    assert result['metric'] == 'trained_pipeline_realtime_factor_int8_static'
    assert result['value'] == 24192.0
    assert result['trained_int8_agreement_f1'] == 0.9625
    assert result['vs_baseline'] == round(24192.0 / 100.0, 3)

    # Calibrated-random companion keys (the former headline)
    assert result['random_rtf_int8_static'] == 23810.0
    assert result['random_int8_agreement_f1'] == 0.8307
    assert result['rtf_bf16_control'] == 21700.0
    assert result['int8_speedup_window_band'] == [1.054, 1.107]

    # Guitar / training / streaming companions
    assert result['tabcnn_rtf'] == 8047.0
    assert result['tabcnn_mfu_pct'] == 4.0
    assert result['train_device_steps_s'] == 7.1
    assert result['train_loop_steps_s'] == 7.0
    assert result['train_mfu_pct'] == 6.2
    assert result['streaming_device_ms_per_frame'] == 0.474


def test_scoreboard_survives_missing_trained_and_companions(monkeypatch):
    """Trained-weights failure falls back to the calibrated-random lead;
    a companion crash drops its keys without killing the line."""

    bench = _load_bench()
    headline = {k: v for k, v in HEADLINE.items()
                if not k.startswith('trained_')}

    def boom(emit):
        raise RuntimeError('chip fell over')

    monkeypatch.setattr(bench, 'main',
                        lambda quant, control, emit: dict(headline))
    monkeypatch.setattr(bench, 'bench_tabcnn', boom)
    monkeypatch.setattr(bench, '_train_quick_result', lambda: {
        'train_device_steps_s': 7.1, 'train_loop_steps_s': 7.0,
        'train_loop_vs_device_pct': 98.6, 'train_mfu_pct': 6.2})
    monkeypatch.setattr(bench, 'bench_streaming', boom)

    out = io.StringIO()
    with redirect_stdout(out):
        bench.scoreboard()
    result = json.loads(out.getvalue().strip())

    assert result['metric'] == 'full_pipeline_realtime_factor_int8_static'
    assert result['value'] == 23810.0
    assert 'tabcnn_rtf' not in result
    assert 'streaming_device_ms_per_frame' not in result
    assert result['train_loop_steps_s'] == 7.0
