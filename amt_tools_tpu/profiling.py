"""Tracing and profiling utilities.

The reference has only manual wall-clock helpers (``tools/utils.py:3970-4045``);
here profiling is a first-class aux subsystem (SURVEY §5.1): ``jax.profiler``
trace capture for TensorBoard, stage timers that force device completion, and
a lightweight per-stage timing report.
"""

import contextlib
import time
from collections import defaultdict

import numpy as np

__all__ = ['trace', 'StageTimer', 'block_and_time',
           'peak_flops', 'compiled_flops', 'mfu']


@contextlib.contextmanager
def trace(log_dir):
    """Capture a ``jax.profiler`` trace (viewable in TensorBoard/XProf).

    Usage::

        with profiling.trace('/tmp/jax-trace'):
            train_step(state, batch)
    """

    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, repeats=1, **kwargs):
    """Run a function, forcing device completion; returns (result, best_secs)."""

    import jax

    result = None
    best = float('inf')
    for _ in range(max(1, repeats)):
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - start)

    return result, best


class StageTimer(object):
    """Accumulate wall-clock timings per named pipeline stage.

    Usage::

        timer = StageTimer()
        with timer('features'):
            feats = mel.process_audio(audio)
        with timer('forward'):
            ...
        print(timer.report())
    """

    def __init__(self, sync=True):
        self.sync = sync
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, stage):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    import jax
                    # Fence outstanding device work so the stage is charged
                    jax.effects_barrier()
                except Exception:
                    pass
            self.times[stage].append(time.perf_counter() - start)

    def report(self):
        """Human-readable per-stage summary (total / mean / count)."""

        lines = []
        for stage, samples in self.times.items():
            arr = np.asarray(samples)
            lines.append(f'{stage:24s} total {arr.sum():8.4f}s  '
                         f'mean {arr.mean():8.4f}s  n={len(arr)}')

        return '\n'.join(lines)

    def totals(self):
        """Dict of per-stage total seconds."""

        return {stage: float(np.sum(samples))
                for stage, samples in self.times.items()}


def peak_flops(device=None, dtype='bf16'):
    """Peak matmul FLOP/s of a TPU device (0.0 if unknown).

    Published per-chip dense peaks; used as the MFU denominator.
    ``dtype='int8'`` returns the int8 MXU peak (2x bf16 on v5e/v5p/v6e —
    918 INT8 TOPS on v5p per Google's spec; v4 runs int8 at the bf16 rate)
    so quantized-mode MFU is measured against the rate the hardware
    actually offers that format.
    """

    import jax

    if device is None:
        device = jax.devices()[0]

    kind = getattr(device, 'device_kind', '').lower()
    table = {
        'v5 lite': (197e12, 394e12), 'v5e': (197e12, 394e12),
        'v5p': (459e12, 918e12), 'v5': (459e12, 918e12),
        'v4': (275e12, 275e12),
        'v6 lite': (918e12, 1836e12), 'v6e': (918e12, 1836e12),
    }
    for key, (bf16, int8) in table.items():
        if key in kind:
            return int8 if dtype == 'int8' else bf16

    return 0.0


def compiled_flops(fn, *args, **kwargs):
    """FLOPs XLA accounts to one call of a jitted function.

    Lowers + compiles ``fn`` for the given arguments and reads the
    executable's cost analysis. Combine with a measured wall-clock and
    :func:`peak_flops` for MFU::

        flops = profiling.compiled_flops(step, state, batch)
        _, secs = profiling.block_and_time(step, state, batch, repeats=5)
        mfu = flops / secs / profiling.peak_flops()
    """

    compiled = fn.lower(*args, **kwargs).compile()

    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]

    return float(cost.get('flops', 0.0))


def compiled_cost(fn, *args, **kwargs):
    """XLA cost analysis of one call: ``(flops, bytes_accessed)``.

    ``bytes_accessed`` is the compiler's estimate of total memory traffic
    (HBM reads + writes across fused ops) — the numerator of a roofline:
    dividing by the measured wall-clock and the chip's HBM bandwidth
    (:func:`peak_hbm_bw`) says how close a stage runs to the memory bound.
    """

    compiled = fn.lower(*args, **kwargs).compile()

    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]

    return float(cost.get('flops', 0.0)), \
        float(cost.get('bytes accessed', 0.0))


def peak_hbm_bw(device=None):
    """Published per-chip HBM bandwidth in bytes/s (0.0 if unknown)."""

    import jax

    if device is None:
        device = jax.devices()[0]

    kind = getattr(device, 'device_kind', '').lower()
    table = {
        'v5 lite': 819e9, 'v5e': 819e9,
        'v5p': 2765e9, 'v5': 2765e9,
        'v4': 1228e9,
        'v6 lite': 1640e9, 'v6e': 1640e9,
    }
    for key, bw in table.items():
        if key in kind:
            return bw

    return 0.0


def mfu(fn, *args, repeats=5, device=None, **kwargs):
    """Measured model FLOPs utilization of a jitted callable.

    Returns ``(mfu_fraction, achieved_flops_per_sec, seconds_per_call)``;
    ``mfu_fraction`` is 0.0 when the device peak is unknown.
    """

    flops = compiled_flops(fn, *args, **kwargs)
    _, secs = block_and_time(fn, *args, repeats=repeats, **kwargs)

    achieved = flops / secs
    peak = peak_flops(device)

    return (achieved / peak if peak else 0.0), achieved, secs
