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

__all__ = ['trace', 'StageTimer', 'block_and_time']


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
