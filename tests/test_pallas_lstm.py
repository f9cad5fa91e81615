"""Fused Pallas LSTM recurrence kernel vs the XLA scan (interpret on CPU).

The kernel (``ops/pallas_lstm.py``) replaces the per-step ``lax.scan`` of
``ops.lstm._lstm_scan`` for whole-sequence inference; these tests pin the
recurrence math (both directions, non-multiple block lengths) against the
scan reference. On-TPU speed/accuracy is covered by the serving benchmark.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu.ops.lstm import _lstm_scan
from amt_tools_tpu.ops.pallas_lstm import (lstm_scan_pallas,
                                           pallas_lstm_supported)


def _data(batch=8, frames=70, hidden=32, seed=0):
    rng = np.random.RandomState(seed)
    xw = jnp.asarray(rng.randn(batch, frames, 4 * hidden).astype(np.float32)
                     * 0.3)
    w_h = jnp.asarray(rng.randn(hidden, 4 * hidden).astype(np.float32) * 0.05)

    return xw, w_h


@pytest.mark.parametrize('reverse', [False, True])
def test_kernel_matches_scan(reverse):
    xw, w_h = _data()
    batch, _, four_h = xw.shape
    hidden = four_h // 4

    zeros = jnp.zeros((batch, hidden))
    ref, _ = _lstm_scan(xw, zeros, zeros, w_h, reverse=reverse)

    got = lstm_scan_pallas(xw, w_h, reverse=reverse, block_t=16,
                           interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('frames', [64, 65, 79])
def test_padded_tail_is_exact(frames):
    """T not a multiple of block_t: zero carry is a fixed point under zero
    input, so tail padding cannot leak into valid frames (either direction)."""

    xw, w_h = _data(frames=frames)
    batch, _, four_h = xw.shape
    hidden = four_h // 4
    zeros = jnp.zeros((batch, hidden))

    for reverse in (False, True):
        ref, _ = _lstm_scan(xw, zeros, zeros, w_h, reverse=reverse)
        got = lstm_scan_pallas(xw, w_h, reverse=reverse, block_t=16,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_supported_gating():
    # CPU backend: never supported (kernel is TPU-only)
    assert not pallas_lstm_supported(8, 32) or \
        jax.default_backend() in ('tpu', 'axon')

    # Shape constraints regardless of backend
    if jax.default_backend() in ('tpu', 'axon'):
        assert pallas_lstm_supported(128, 256)
        assert not pallas_lstm_supported(127, 256)   # batch % 8
        assert not pallas_lstm_supported(128, 100)   # 4H % 128
