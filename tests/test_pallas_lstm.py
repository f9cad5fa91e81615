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


@pytest.mark.parametrize('reverse', [False, True])
def test_custom_vjp_matches_scan_gradients(reverse):
    """The kernel's custom-VJP backward equals the XLA scan's gradients.

    Training routes through ``lstm_scan_pallas_grad`` (a second Pallas
    kernel runs BPTT in the opposite traversal order); its d(xw) and
    d(W_h) must match autodiff through ``_lstm_scan``. T deliberately not
    a multiple of block_t: zero-padded residual rows must annihilate the
    backward carries.
    """

    from amt_tools_tpu.ops.pallas_lstm import lstm_scan_pallas_grad

    batch, frames, hidden = 8, 37, 32
    rng = np.random.RandomState(0)
    xw = jnp.asarray(rng.randn(batch, frames, 4 * hidden).astype(np.float32)
                     * 0.3)
    w_h = jnp.asarray(rng.randn(hidden, 4 * hidden).astype(np.float32) * 0.05)
    dout = jnp.asarray(rng.randn(batch, frames, hidden).astype(np.float32))

    zeros = jnp.zeros((batch, hidden))

    def loss_ref(xw, w_h):
        out, _ = _lstm_scan(xw, zeros, zeros, w_h, reverse=reverse)
        return jnp.sum(out * dout)

    def loss_kernel(xw, w_h):
        out = lstm_scan_pallas_grad(xw, w_h, reverse, 16, True)
        return jnp.sum(out * dout)

    np.testing.assert_allclose(float(loss_kernel(xw, w_h)),
                               float(loss_ref(xw, w_h)), rtol=1e-6)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(xw, w_h)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1))(xw, w_h)

    for a, b in zip(g_ref, g_kernel):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
