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


def test_training_paths_never_take_the_kernel(monkeypatch):
    """Differentiating train=True forwards must stay on the XLA scan.

    The kernel has no VJP; LanguageModel/OnlineLanguageModel gate it with
    ``allow_pallas=not train``. Force ``pallas_lstm_supported`` to True: if
    any training path routes through the kernel, jax raises on the missing
    differentiation rule and this test fails.
    """

    import optax

    from amt_tools_tpu import tools
    from amt_tools_tpu.models import OnsetsFrames2, OnsetsFramesOnline
    from amt_tools_tpu.train import init_state, make_train_step
    from amt_tools_tpu.ops import pallas_lstm

    profile = tools.PianoProfile()
    dim_out = profile.get_range_len()
    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: rng.rand(8, 1, 72, 16).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(8, dim_out, 16) > 0.9
                               ).astype(np.float32),
    }
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH].copy()

    for model_cls in (OnsetsFrames2, OnsetsFramesOnline):
        model = model_cls(dim_in=72, profile=profile, model_complexity=2)
        opt = optax.adam(1e-3)
        # Init traces train=False (kernel-eligible) — patch after it
        state = init_state(model, opt, batch, jax.random.PRNGKey(0))

        with monkeypatch.context() as patched:
            patched.setattr(pallas_lstm, 'pallas_lstm_supported',
                            lambda batch, hidden: True)
            step = make_train_step(model, opt)
            state, loss = step(state, dict(batch))

        assert np.isfinite(float(loss[tools.KEY_LOSS_TOTAL]))
