"""Tests for the fused Pallas CQT kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu.ops import spectral
from amt_tools_tpu.ops.pallas_cqt import cqt_mag_pallas, pallas_cqt_supported


def _bank(n_bins=48, bpo=12, fmin=100.0, sr=22050):
    freqs = spectral.cqt_frequencies(n_bins, fmin, bpo)
    alpha = 2 ** (1 / bpo) - 1
    return spectral.wavelet_bank(freqs, sr, alpha)


def test_pallas_cqt_matches_xla_reference():
    kernel, support = _bank()
    rng = np.random.RandomState(0)
    audio = rng.randn(22050).astype(np.float32) * 0.1

    ref = spectral.cqt_mag(jnp.asarray(audio), jnp.asarray(kernel),
                           support, 512)
    got = cqt_mag_pallas(jnp.asarray(audio), jnp.asarray(kernel), support,
                         512, block_t=8, tile_s=1024, interpret=True)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pallas_cqt_frame_algebra():
    kernel, support = _bank()
    for n in [22050, 22050 + 1, 512 * 10]:
        audio = np.zeros(n, dtype=np.float32)
        out = cqt_mag_pallas(jnp.asarray(audio), jnp.asarray(kernel),
                             support, 512, block_t=8, tile_s=1024,
                             interpret=True)
        assert out.shape[-1] == 1 + n // 512


def test_tiling_constraints():
    with pytest.raises(ValueError):
        cqt_mag_pallas(jnp.zeros(1024), jnp.zeros((4096, 8)), 4096, 512,
                       tile_s=1000, interpret=True)

    # Support check is backend-aware: never claims support on CPU
    assert not pallas_cqt_supported(4096, 512) or \
        jax.default_backend() in ('tpu', 'axon')
