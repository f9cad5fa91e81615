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


def test_cqt_quiet_bin_precision():
    """dB-scale CQT features match a float64 reference even in quiet bins.

    Regression guard for the contraction precision: a single-bf16-pass dot
    (TPU default) has error proportional to the FRAME energy, which shows
    up as tens of dB in off-resonance bins of tonal audio. Both device
    paths pin full-precision contractions.
    """

    from amt_tools_tpu.features import CQT

    sr, hop = 22050, 512
    cqt = CQT(sample_rate=sr, hop_length=hop, n_bins=96, bins_per_octave=24,
              use_pallas=False)

    t = np.arange(sr) / sr
    audio = sum(np.sin(2 * np.pi * f0 * h * t) * 0.1 / h
                for f0 in (110.0, 196.0) for h in range(1, 5))
    audio = audio.astype(np.float32)

    kernel = np.asarray(cqt._kernel, dtype=np.float64)
    frames = np.asarray(spectral.frame_signal(jnp.asarray(audio),
                                              cqt._support, hop))
    resp = frames.astype(np.float64) @ kernel
    nb = kernel.shape[-1] // 2
    mag64 = np.sqrt(resp[..., :nb] ** 2 + resp[..., nb:] ** 2).T
    ref_db = np.asarray(cqt.post_proc(jnp.asarray(mag64.astype(np.float32))))

    got_db = np.asarray(cqt.process_jax(jnp.asarray(audio)))
    np.testing.assert_allclose(got_db, ref_db, atol=5e-3)

    got_pallas = cqt_mag_pallas(jnp.asarray(audio), jnp.asarray(cqt._kernel),
                                cqt._support, hop, block_t=8, tile_s=1024,
                                interpret=True)
    got_pallas_db = np.asarray(cqt.post_proc(got_pallas))
    np.testing.assert_allclose(got_pallas_db, ref_db, atol=5e-3)
