"""Tests for the fused Pallas STFT/Mel kernel (interpret mode on CPU) and
the slice-based framing fast path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu.ops import spectral
from amt_tools_tpu.ops.pallas_stft import (stft_power_pallas,
                                           pallas_stft_supported,
                                           split_bank_bf16)


def _tonal_audio(n, sr=16000, seed=0):
    """Sparse-spectrum audio — the adversarial case for DFT cancellation."""

    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    audio = sum(a * np.sin(2 * np.pi * f * t)
                for a, f in zip(rng.rand(4) * 0.2 + 0.05,
                                rng.rand(4) * 2000 + 100))
    return audio.astype(np.float32)


def _power_ref(audio, n_fft, hop, center=True):
    window = jnp.asarray(spectral.hann_window(n_fft))
    frames = spectral.frame_signal(jnp.asarray(audio), n_fft, hop,
                                   center=center)
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))
    return jnp.square(spec).swapaxes(-1, -2)


def test_pallas_stft_matches_fft_reference():
    n_fft, hop = 512, 128
    audio = _tonal_audio(16000)

    hi, lo = split_bank_bf16(spectral.dft_bank(n_fft))
    got = stft_power_pallas(jnp.asarray(audio), hi, lo, n_fft, hop,
                            block_t=8, interpret=True)
    ref = _power_ref(audio, n_fft, hop)

    assert got.shape == ref.shape
    # bf16x3 contraction: exact to ~1e-5 of the spectral peak
    scale = float(jnp.max(ref))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-5)


def test_pallas_stft_fast_mode_and_center_false():
    n_fft, hop = 512, 128
    audio = _tonal_audio(8000, seed=1)
    hi, lo = split_bank_bf16(spectral.dft_bank(n_fft))

    # fast (single-pass) mode: looser tolerance, same shape/algebra
    got = stft_power_pallas(jnp.asarray(audio), hi, lo, n_fft, hop,
                            block_t=8, exact=False, interpret=True)
    ref = _power_ref(audio, n_fft, hop)
    scale = float(jnp.max(ref))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-2)

    got = stft_power_pallas(jnp.asarray(audio), hi, lo, n_fft, hop,
                            center=False, block_t=8, interpret=True)
    ref = _power_ref(audio, n_fft, hop, center=False)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-5)


def test_pallas_stft_frame_algebra():
    n_fft, hop = 512, 128
    hi, lo = split_bank_bf16(spectral.dft_bank(n_fft))
    for n in [16000, 16000 + 1, 128 * 10]:
        out = stft_power_pallas(jnp.zeros(n), hi, lo, n_fft, hop,
                                block_t=8, interpret=True)
        assert out.shape == (n_fft // 2 + 1, 1 + n // hop)

    with pytest.raises(ValueError):
        stft_power_pallas(jnp.zeros(1024), hi, lo, 512, 100, interpret=True)

    # Support check is backend-aware: never claims support on CPU
    assert not pallas_stft_supported(2048, 512) or \
        jax.default_backend() in ('tpu', 'axon')


def test_melspec_pallas_path_matches_fft_path():
    from amt_tools_tpu.features import MelSpec

    audio = _tonal_audio(16000 * 2)

    ref_mod = MelSpec(sample_rate=16000, hop_length=512, n_mels=64,
                      n_fft=2048, use_pallas=False)
    fast_mod = MelSpec(sample_rate=16000, hop_length=512, n_mels=64,
                       n_fft=2048, use_pallas=True)
    fast_mod._pallas_interpret = True

    ref = np.asarray(ref_mod.process_jax(audio))
    got = np.asarray(fast_mod.process_jax(audio))

    assert got.shape == ref.shape
    # Final [0, 1] dB-scaled features agree tightly (bf16x3 contraction)
    np.testing.assert_allclose(got, ref, atol=2e-3)

    # Batched audio goes through the clip-blocked kernel grid
    batched = np.stack([audio, audio * 0.5])
    got_b = np.asarray(fast_mod.process_jax(batched))
    assert got_b.shape == (2,) + ref.shape
    np.testing.assert_allclose(got_b[0], ref, atol=2e-3)


def test_stft_pallas_path_matches_fft_path():
    from amt_tools_tpu.features import STFT

    audio = _tonal_audio(16000, seed=2)

    ref_mod = STFT(sample_rate=16000, hop_length=512, n_fft=2048,
                   use_pallas=False)
    fast_mod = STFT(sample_rate=16000, hop_length=512, n_fft=2048,
                    use_pallas=True)
    fast_mod._pallas_interpret = True

    ref = np.asarray(ref_mod.process_jax(audio))
    got = np.asarray(fast_mod.process_jax(audio))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_slice_framing_equals_gather_framing():
    rng = np.random.RandomState(3)
    audio = rng.randn(2, 5000).astype(np.float32)

    # hop divides frame length -> slice path; compare against an
    # explicitly-gathered reference
    for center in (True, False):
        frames = spectral.frame_signal(audio, 512, 128, center=center)

        num = frames.shape[-2]
        pad = 256 if center else 0
        padded = np.pad(audio, ((0, 0), (pad, 512)))
        ref = np.stack([padded[:, t * 128: t * 128 + 512]
                        for t in range(num)], axis=-2)

        np.testing.assert_array_equal(np.asarray(frames), ref)

    # non-dividing hop keeps the gather path; frame algebra unchanged
    frames = spectral.frame_signal(audio, 512, 200, center=True)
    assert frames.shape == (2, 1 + 5000 // 200, 512)


def test_pallas_stft_batched_clip_blocks():
    """The clip-blocked grid (clip_block > 1) matches per-clip results."""

    n_fft, hop = 512, 128
    clips = np.stack([_tonal_audio(8000, seed=s) for s in range(4)])
    hi, lo = split_bank_bf16(spectral.dft_bank(n_fft))

    got = stft_power_pallas(jnp.asarray(clips), hi, lo, n_fft, hop,
                            clip_block=2, block_t=8, interpret=True)

    assert got.shape[0] == 4
    for b in range(4):
        ref = _power_ref(clips[b], n_fft, hop)
        scale = float(jnp.max(ref))
        np.testing.assert_allclose(np.asarray(got[b]) / scale,
                                   np.asarray(ref) / scale, atol=2e-5)


def test_pallas_stft_batch_not_divisible_by_default_block():
    """Small odd batches take the whole batch as one clip block."""

    n_fft, hop = 512, 128
    clips = np.stack([_tonal_audio(4000, seed=s) for s in range(3)])
    hi, lo = split_bank_bf16(spectral.dft_bank(n_fft))

    got = stft_power_pallas(jnp.asarray(clips), hi, lo, n_fft, hop,
                            block_t=8, interpret=True)

    for b in range(3):
        ref = _power_ref(clips[b], n_fft, hop)
        scale = float(jnp.max(ref))
        np.testing.assert_allclose(np.asarray(got[b]) / scale,
                                   np.asarray(ref) / scale, atol=2e-5)


def test_misaligned_hop_fails_loudly():
    """Explicit use_pallas=True must not reach the kernel with hop % 128 != 0."""

    import pytest

    from amt_tools_tpu.ops.pallas_stft import split_bank_bf16, stft_power_pallas
    from amt_tools_tpu.ops import spectral

    bank = spectral.dft_bank(512, 512, spectral.hann_window(512))
    hi, lo = split_bank_bf16(bank)

    with pytest.raises(ValueError, match='multiple of 128'):
        stft_power_pallas(np.zeros(2048, np.float32), hi, lo,
                          n_fft=512, hop_length=64, interpret=True)
