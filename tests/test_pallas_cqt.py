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


def test_pallas_cqt_bf16x3_mode_accuracy():
    """exact='high' (in-kernel 3-pass bf16x3) tracks the exact contraction.

    The dropped lo*lo term and bf16 splits bound the error at O(2^-16) of
    the frame energy. (exact=False's single-pass error is a TPU MXU
    artifact — interpret mode on CPU runs DEFAULT dots in f32, so the
    mode ORDERING can only be asserted on hardware; here we pin the
    bf16x3 bound, whose casts are explicit and thus faithful on CPU.)
    """

    kernel, support = _bank()
    rng = np.random.RandomState(1)
    # Tonal audio: the hard case (quiet off-resonance bins next to loud
    # partials) for low-precision contraction
    t = np.arange(22050 * 2) / 22050.0
    audio = (0.5 * np.sin(2 * np.pi * 220.0 * t) +
             0.3 * np.sin(2 * np.pi * 331.3 * t) +
             0.01 * rng.randn(t.size)).astype(np.float32)

    args = (jnp.asarray(audio), jnp.asarray(kernel), support, 512)
    kw = dict(block_t=8, tile_s=1024, interpret=True)

    exact = np.asarray(cqt_mag_pallas(*args, exact=True, **kw))
    high = np.asarray(cqt_mag_pallas(*args, exact='high', **kw))

    err_high = np.max(np.abs(high - exact)) / exact.max()

    assert 0 < err_high < 2e-4, f'bf16x3 error {err_high:.2e}'


def test_vqt_exact_param_reaches_kernel(monkeypatch):
    """CQT(exact=...) is threaded through to the fused kernel call."""

    from amt_tools_tpu.features import CQT
    from amt_tools_tpu.ops import pallas_cqt

    seen = []

    def fake_kernel(audio, kernel, max_length, hop_length, exact=True,
                    **kw):
        seen.append(exact)
        n_bins = kernel.shape[-1] // 2
        frames = 1 + audio.shape[-1] // hop_length
        return jnp.zeros((n_bins, frames), jnp.float32)

    monkeypatch.setattr(pallas_cqt, 'cqt_mag_pallas', fake_kernel)

    cqt = CQT(sample_rate=22050, hop_length=512, n_bins=96,
              bins_per_octave=24, use_pallas=True, exact='high')
    cqt.process_jax(jnp.zeros(22050))          # 1-D path
    cqt.process_jax(jnp.zeros((2, 22050)))     # batched/vmapped path

    assert seen and all(e == 'high' for e in seen)


def test_grouped_banks_match_full_bank():
    """Support-grouped contraction == full-bank contraction.

    ``VQT(grouped=...)`` splits bins into groups padded only to their own
    longest wavelet: window sample m of bin k lands on the same audio
    sample either way (both banks center wavelets identically relative to
    the frame center), so removing the structural zero rows is the same
    math. Pins the grouped concat against the single full-bank kernel
    and against the XLA reference.
    """

    sr, hop, bpo, n_bins = 22050, 512, 24, 96
    freqs = spectral.cqt_frequencies(n_bins, 100.0, bpo)
    alpha = 2 ** (1 / bpo) - 1

    kernel, support = spectral.wavelet_bank(freqs, sr, alpha)

    rng = np.random.RandomState(2)
    t = np.arange(sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t) +
             0.05 * rng.randn(t.size)).astype(np.float32)

    kw = dict(block_t=8, tile_s=1024, interpret=True)
    full = np.asarray(cqt_mag_pallas(jnp.asarray(audio), jnp.asarray(kernel),
                                     support, hop, **kw))

    group_size = 32
    parts = []
    supports = []
    for s in range(0, n_bins, group_size):
        k_g, sup_g = spectral.wavelet_bank(freqs[s: s + group_size], sr,
                                           alpha)
        supports.append(sup_g)
        parts.append(np.asarray(cqt_mag_pallas(
            jnp.asarray(audio), jnp.asarray(k_g), sup_g, hop, **kw)))
    got = np.concatenate(parts, axis=0)

    # The split actually dropped support tiles (the point of grouping)
    assert max(supports) == support and min(supports) < support

    scale = full.max()
    np.testing.assert_allclose(got, full, atol=1e-5 * scale, rtol=1e-4)


def test_vqt_grouped_auto_builds_groups():
    """CQT(grouped='auto') materializes per-group banks only when the
    split drops tiles, and group supports cover the bank's range."""

    from amt_tools_tpu.features import CQT

    cqt = CQT(sample_rate=22050, hop_length=512, n_bins=192,
              bins_per_octave=24, grouped='auto')
    assert cqt._groups is not None
    assert sum(k.shape[-1] // 2 for k, _ in cqt._groups) == 192
    tiles_grouped = sum(sup // 2048 for _, sup in cqt._groups)
    tiles_full = (cqt._support // 2048) * len(cqt._groups)
    assert tiles_grouped < tiles_full
    # Group supports are tile multiples (the fused kernel's constraint)
    assert all(sup % 2048 == 0 for _, sup in cqt._groups)

    # Too few bins for two groups -> no grouping machinery
    small = CQT(sample_rate=22050, hop_length=512, n_bins=96,
                bins_per_octave=24, grouped='auto')
    assert small._groups is None

    off = CQT(sample_rate=22050, hop_length=512, n_bins=192,
              bins_per_octave=24, grouped=False)
    assert off._groups is None


def test_grouped_single_kernel_matches_full_bank():
    """cqt_mag_pallas_grouped (ONE kernel, static job list) == full bank.

    The job-list kernel exists because one pallas_call per group puts
    several distinct custom kernels in one XLA program, which wedges the
    tunnel AOT compiler; this variant must reproduce the single-bank
    contraction on the concatenated group banks. Also exercises the
    column-padding path with a non-uniform last group.
    """

    from amt_tools_tpu.ops.pallas_cqt import cqt_mag_pallas_grouped

    sr, hop, bpo, n_bins = 22050, 512, 24, 80
    freqs = spectral.cqt_frequencies(n_bins, 100.0, bpo)
    alpha = 2 ** (1 / bpo) - 1
    kernel, support = spectral.wavelet_bank(freqs, sr, alpha)

    rng = np.random.RandomState(3)
    t = np.arange(sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t) +
             0.05 * rng.randn(t.size)).astype(np.float32)

    kw = dict(block_t=8, tile_s=1024, interpret=True)
    full = np.asarray(cqt_mag_pallas(jnp.asarray(audio), jnp.asarray(kernel),
                                     support, hop, **kw))

    group_size = 32  # groups of 32, 32, 16 -> pads the last group
    banks = [spectral.wavelet_bank(freqs[s: s + group_size], sr, alpha)
             for s in range(0, n_bins, group_size)]
    gb = max(k.shape[-1] // 2 for k, _ in banks)
    slabs = []
    for k_g, _ in banks:
        nb = k_g.shape[-1] // 2
        if nb < gb:
            pad = np.zeros((k_g.shape[0], gb - nb), k_g.dtype)
            k_g = np.concatenate([k_g[:, :nb], pad, k_g[:, nb:], pad], axis=1)
        slabs.append(k_g)
    stack = np.concatenate(slabs, axis=0)
    supports = tuple(sup for _, sup in banks)
    bins = tuple(k.shape[-1] // 2 for k, _ in banks)
    assert min(supports) < support  # the split actually dropped tiles

    got = np.asarray(cqt_mag_pallas_grouped(
        jnp.asarray(audio), jnp.asarray(stack), supports, bins, hop, **kw))

    assert got.shape == full.shape
    scale = full.max()
    np.testing.assert_allclose(got, full, atol=1e-5 * scale, rtol=1e-4)

    # bf16x3 mode agrees with its own full-bank counterpart too
    full_h = np.asarray(cqt_mag_pallas(jnp.asarray(audio),
                                       jnp.asarray(kernel), support, hop,
                                       exact='high', **kw))
    got_h = np.asarray(cqt_mag_pallas_grouped(
        jnp.asarray(audio), jnp.asarray(stack), supports, bins, hop,
        exact='high', **kw))
    np.testing.assert_allclose(got_h, full_h, atol=3e-4 * scale, rtol=1e-2)


def test_vqt_grouped_uses_single_kernel(monkeypatch):
    """CQT(grouped=...) routes through cqt_mag_pallas_grouped (one kernel)."""

    from amt_tools_tpu.features import CQT
    from amt_tools_tpu.ops import pallas_cqt

    calls = []

    def fake_grouped(audio, stack, supports, bins, hop_length, **kw):
        calls.append((supports, bins))
        frames = 1 + audio.shape[-1] // hop_length
        return jnp.zeros((sum(bins), frames), jnp.float32)

    monkeypatch.setattr(pallas_cqt, 'cqt_mag_pallas_grouped', fake_grouped)

    cqt = CQT(sample_rate=22050, hop_length=512, n_bins=192,
              bins_per_octave=24, use_pallas=True, grouped='auto')
    out = cqt.process_jax(jnp.zeros(22050))
    assert out.shape[-2] == 192
    assert calls and calls[0][1] == (64, 64, 64)
