"""Tests for feature extraction: frame algebra, STFT/Mel/CQT correctness."""

import numpy as np
import pytest

from amt_tools_tpu.features import (STFT, MelSpec, CQT, VQT, HCQT, HVQT,
                                    WaveformWrapper, SignalPower, FeatureCombo)
from amt_tools_tpu.ops import spectral


def _tone(fs, freq, dur, amp=0.5):
    t = np.arange(int(fs * dur)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_frame_algebra_contract():
    """get_expected_frames and get_sample_range must be mutually consistent."""

    for module in [STFT(sample_rate=16000, hop_length=512),
                   MelSpec(sample_rate=16000, hop_length=512),
                   CQT(sample_rate=22050, hop_length=512, n_bins=84),
                   WaveformWrapper(sample_rate=16000, hop_length=256)]:
        for num_frames in [1, 5, 100]:
            sample_range = module.get_sample_range(num_frames)
            for n in [sample_range[0], sample_range[-1]]:
                audio = np.zeros(int(n), dtype=np.float32)
                assert module.get_expected_frames(audio) == num_frames, \
                    f'{module.features_name()} n={n}'


def test_stft_shape_and_times():
    fs, hop = 16000, 512
    stft = STFT(sample_rate=fs, hop_length=hop, n_fft=2048)
    audio = _tone(fs, 440, 1.0)

    feats = stft.process_audio(audio)
    expected_t = 1 + len(audio) // hop
    assert feats.shape == (1, 1025, expected_t)
    assert stft.get_expected_frames(audio) == expected_t

    times = stft.get_times(audio)
    assert len(times) == expected_t
    assert abs(times[1] - hop / fs) < 1e-9

    # dB scaling into [0, 1]
    assert feats.min() >= 0.0 and feats.max() <= 1.0


def test_process_audio_bucket_padding_is_exact():
    """The jitted, bucket-padded host path == the eager transform trimmed.

    ``process_audio`` zero-pads audio to a coarse length bucket (so
    variable-length corpora compile O(log N) feature graphs instead of
    dispatching op-by-op through the device tunnel) and trims the frames;
    trailing zeros are exactly what frames past the audio's end already
    see, so the kept frames must match an unpadded run.
    """

    import jax.numpy as jnp

    fs, hop = 16000, 512
    audio = _tone(fs, 440, 1.37)[: 21997]  # odd length, off any bucket

    for module in (STFT(sample_rate=fs, hop_length=hop, n_fft=2048),
                   MelSpec(sample_rate=fs, hop_length=hop, n_mels=48)):
        got = module.process_audio(audio)
        want = np.asarray(module.process_jax(jnp.asarray(audio)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_stft_peak_frequency():
    fs = 16000
    stft = STFT(sample_rate=fs, hop_length=512, n_fft=2048, decibels=False)
    audio = _tone(fs, 1000, 0.5)

    feats = stft.process_audio(audio)  # (1, F, T)
    mid = feats.shape[-1] // 2
    peak_bin = np.argmax(feats[0, :, mid])
    peak_freq = peak_bin * fs / 2048
    assert abs(peak_freq - 1000) < fs / 2048 + 1


def test_stft_matches_manual_dft():
    """One frame of our STFT must match a hand-computed windowed DFT."""

    fs, n_fft = 8000, 512
    rng = np.random.RandomState(1)
    audio = rng.randn(2048).astype(np.float32)

    stft = STFT(sample_rate=fs, hop_length=256, n_fft=n_fft, decibels=False)
    feats = stft.process_audio(audio)[0]  # (F, T)

    # Frame 2 starts at 2*256 - n_fft//2 (center padding)
    start = 2 * 256 - n_fft // 2
    frame = audio[start: start + n_fft]
    window = spectral.hann_window(n_fft)
    manual = np.abs(np.fft.rfft(frame * window))

    np.testing.assert_allclose(feats[:, 2], manual, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    fb = spectral.mel_filterbank(16000, 2048, n_mels=229)
    assert fb.shape == (229, 1025)
    # Every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # HTK variant differs from Slaney
    fb_htk = spectral.mel_filterbank(16000, 2048, n_mels=229, htk=True)
    assert not np.allclose(fb, fb_htk)


def test_mel_to_hz_roundtrip():
    freqs = np.array([0.0, 440.0, 1000.0, 4000.0, 8000.0])
    for htk in (False, True):
        np.testing.assert_allclose(
            spectral.mel_to_hz(spectral.hz_to_mel(freqs, htk), htk), freqs,
            rtol=1e-10, atol=1e-8)


def test_melspec_shape():
    fs, hop = 16000, 512
    mel = MelSpec(sample_rate=fs, hop_length=hop, n_mels=229)
    audio = _tone(fs, 440, 1.0)

    feats = mel.process_audio(audio)
    assert feats.shape == (1, 229, 1 + len(audio) // hop)
    assert mel.get_feature_size() == 229
    assert feats.min() >= 0.0 and feats.max() <= 1.0


def test_cqt_bin_accuracy():
    """A pure tone must peak at the CQT bin matching its frequency."""

    fs = 22050
    cqt = CQT(sample_rate=fs, hop_length=512, n_bins=84, bins_per_octave=12,
              decibels=False)
    freqs = spectral.cqt_frequencies(84, cqt.fmin, 12)

    for target_bin in [24, 48, 70]:
        audio = _tone(fs, freqs[target_bin], 0.8)
        feats = cqt.process_audio(audio)[0]  # (F, T)
        mid = feats.shape[-1] // 2
        peak = np.argmax(feats[:, mid])
        assert abs(int(peak) - target_bin) <= 1, f'bin {target_bin} -> {peak}'


def test_cqt_shape_uniform_hop():
    fs, hop = 22050, 512
    cqt = CQT(sample_rate=fs, hop_length=hop, n_bins=192, bins_per_octave=24)
    audio = _tone(fs, 220, 0.4)

    feats = cqt.process_audio(audio)
    assert feats.shape == (1, 192, 1 + len(audio) // hop)


def test_vqt_gamma_reduces_low_bin_length():
    fs = 22050
    vqt = VQT(sample_rate=fs, hop_length=512, n_bins=84)
    cqt = CQT(sample_rate=fs, hop_length=512, n_bins=84)
    # VQT filters (gamma > 0) are shorter at low frequencies
    assert vqt._support <= cqt._support
    assert vqt.gamma > 0 and cqt.gamma == 0


def test_hcqt_stacks_harmonics():
    fs = 22050
    hcqt = HCQT(sample_rate=fs, hop_length=512, n_bins=60, bins_per_octave=12,
                fmin=65.4, harmonics=[1, 2])
    audio = _tone(fs, 220, 0.3)

    feats = hcqt.process_audio(audio)
    assert feats.shape == (2, 60, 1 + len(audio) // 512)
    assert hcqt.get_num_channels() == 2


def test_signal_power():
    fs = 16000
    power = SignalPower(sample_rate=fs, hop_length=512, decibels=False,
                        win_length=512)
    audio = _tone(fs, 440, 0.5, amp=0.5)

    powers = power.process_audio(audio)
    assert powers.shape == (1 + len(audio) // 512,)
    # Steady sine of amplitude 0.5 has mean power ~0.125
    assert abs(np.median(powers) - 0.125) < 0.01


def test_feature_combo():
    fs = 16000
    mel1 = MelSpec(sample_rate=fs, hop_length=512, n_mels=64)
    mel2 = MelSpec(sample_rate=fs, hop_length=512, n_mels=64, htk=True)
    combo = FeatureCombo([mel1, mel2])

    audio = _tone(fs, 440, 0.5)
    feats = combo.process_audio(audio)
    assert feats.shape == (2, 64, 1 + len(audio) // 512)
    assert combo.get_num_channels() == 2
    assert 'MelSpec' in combo.features_name()


def test_empty_audio():
    stft = STFT(sample_rate=16000, hop_length=512)
    feats = stft.process_audio(np.zeros(0, dtype=np.float32))
    assert feats.shape == (1, 1025, 0)
    assert stft.get_expected_frames(np.zeros(0)) == 0


def test_process_jax_batched():
    """process_jax must accept batched audio (vmap-free broadcasting)."""

    import jax.numpy as jnp

    fs = 16000
    mel = MelSpec(sample_rate=fs, hop_length=512, n_mels=32)
    batch = jnp.asarray(np.stack([_tone(fs, 440, 0.3), _tone(fs, 880, 0.3)]))

    feats = mel.process_jax(batch)
    assert feats.shape[0] == 2
    assert feats.shape[1:] == (1, 32, 1 + batch.shape[-1] // 512)


def test_feature_combo_sample_range_intersection():
    """Combo sample ranges are the intersection of constituents."""

    fs = 16000
    a = MelSpec(sample_rate=fs, hop_length=512, n_mels=32)
    b = MelSpec(sample_rate=fs, hop_length=512, n_mels=32, htk=True)
    combo = FeatureCombo([a, b])

    for num_frames in (1, 7):
        rng_combo = combo.get_sample_range(num_frames)
        for n in (rng_combo[0], rng_combo[-1]):
            assert combo.get_expected_frames(np.zeros(int(n))) == num_frames


def test_batched_db_features_match_per_clip():
    """Batched feature extraction == per-clip extraction, exactly.

    The dB reference (librosa ref=np.max semantics) is PER TRACK: the
    reference computes features in a per-track host loop, so a batched
    in-graph frontend must normalize each clip by its own maximum — one
    loud clip must not shift its batchmates' dB scale.
    """

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    quiet = rng.randn(1, 4096).astype(np.float32) * 0.01
    loud = rng.randn(1, 4096).astype(np.float32) * 10.0
    batch = jnp.asarray(np.concatenate([quiet, loud], axis=0))

    for module in (MelSpec(sample_rate=16000, hop_length=512, n_mels=48),
                   STFT(sample_rate=16000, hop_length=512, n_fft=1024)):
        batched = np.asarray(module.process_jax(batch))
        alone = np.asarray(module.process_jax(jnp.asarray(quiet[0])))

        np.testing.assert_array_equal(batched[0], alone)
