"""Tests for native WAV loading, normalization, and resampling."""

import numpy as np

from amt_tools_tpu.tools import io as io_mod
from amt_tools_tpu.tools import utils


def _sine(fs, freq, dur):
    t = np.arange(int(fs * dur)) / fs
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    fs = 16000
    audio = 0.5 * _sine(fs, 440, 0.25)
    path = str(tmp_path / 'test.wav')
    io_mod.write_wav(path, audio, fs)

    loaded, loaded_fs = io_mod.load_audio(path)
    assert loaded_fs == fs
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, audio, atol=1e-3)


def test_load_audio_resample(tmp_path):
    fs = 44100
    audio = 0.5 * _sine(fs, 440, 0.5)
    path = str(tmp_path / 'test44k.wav')
    io_mod.write_wav(path, audio, fs)

    loaded, loaded_fs = io_mod.load_audio(path, fs=22050)
    assert loaded_fs == 22050
    # Length halves (within a sample)
    assert abs(len(loaded) - len(audio) // 2) <= 1
    # Should still be a 440 Hz sine: check dominant frequency
    spectrum = np.abs(np.fft.rfft(loaded))
    peak_freq = np.argmax(spectrum) * 22050 / len(loaded)
    assert abs(peak_freq - 440) < 5


def test_rms_normalization(tmp_path):
    fs = 8000
    audio = 0.1 * _sine(fs, 100, 0.5)
    path = str(tmp_path / 'quiet.wav')
    io_mod.write_wav(path, audio, fs)

    normalized, _ = io_mod.load_normalize_audio(path, norm=-1)
    rms = np.sqrt(np.mean(normalized.astype(np.float64) ** 2))
    assert abs(rms - 1.0) < 1e-3


def test_file_sort():
    names = ['model-1500', 'model-500', 'model-50']
    ordered = sorted(names, key=io_mod.file_sort)
    assert ordered == ['model-50', 'model-500', 'model-1500']
