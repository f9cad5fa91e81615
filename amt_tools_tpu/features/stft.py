"""Magnitude spectrogram features (XLA FFT over framed audio).

Parity with the reference's ``features/stft.py:11-91``.
"""

import jax.numpy as jnp

from ..ops import spectral
from .waveform import WaveformWrapper


class STFT(WaveformWrapper):
    """Short-time Fourier transform magnitude features -> (1, n_fft//2+1, T)."""

    def __init__(self, sample_rate=16000, hop_length=512, decibels=True,
                 win_length=None, center=True, n_fft=2048):
        self.n_fft = n_fft

        if win_length is None:
            win_length = n_fft

        super().__init__(sample_rate=sample_rate, hop_length=hop_length,
                         decibels=decibels, win_length=win_length, center=center)

        # Precompute the analysis window once (host)
        self._window = spectral.hann_window(self.win_length)

    def process_jax(self, audio):
        spec = spectral.stft_mag(jnp.asarray(audio), n_fft=self.n_fft,
                                 hop_length=self.hop_length,
                                 win_length=self.win_length,
                                 center=self.center, window=self._window)

        return self.post_proc(spec)

    def get_null_features(self):
        import numpy as np

        return np.zeros((self.get_num_channels(), self.get_feature_size(), 0),
                        dtype=np.float32)

    def get_feature_size(self):
        return self.n_fft // 2 + 1
