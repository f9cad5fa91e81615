"""Magnitude spectrogram features.

Parity with the reference's ``features/stft.py:11-91``. Two device paths:
the XLA FFT over framed audio, and (on TPU, ``use_pallas='auto'``) the
fused Pallas framing + windowed-DFT contraction (``ops.pallas_stft``),
which skips the HBM frame matrix entirely and runs on the MXU — measured
~3x faster at exact (bf16x3) precision on v5e.
"""

import jax.numpy as jnp

from ..ops import spectral
from .waveform import WaveformWrapper


class STFT(WaveformWrapper):
    """Short-time Fourier transform magnitude features -> (1, n_fft//2+1, T)."""

    def __init__(self, sample_rate=16000, hop_length=512, decibels=True,
                 win_length=None, center=True, n_fft=2048, use_pallas='auto'):
        self.n_fft = n_fft

        if win_length is None:
            win_length = n_fft

        super().__init__(sample_rate=sample_rate, hop_length=hop_length,
                         decibels=decibels, win_length=win_length, center=center)

        # Precompute the analysis window once (host)
        self._window = spectral.hann_window(self.win_length)

        self.use_pallas = use_pallas
        self._pallas_interpret = False  # tests flip this to run on CPU
        self._dft_halves = None         # lazily built + split DFT bank

    def _pallas_enabled(self):
        """Whether to use the fused Pallas STFT kernel."""

        from ..ops.pallas_stft import pallas_stft_supported

        if self.use_pallas == 'auto':
            return pallas_stft_supported(self.n_fft, self.hop_length)

        return bool(self.use_pallas)

    def _stft_power_jax(self, audio):
        """(..., N) audio -> (..., n_fft//2+1, T) power spectrogram."""

        audio = jnp.asarray(audio)

        if self._pallas_enabled():
            from ..ops.pallas_stft import split_bank_bf16, stft_power_pallas

            if self._dft_halves is None:
                bank = spectral.dft_bank(self.n_fft, self.win_length,
                                         self._window)
                self._dft_halves = split_bank_bf16(bank)

            hi, lo = self._dft_halves
            call = (lambda a: stft_power_pallas(
                a, hi, lo, self.n_fft, self.hop_length, center=self.center,
                interpret=self._pallas_interpret))

            if audio.ndim <= 2:
                # The kernel batches clips natively (clip-blocked grid) —
                # vmapping instead would re-stream the DFT bank slabs per
                # clip (61 GB of HBM traffic at batch 128)
                return call(audio)

            lead = audio.shape[:-1]
            power = call(audio.reshape((-1, audio.shape[-1])))

            return power.reshape(lead + power.shape[1:])

        spec = spectral.stft_mag(audio, n_fft=self.n_fft,
                                 hop_length=self.hop_length,
                                 win_length=self.win_length,
                                 center=self.center, window=self._window)

        return jnp.square(spec)

    def process_jax(self, audio):
        if self._pallas_enabled():
            spec = jnp.sqrt(self._stft_power_jax(audio))
        else:
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
