"""Mel spectrogram features: |STFT|^2 contracted against a precomputed mel
filterbank (one MXU matmul).

Parity with the reference's ``features/mel.py:11-110`` (Slaney mel scale with
an HTK option; power-dB post-processing; n_mels=229 Onsets & Frames default).
"""

import jax.numpy as jnp

from ..ops import spectral
from .stft import STFT


class MelSpec(STFT):
    """Mel spectrogram features -> (1, n_mels, T)."""

    def __init__(self, sample_rate=16000, hop_length=512, decibels=True,
                 n_mels=229, n_fft=2048, win_length=None, center=True,
                 htk=False, use_pallas='auto'):
        super().__init__(sample_rate=sample_rate, hop_length=hop_length,
                         decibels=decibels, win_length=win_length,
                         center=center, n_fft=n_fft, use_pallas=use_pallas)

        self.n_mels = n_mels
        self.htk = htk

        # Precompute the filterbank once (host); (n_mels, n_fft//2+1)
        self._mel_fb = spectral.mel_filterbank(sample_rate, n_fft,
                                               n_mels=n_mels, htk=htk)

    def process_jax(self, audio):
        # Power spectrogram — fused Pallas framing+DFT on TPU, XLA FFT
        # otherwise (STFT._stft_power_jax)
        power = self._stft_power_jax(audio)

        # Power mel: filterbank applied to the power spectrogram
        mel = jnp.einsum('mf,...ft->...mt', jnp.asarray(self._mel_fb), power)

        return self.post_proc(mel)

    def to_decibels(self, feats):
        """Mel features are powers: use power-dB scaling (per-track max)."""

        return spectral.power_to_db(feats, sample_ndim=2)

    def get_feature_size(self):
        return self.n_mels
