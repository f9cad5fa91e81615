"""Frame-level signal power features.

Parity with the reference's ``features/power.py:12-72``.
"""

import numpy as np
import jax.numpy as jnp

from ..ops import spectral
from .waveform import WaveformWrapper


class SignalPower(WaveformWrapper):
    """Mean squared signal power per frame -> (T,)."""

    def __init__(self, sample_rate=44100, hop_length=512, decibels=True,
                 win_length=None, center=True):
        super().__init__(sample_rate=sample_rate, hop_length=hop_length,
                         decibels=decibels, win_length=win_length, center=center)

    def process_jax(self, audio):
        # (..., W, T) framed audio from the waveform wrapper
        frames = super().process_jax(audio)

        powers = jnp.sum(jnp.square(frames), axis=-2) / self.win_length

        if self.decibels:
            # (..., T) power curves: per-track (trailing-axis) dB reference
            powers = spectral.amplitude_to_db(powers, sample_ndim=1)

        return powers

    def get_null_features(self):
        return np.zeros((0,), dtype=np.float32)

    def get_feature_size(self):
        return 1
