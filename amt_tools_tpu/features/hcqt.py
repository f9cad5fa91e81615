"""Harmonic CQT/VQT: a stack of transforms at harmonic multiples of fmin.

Parity with the reference's ``features/hvqt.py:12-183`` / ``features/hcqt.py``
(DeepSalience harmonics [0.5, 1, 2, 3, 4, 5], one feature channel per
harmonic). Because every VQT here shares the uniform hop algebra, all
harmonics produce identical frame counts — no per-harmonic frame cutoff
bookkeeping is needed.
"""

import numpy as np
import jax.numpy as jnp

from ..tools.instrument import note_to_midi, midi_to_hz
from .common import FeatureModule
from .cqt import VQT


class HVQT(FeatureModule):
    """Harmonic VQT -> (H, n_bins, T)."""

    def __init__(self, sample_rate=22050, hop_length=512, decibels=True,
                 fmin=None, harmonics=None, n_bins=84, bins_per_octave=12,
                 gamma=None, frame_chunk=256):
        if fmin is None:
            fmin = float(midi_to_hz(note_to_midi('C1')))
        self.fmin = fmin

        if harmonics is None:
            harmonics = [0.5, 1, 2, 3, 4, 5]
        self.harmonics = sorted(harmonics)

        super().__init__(sample_rate, hop_length, len(self.harmonics), decibels)

        self.n_bins = n_bins
        self.bins_per_octave = bins_per_octave

        # One VQT module per harmonic
        self.modules = [VQT(sample_rate=sample_rate, hop_length=hop_length,
                            decibels=decibels, fmin=h * fmin, n_bins=n_bins,
                            bins_per_octave=bins_per_octave, gamma=gamma,
                            frame_chunk=frame_chunk)
                        for h in self.harmonics]

    def process_jax(self, audio):
        audio = jnp.asarray(audio)

        # Each harmonic returns (..., 1, F, T); concatenate on the channel axis
        feats = [module.process_jax(audio) for module in self.modules]

        return jnp.concatenate(feats, axis=-3)

    def get_times(self, audio, at_start=False):
        return self.modules[0].get_times(audio, at_start)

    def get_feature_size(self):
        return self.n_bins


class HCQT(HVQT):
    """Harmonic CQT: an HVQT with gamma = 0."""

    def __init__(self, sample_rate=22050, hop_length=512, decibels=True,
                 fmin=None, harmonics=None, n_bins=84, bins_per_octave=12,
                 frame_chunk=256):
        super().__init__(sample_rate=sample_rate, hop_length=hop_length,
                         decibels=decibels, fmin=fmin, harmonics=harmonics,
                         n_bins=n_bins, bins_per_octave=bins_per_octave,
                         gamma=0.0, frame_chunk=frame_chunk)
