"""Feature extraction module base class.

Carries the frame-count algebra contract the datasets rely on
(``get_expected_frames`` / ``get_sample_range``, reference
``features/common.py:41-112``) and the dB post-processing that maps
[-80, 0] dB onto [0, 1] (``features/common.py:203-230``).

TPU-first design: every concrete module implements ``process_jax`` — a pure
jnp function over (..., N) audio that is jit/vmap-safe and batchable, so
feature extraction can live *inside* the compiled training/inference graph.
``process_audio`` is the host-side convenience wrapper (numpy in/out) used
for dataset caching. All transforms in this package share the canonical
uniform frame algebra T = 1 + N // hop (the direct-matmul CQT/VQT makes this
possible; the reference needs per-transform overrides for librosa's
early-downsampling, ``features/vqt.py:102-165``).
"""

from abc import abstractmethod

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import spectral


class FeatureModule(object):
    """Generic music feature extraction module."""

    def __init__(self, sample_rate, hop_length, num_channels, decibels=True):
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.num_channels = num_channels
        self.decibels = decibels

    ##############################
    # Frame-count algebra        #
    ##############################

    def get_expected_frames(self, audio):
        """Number of frames produced for a piece of audio (or sample count)."""

        num_samples = audio if np.isscalar(audio) else np.asarray(audio).shape[-1]

        if num_samples == 0:
            return 0

        return 1 + num_samples // self.hop_length

    def get_sample_range(self, num_frames):
        """Audio lengths (in samples) that produce exactly ``num_frames``."""

        if num_frames <= 0:
            return np.array([0])

        max_samples = num_frames * self.hop_length - 1
        min_samples = max(1, max_samples - self.hop_length + 1)

        return np.arange(min_samples, max_samples + 1)

    def get_num_samples_required(self):
        """Number of samples required to extract one full frame of features."""

        return self.get_sample_range(1)[-1]

    @staticmethod
    def divisor_pad(audio, divisor):
        """Zero-pad audio so its length is divisible by ``divisor``."""

        pad_amt = divisor - (audio.shape[-1] % divisor)

        if 0 < pad_amt < divisor:
            audio = np.append(audio, np.zeros(pad_amt, dtype=np.float32), axis=-1)

        return audio

    def frame_pad(self, audio):
        """Zero-pad audio to fill out the final frame."""

        divisor = self.get_num_samples_required()

        if audio.shape[-1] > divisor:
            divisor = self.hop_length

        return self.divisor_pad(audio, divisor)

    ##############################
    # Processing                 #
    ##############################

    @abstractmethod
    def process_jax(self, audio):
        """Pure jnp feature transform: (..., N) audio -> (..., C, F, T)."""

        raise NotImplementedError

    def process_audio(self, audio):
        """Host entry point: numpy audio in, numpy features out.

        Runs ``process_jax`` under ``jax.jit`` — the eager path dispatches
        every op separately, which through a remote-attached device costs
        a round trip per op (measured 2.5 s per 24-s track vs ~0.2 s
        jitted). Audio is zero-padded to a coarse length bucket (3
        significant bits, >= 16384 samples) so variable-length corpora
        compile O(log N) graphs instead of one per distinct length, then
        the feature frames are trimmed to the true count. Trailing zeros
        are exactly what every frame past the audio's end already sees
        (center padding), so the kept frames are identical to an unpadded
        run's — including dB normalization, whose per-track max cannot
        come from silent padding.
        """

        audio = np.asarray(audio, dtype=np.float32)

        num_samples = audio.shape[-1]
        if num_samples == 0:
            return self.get_null_features()

        num_frames = self.get_expected_frames(audio)

        padded = self._bucketed_samples(num_samples)
        if padded != num_samples:
            pad = [(0, 0)] * (audio.ndim - 1) + [(0, padded - num_samples)]
            audio = np.pad(audio, pad)

        if not hasattr(self, '_jit_process'):
            self._jit_process = jax.jit(self.process_jax)

        feats = self._jit_process(jnp.asarray(audio))

        return np.asarray(feats[..., :num_frames])

    @staticmethod
    def _bucketed_samples(num_samples):
        """Next length keeping 3 significant bits (>= 16384 samples)."""

        floor = 1 << 14
        if num_samples <= floor:
            return floor

        quantum = max(floor, 1 << (int(num_samples).bit_length() - 3))

        return -(-num_samples // quantum) * quantum

    def get_null_features(self):
        """Features for empty audio: a zero-frame array of the right shape."""

        return np.zeros((self.get_num_channels(), self.get_feature_size(), 0),
                        dtype=np.float32)

    def to_decibels(self, feats):
        """Convert amplitude features to dB relative to their maximum.

        Per-track maximum: leading axes of the (..., F, T) input are
        independent clips, normalized separately (the reference computes
        features one track at a time, so its ``ref=np.max`` is per-track).
        """

        return spectral.amplitude_to_db(feats, sample_ndim=2)

    def post_proc(self, feats):
        """dB scaling into [0, 1] and channel-dim insertion (jnp)."""

        if self.decibels:
            feats = self.to_decibels(feats)
            # Assuming a range of -80 to 0 dB, scale between 0 and 1.
            # The clip pins the documented range exactly: fused lowerings
            # of (db / 80 + 1) can round the -80 dB floor to -1e-8.
            feats = jnp.clip(feats / 80.0 + 1.0, 0.0, 1.0)

        # Add a channel dimension before F
        return jnp.expand_dims(feats, axis=-3)

    ##############################
    # Metadata                   #
    ##############################

    def get_times(self, audio):
        """Time (seconds) of the start of each frame."""

        num_frames = self.get_expected_frames(audio)

        return np.arange(num_frames) * self.hop_length / self.sample_rate

    def get_sample_rate(self):
        return self.sample_rate

    def get_hop_length(self):
        return self.hop_length

    def get_num_channels(self):
        return self.num_channels

    @abstractmethod
    def get_feature_size(self):
        """Dimensionality along the feature (frequency) axis."""

        raise NotImplementedError

    @classmethod
    def features_name(cls):
        """Class-name tag used e.g. as the on-disk feature cache directory."""

        return cls.__name__
