"""Onsets & Frames transcription models (V1/V2) in flax.

Re-designs the reference's ``amt_tools/models/onsetsframes.py`` for TPU:

- ``AcousticModel`` (reference ``:330-463``): the Kelz-style conv stack in
  NHWC layout with flax BatchNorm/Dropout.
- ``LanguageModel`` (reference ``:466-575``): a bidirectional LSTM as two
  ``lax.scan`` passes (flax ``nn.RNN``). The reference's 512-frame chunked
  evaluation with carried state exists only to bound PyTorch's LSTM memory;
  a scanned LSTM has O(1) activation memory per step under ``jax.checkpoint``
  semantics, so evaluation always uses the exact full-sequence recurrence
  (documented divergence: no chunk-boundary artifacts).
- ``OnlineLanguageModel`` (reference ``:578-659``): unidirectional LSTM with
  an explicit carry threaded through calls (functional streaming state).
- ``OnsetsFrames`` / ``OnsetsFrames2`` (reference ``:17-196`` / ``:199-327``):
  onset (+offset) heads feeding a refined multi-pitch head, with optional
  gradient detachment between heads.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import tools
from ..ops.lstm import FastLSTM, FastBiLSTM
from .common import TranscriptionModel, LogisticBank, RegressionBank

__all__ = [
    'OnsetsFrames',
    'OnsetsFrames2',
    'OnsetsFramesOnline',
    'AcousticModel',
    'LanguageModel',
    'OnlineLanguageModel',
]


class AcousticModel(nn.Module):
    """Kelz-style convolutional acoustic model.

    Input (B, T, F, C) NHWC features; output (B, T, dim_out) embeddings.
    Three 3x3 conv+BN+ReLU blocks with two 1x2 max-pools over frequency
    (F -> F/4), dropouts 0.25/0.25, then a dense projection with dropout 0.5.
    """

    dim_in: int
    dim_out: int
    in_channels: int = 1
    model_complexity: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train=False, lengths=None):
        nf1 = 16 * self.model_complexity
        nf3 = 32 * self.model_complexity

        if lengths is None:
            frame_mask = None
        else:
            # Zero padded frames after every block so convolutions at the
            # valid/padded boundary see exactly the implicit SAME zero
            # padding of an unpadded run (BatchNorm would otherwise shift
            # padded zeros to non-zero values) — bucketed eval stays exact
            from ..ops.lstm import lengths_to_mask
            frame_mask = lengths_to_mask(lengths, feats.shape[1])
            frame_mask = frame_mask[:, :, None, None].astype(feats.dtype)

        def masked(x):
            return x if frame_mask is None else x * frame_mask

        x = masked(feats)

        # Block 1: conv + BN + ReLU
        x = nn.Conv(nf1, (3, 3), padding='SAME', dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = masked(nn.relu(x))

        # Block 2: conv + BN + ReLU + 1x2 pool + dropout
        x = nn.Conv(nf1, (3, 3), padding='SAME', dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = masked(nn.Dropout(0.25, deterministic=not train)(x))

        # Block 3: conv + BN + ReLU + 1x2 pool + dropout
        x = nn.Conv(nf3, (3, 3), padding='SAME', dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = masked(nn.Dropout(0.25, deterministic=not train)(x))

        # (B, T, F/4, nf3) -> (B, T, F/4 * nf3)
        x = x.reshape(x.shape[:-2] + (-1,))

        x = nn.Dense(self.dim_out, dtype=self.dtype)(x)
        x = nn.Dropout(0.50, deterministic=not train)(x)

        return x


class LanguageModel(nn.Module):
    """LSTM language model refining features over time.

    (B, T, dim_in) -> (B, T, dim_out); bidirectional by default with
    ``dim_out // 2`` hidden units per direction (reference ``:466-503``).
    """

    dim_in: int
    dim_out: int
    bidirectional: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train=False, lengths=None):
        hidden = self.dim_out // (2 if self.bidirectional else 1)

        # TPU-optimized scan LSTM with hoisted input projections (ops/lstm.py)
        if self.bidirectional:
            return FastBiLSTM(features=hidden, dtype=self.dtype)(feats,
                                                                 lengths=lengths)

        return FastLSTM(features=hidden, dtype=self.dtype)(feats, lengths=lengths)


class OnlineLanguageModel(nn.Module):
    """Unidirectional LSTM with explicit streaming carry.

    Functional analog of the reference's stateful online LSTM (``:578-659``):
    the hidden/cell state is passed in and returned instead of mutating the
    module, so streaming state lives in the caller (see ``inference.py``).
    """

    dim_in: int
    dim_out: int

    @nn.nowrap
    def init_carry(self, batch_size):
        """Zero (cell, hidden) carry for a new stream."""

        return (jnp.zeros((batch_size, self.dim_out)),
                jnp.zeros((batch_size, self.dim_out)))

    @nn.compact
    def __call__(self, feats, carry=None, train=False):
        rnn = FastLSTM(features=self.dim_out)

        if carry is None:
            # Whole-sequence (training) path
            return rnn(feats), None

        new_carry, out = rnn(feats, initial_carry=carry, return_carry=True)

        return out, new_carry


def _acoustic_model_cls(remat):
    """AcousticModel, optionally wrapped in gradient rematerialization."""

    if remat:
        return nn.remat(AcousticModel, static_argnums=(2, 3))

    return AcousticModel


class _Heads:
    """Lightweight param-free output-layer handles for post-processing.

    ``get_loss`` / ``finalize_output`` on the output layers are pure
    functions, so fresh instances outside ``apply`` are equivalent to the
    submodules used in the forward pass.
    """

    @staticmethod
    def logistic(dim_in, dim_out):
        return LogisticBank(dim_in=dim_in, dim_out=dim_out)


class OnsetsFrames(TranscriptionModel):
    """Onsets & Frames (V1), arXiv:1710.11153 (reference ``:17-196``).

    Heads: onset = AM -> LM -> logistic; pitch = AM -> logistic;
    refined pitch = LM -> logistic over concat(onsets, pitch).
    """

    model_complexity: int = 2
    detach_heads: bool = False

    @property
    def dim_am(self):
        return 256 * self.model_complexity

    @property
    def dim_lm(self):
        return 256 * (self.model_complexity - 1)

    @property
    def dim_out(self):
        return self.profile.get_range_len()

    @property
    def dim_aj(self):
        """Input width of the refinement stage (onsets + pitch)."""

        return 2 * self.dim_out

    @nn.nowrap
    def pre_proc(self, batch):
        """(B, C, F, T) features -> (B, T, F, C) NHWC."""

        batch = dict(batch)
        feats = jnp.asarray(batch[tools.KEY_FEATS])
        batch[tools.KEY_FEATS] = jnp.transpose(feats, (0, 3, 2, 1))

        return batch

    def setup(self):
        if self.model_complexity < 2:
            raise ValueError('OnsetsFrames requires model_complexity >= 2 '
                             '(the language-model width is 256 * (complexity - 1)).')

        AcousticModel = _acoustic_model_cls(self.remat)

        self.onset_am = AcousticModel(self.dim_in, self.dim_am,
                                      self.in_channels, self.model_complexity,
                                      dtype=self.dtype)
        self.onset_lm = LanguageModel(self.dim_am, self.dim_lm, dtype=self.dtype)
        self.onset_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out)

        self.pitch_am = AcousticModel(self.dim_in, self.dim_am,
                                      self.in_channels, self.model_complexity,
                                      dtype=self.dtype)
        self.pitch_out = LogisticBank(dim_in=self.dim_am, dim_out=self.dim_out)

        self.adjoin_lm = LanguageModel(self.dim_aj, self.dim_lm, dtype=self.dtype)
        self.adjoin_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out)

    def __call__(self, feats, train=False, lengths=None):
        output = {}

        # Initial multi-pitch estimate
        multi_pitch = self.pitch_out(self.pitch_am(feats, train, lengths))

        # Onset estimate (lengths mask makes bucketed padded eval exact)
        onsets = self.onset_out(self.onset_lm(self.onset_am(feats, train, lengths),
                                              train, lengths=lengths))
        output[tools.KEY_ONSETS] = onsets

        if self.detach_heads:
            onsets = jax.lax.stop_gradient(onsets)

        # Refined multi-pitch estimate over the joint activations
        joint = jnp.concatenate((onsets, multi_pitch), axis=-1)
        output[tools.KEY_MULTIPITCH] = self.adjoin_out(
            self.adjoin_lm(joint, train, lengths=lengths))

        return output

    @nn.nowrap
    def post_proc(self, batch):
        """Loss (pitch BCE + onset BCE) and finalized predictions."""

        output = dict(batch[tools.KEY_OUTPUT])

        head = _Heads.logistic(self.dim_lm, self.dim_out)

        onsets_est = output[tools.KEY_ONSETS]
        multi_pitch_est = output[tools.KEY_MULTIPITCH]

        if tools.KEY_MULTIPITCH in batch:
            loss = {}

            multi_pitch_ref = batch[tools.KEY_MULTIPITCH]
            loss[tools.KEY_LOSS_PITCH] = head.get_loss(multi_pitch_est, multi_pitch_ref)

            if tools.KEY_ONSETS in batch:
                onsets_ref = batch[tools.KEY_ONSETS]
            else:
                # Derive onset labels from the reference multi-pitch
                from ..ops import decode
                onsets_ref = decode.multi_pitch_to_onsets(multi_pitch_ref)

            loss[tools.KEY_LOSS_ONSETS] = head.get_loss(onsets_est, onsets_ref)

            loss[tools.KEY_LOSS_TOTAL] = (loss[tools.KEY_LOSS_PITCH] +
                                          loss[tools.KEY_LOSS_ONSETS])
            output[tools.KEY_LOSS] = loss

        output[tools.KEY_ONSETS] = head.finalize_output(onsets_est, 0.5)
        output[tools.KEY_MULTIPITCH] = head.finalize_output(multi_pitch_est, 0.5)

        return output


class OnsetsFrames2(OnsetsFrames):
    """Onsets & Frames (V2), arXiv:1810.12247 (reference ``:199-327``).

    Adds an offset head; the refinement stage consumes onsets, offsets, and
    the initial pitch estimate. With ``estimate_velocity``, a dedicated
    acoustic stack regresses per-pitch note velocities (the O&F2 paper's
    velocity prediction — left as a TODO in the reference at
    ``models/onsetsframes.py:13``), trained with MSE at onset locations
    only and decoded into a (B, O, T) velocity map in [0, 1].
    """

    model_complexity: int = 3
    detach_heads: bool = True
    estimate_velocity: bool = False

    @property
    def dim_aj(self):
        """Refinement consumes onsets + offsets + pitch."""

        return 3 * self.dim_out

    def setup(self):
        super().setup()

        AcousticModel = _acoustic_model_cls(self.remat)

        self.offset_am = AcousticModel(self.dim_in, self.dim_am,
                                       self.in_channels, self.model_complexity,
                                       dtype=self.dtype)
        self.offset_lm = LanguageModel(self.dim_am, self.dim_lm, dtype=self.dtype)
        self.offset_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out)

        if self.estimate_velocity:
            self.velocity_am = AcousticModel(self.dim_in, self.dim_am,
                                             self.in_channels,
                                             self.model_complexity,
                                             dtype=self.dtype)
            self.velocity_out = RegressionBank(dim_in=self.dim_am,
                                               dim_out=self.dim_out)

    def __call__(self, feats, train=False, lengths=None):
        output = {}

        multi_pitch = self.pitch_out(self.pitch_am(feats, train, lengths))

        onsets = self.onset_out(self.onset_lm(self.onset_am(feats, train, lengths),
                                              train, lengths=lengths))
        output[tools.KEY_ONSETS] = onsets

        offsets = self.offset_out(self.offset_lm(self.offset_am(feats, train, lengths),
                                                 train, lengths=lengths))
        output[tools.KEY_OFFSETS] = offsets

        if self.estimate_velocity:
            output[tools.KEY_VELOCITY] = self.velocity_out(
                self.velocity_am(feats, train, lengths))

        if self.detach_heads:
            onsets = jax.lax.stop_gradient(onsets)
            offsets = jax.lax.stop_gradient(offsets)

        joint = jnp.concatenate((onsets, offsets, multi_pitch), axis=-1)
        output[tools.KEY_MULTIPITCH] = self.adjoin_out(
            self.adjoin_lm(joint, train, lengths=lengths))

        return output

    @nn.nowrap
    def post_proc(self, batch):
        output = super().post_proc(batch)

        head = _Heads.logistic(self.dim_lm, self.dim_out)

        offsets_est = output[tools.KEY_OFFSETS]

        if tools.KEY_LOSS in output:
            if tools.KEY_OFFSETS in batch:
                offsets_ref = batch[tools.KEY_OFFSETS]
            else:
                from ..ops import decode
                offsets_ref = decode.multi_pitch_to_offsets(batch[tools.KEY_MULTIPITCH])

            loss = output[tools.KEY_LOSS]
            loss[tools.KEY_LOSS_OFFSETS] = head.get_loss(offsets_est, offsets_ref)
            loss[tools.KEY_LOSS_TOTAL] = (loss[tools.KEY_LOSS_TOTAL] +
                                          loss[tools.KEY_LOSS_OFFSETS])
            output[tools.KEY_LOSS] = loss

        output[tools.KEY_OFFSETS] = head.finalize_output(offsets_est)

        if self.estimate_velocity and tools.KEY_VELOCITY in output:
            velocity_est = output[tools.KEY_VELOCITY]
            velocity_head = RegressionBank(dim_in=self.dim_am,
                                           dim_out=self.dim_out)

            if tools.KEY_LOSS in output and tools.KEY_VELOCITY not in batch:
                # Loud, not silent: a stale ground-truth cache written before
                # velocity support (or a dataset without velocities) would
                # otherwise leave the head untrained with no indication —
                # regenerate caches with reset_data=True
                import warnings
                warnings.warn('estimate_velocity=True but the batch carries '
                              'no velocity ground truth; the velocity head '
                              'receives no loss. Stale dataset caches need '
                              'reset_data=True.', category=RuntimeWarning)

            if tools.KEY_LOSS in output and tools.KEY_VELOCITY in batch:
                # MSE over every cell carrying a velocity target — the full
                # note spans. (The O&F2 paper uses onset locations only;
                # velocity is constant across a note's span so the optimum
                # is the same, and spans carry ~30x more signal per crop.)
                velocity_ref = batch[tools.KEY_VELOCITY]
                mask = (velocity_ref > 0).astype(jnp.float32)

                loss = output[tools.KEY_LOSS]
                loss[tools.KEY_LOSS_VELOCITY] = velocity_head.get_loss(
                    velocity_est, velocity_ref, mask)
                loss[tools.KEY_LOSS_TOTAL] = (loss[tools.KEY_LOSS_TOTAL] +
                                              loss[tools.KEY_LOSS_VELOCITY])
                output[tools.KEY_LOSS] = loss

            output[tools.KEY_VELOCITY] = velocity_head.finalize_output(velocity_est)

        return output


class OnsetsFramesOnline(OnsetsFrames):
    """Streaming Onsets & Frames: unidirectional LSTMs with explicit carries.

    Functional analog of the reference's online variant (swapping
    ``LanguageModel`` for the stateful ``OnlineLanguageModel``): the forward
    pass accepts and returns a carry dictionary so frames can be fed one at
    a time with full recurrent context (see ``inference.run_online_stateful``).
    Called without carries, it behaves as a whole-sequence unidirectional
    model (the training path).
    """

    def setup(self):
        if self.model_complexity < 2:
            raise ValueError('OnsetsFramesOnline requires model_complexity >= 2.')

        AcousticModel = _acoustic_model_cls(self.remat)

        self.onset_am = AcousticModel(self.dim_in, self.dim_am,
                                      self.in_channels, self.model_complexity)
        self.onset_lm = OnlineLanguageModel(self.dim_am, self.dim_lm)
        self.onset_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out)

        self.pitch_am = AcousticModel(self.dim_in, self.dim_am,
                                      self.in_channels, self.model_complexity)
        self.pitch_out = LogisticBank(dim_in=self.dim_am, dim_out=self.dim_out)

        self.adjoin_lm = OnlineLanguageModel(self.dim_aj, self.dim_lm)
        self.adjoin_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out)

    @nn.nowrap
    def init_carries(self, batch_size):
        """Zero streaming state for both recurrent stages."""

        zeros_lm = (jnp.zeros((batch_size, self.dim_lm)),
                    jnp.zeros((batch_size, self.dim_lm)))

        return {'onset': zeros_lm, 'adjoin': (jnp.zeros((batch_size, self.dim_lm)),
                                              jnp.zeros((batch_size, self.dim_lm)))}

    def __call__(self, feats, train=False, carries=None, lengths=None):
        output = {}

        multi_pitch = self.pitch_out(self.pitch_am(feats, train, lengths))

        onset_feats, onset_carry = self.onset_lm(
            self.onset_am(feats, train, lengths),
            carry=None if carries is None else carries['onset'])
        onsets = self.onset_out(onset_feats)
        output[tools.KEY_ONSETS] = onsets

        if self.detach_heads:
            onsets = jax.lax.stop_gradient(onsets)

        joint = jnp.concatenate((onsets, multi_pitch), axis=-1)
        adjoin_feats, adjoin_carry = self.adjoin_lm(
            joint, carry=None if carries is None else carries['adjoin'])
        output[tools.KEY_MULTIPITCH] = self.adjoin_out(adjoin_feats)

        if carries is None:
            return output

        return output, {'onset': onset_carry, 'adjoin': adjoin_carry}
