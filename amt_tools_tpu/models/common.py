"""Transcription model base classes and output layers (flax linen).

Re-designs the contracts of the reference's ``amt_tools/models/common.py``
for JAX:

- ``TranscriptionModel`` (reference ``models/common.py:18-199``) keeps the
  ``pre_proc -> forward -> post_proc`` pipeline, but as pure functions over
  pytrees: parameters live in flax variable collections, the step counter
  lives in the train state, and device placement is a sharding concern
  (``parallel/``) instead of a ``change_device`` method.
- ``OutputLayer`` / ``SoftmaxGroups`` / ``LogisticBank`` (reference
  ``models/common.py:202-620``) are linen modules whose ``get_loss`` /
  ``finalize_output`` are parameter-free pure jnp functions, so they can be
  called inside or outside ``jit`` and differentiate cleanly.

Layout note: features flow through models as NHWC (batch, time, freq,
channel) — the TPU-native convolution layout — rather than the reference's
NCHW.
"""

from abc import abstractmethod
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .. import tools

__all__ = [
    'TranscriptionModel',
    'OutputLayer',
    'SoftmaxGroups',
    'LogisticBank',
    'RegressionBank',
    'run_on_batch',
]


class TranscriptionModel(nn.Module):
    """Base class for music transcription models.

    Attributes mirror the reference's constructor arguments
    (``models/common.py:23-57``): input feature dimensionality, instrument
    profile, channel count, complexity scaling, and frame width (number of
    feature frames consumed per prediction).
    """

    dim_in: int
    profile: Any
    in_channels: int = 1
    model_complexity: int = 1
    frame_width: int = 1
    # Computation dtype (params stay float32); jnp.bfloat16 doubles MXU
    # throughput on TPU for inference/training with f32 loss accumulation
    dtype: Any = None
    # Rematerialize the acoustic stacks in the backward pass (jax.checkpoint):
    # trades recompute for activation memory on long training crops.
    # True checkpoints each whole conv stack (measured speed winner at the
    # HBM-pressured batch sizes); 'blocks' checkpoints every conv block
    # separately — slower, but roughly halves temporary memory again for
    # long-crop/large-batch steps that do not fit otherwise (RESULTS.md).
    remat: Any = False
    # Serving-only: run the acoustic conv stacks as int8 MXU contractions
    # (ops.qconv.Int8Conv). False | True (per-sample dynamic activation
    # scales, no calibration, measured SLOWER end-to-end than bf16 on v5e)
    # | 'static' (calibrated per-layer scales from the 'quant_stats'
    # collection — fill via serving.calibrate_quant_stats; the fast mode).
    # Parameter tree and checkpoints are unchanged; do not train with this.
    quant_acoustic: Any = False
    # Serving-only: run the language models' hoisted input projections as
    # int8 MXU contractions (same False | True | 'static' modes). The
    # recurrent matmuls stay float (latency-bound; error would compound
    # through the recurrence). Parameter tree unchanged; do not train
    # with this.
    quant_lm: Any = False
    # Enable dropout layers in train mode. False trains deterministically
    # (BatchNorm still updates batch statistics) — used for reproducible
    # fine-tuning and for differential tests that step the reference
    # optimizer side by side (dropout noise is framework-specific).
    dropout: bool = True

    @nn.nowrap
    def pre_proc(self, batch):
        """Model-specific feature pre-processing (pure jnp, jit-safe).

        Default: pass features through unchanged. Batches are dictionaries
        of arrays (valid pytrees); features arrive as (B, C, F, T) from the
        feature modules.
        """

        return batch

    @abstractmethod
    def __call__(self, feats, train=False):
        """Main processing: features -> dict of raw (loss-friendly) outputs."""

        raise NotImplementedError

    @abstractmethod
    @nn.nowrap
    def post_proc(self, batch):
        """Compute losses (if ground truth is present) and finalize output.

        Takes the batch with ``tools.KEY_OUTPUT`` holding the raw forward
        results; returns the output dictionary with ``tools.KEY_LOSS`` (a
        dict of loss terms including ``KEY_LOSS_TOTAL``) and finalized
        predictions. Pure jnp — differentiable through the loss.
        """

        raise NotImplementedError

    @classmethod
    def model_name(cls):
        """Class-name tag for the model (used in logging/checkpoint paths)."""

        return cls.__name__


def run_on_batch(model, variables, batch, train=False, rngs=None):
    """Full pipeline on one batch: pre_proc -> forward -> post_proc.

    Functional analog of the reference's ``run_on_batch``
    (``models/common.py:151-184``). Returns ``(output, mutated_vars)`` where
    ``mutated_vars`` holds updated batch statistics when training (empty
    otherwise). Jit-safe; differentiable w.r.t. ``variables``.
    """

    batch = dict(batch)
    batch = model.pre_proc(batch)

    # Bucketed static-shape eval: thread valid-frame counts into models that
    # support masked recurrence
    extra = {}
    if tools.KEY_VALID_FRAMES in batch:
        import inspect
        if 'lengths' in inspect.signature(type(model).__call__).parameters:
            extra['lengths'] = batch[tools.KEY_VALID_FRAMES]

    mutable = ['batch_stats'] if train else []
    raw_output, mutated = model.apply(
        variables, batch[tools.KEY_FEATS], train=train,
        rngs=rngs, mutable=mutable, **extra)

    batch[tools.KEY_OUTPUT] = raw_output
    output = model.post_proc(batch)

    if tools.query_dict(batch, tools.KEY_TIMES):
        output[tools.KEY_TIMES] = batch[tools.KEY_TIMES]

    return output, mutated


class OutputLayer(nn.Module):
    """Generic output layer: a projection plus pure loss/decode functions."""

    dim_in: int
    dim_out: int
    weights: Optional[Any] = None
    # Computation dtype of the projection (params stay float32); losses
    # always accumulate in float32 regardless
    dtype: Optional[Any] = None

    @abstractmethod
    def __call__(self, feats):
        raise NotImplementedError

    @abstractmethod
    @nn.nowrap
    def get_loss(self, estimated, reference):
        raise NotImplementedError

    @nn.nowrap
    def finalize_output(self, raw_output):
        """Detach raw output from the gradient graph."""

        return jax.lax.stop_gradient(raw_output)


class SoftmaxGroups(OutputLayer):
    """Multi-group softmax head for tablature.

    Each degree of freedom (e.g. guitar string) is an independent softmax
    over ``num_classes`` (frets + silence). Semantics match the reference's
    ``models/common.py:305-483``: loss is per-group cross-entropy summed over
    groups, averaged over frames and batch; decoding is per-group argmax with
    the final class mapped to -1 (silence).
    """

    num_groups: int = 1
    num_classes: int = 1

    @nn.compact
    def __call__(self, feats):
        """(B, T, E) features -> (B, T, num_groups * num_classes) logits."""

        return nn.Dense(self.num_groups * self.num_classes,
                        dtype=self.dtype)(feats)

    @nn.nowrap
    def get_loss(self, estimated, reference):
        """CE loss: estimated (B, T, G*C) logits vs reference (B, G, T) tabs."""

        num_classes = self.num_classes

        # (B, G, T) -> (B, T, G), -1 (silence) -> final class index
        labels = jnp.swapaxes(reference, -1, -2).astype(jnp.int32)
        labels = jnp.where(labels == -1, num_classes - 1, labels)

        logits = estimated.reshape(estimated.shape[:-1] + (self.num_groups, num_classes))

        if self.weights is not None:
            weights = jnp.asarray(self.weights).reshape(self.num_groups, num_classes)
            per_label_w = jnp.take_along_axis(
                weights[None, None], labels[..., None], axis=-1)[..., 0]
        else:
            per_label_w = 1.0

        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels)
        loss = loss * per_label_w

        # Sum across degrees of freedom, average across frames, then batch
        loss = jnp.sum(loss, axis=-1)
        loss = jnp.mean(loss, axis=-1)

        return jnp.mean(loss)

    @nn.nowrap
    def finalize_output(self, raw_output, last_negative=True):
        """(B, T, G*C) logits -> (B, G, T) class indices (-1 = silence)."""

        out = super().finalize_output(raw_output)

        out = out.reshape(out.shape[:-1] + (self.num_groups, self.num_classes))
        out = jnp.argmax(out, axis=-1)

        if last_negative:
            out = jnp.where(out == self.num_classes - 1, -1, out)

        return jnp.swapaxes(out, -1, -2)


class LogisticBank(OutputLayer):
    """Multi-label logistic head for quantized pitch activity.

    Semantics match the reference's ``models/common.py:486-620``: per-key
    binary cross-entropy averaged over frames, summed over keys, averaged
    over batch; decoding is sigmoid (+ optional threshold), transposed to
    (B, O, T).

    The projection bias initializes to ``prior_logit`` (default -2.0, a
    sparse-activity prior a la RetinaNet): pitch/onset targets are mostly
    zero, so starting the sigmoids near 0.12 instead of 0.5 removes the
    initial wall of false positives and speeds early training.
    """

    prior_logit: float = -2.0

    @nn.compact
    def __call__(self, feats):
        """(B, T, E) features -> (B, T, dim_out) logits."""

        return nn.Dense(self.dim_out, dtype=self.dtype,
                        bias_init=nn.initializers.constant(self.prior_logit))(feats)

    @nn.nowrap
    def get_loss(self, estimated, reference):
        """BCE loss: estimated (B, T, O) logits vs reference (B, O, T)."""

        # (B, T, O) -> (B, O, T)
        logits = jnp.swapaxes(estimated, -1, -2).astype(jnp.float32)

        loss = optax.sigmoid_binary_cross_entropy(logits, reference.astype(jnp.float32))

        if self.weights is not None:
            loss = loss * jnp.asarray(self.weights)[..., None]

        # Average across frames, sum across keys, average across batch
        loss = jnp.mean(loss, axis=-1)
        loss = jnp.sum(loss, axis=-1)

        return jnp.mean(loss)

    @nn.nowrap
    def finalize_output(self, raw_output, threshold=None):
        """(B, T, O) logits -> (B, O, T) activations in [0, 1]."""

        out = super().finalize_output(raw_output)

        out = jax.nn.sigmoid(out)
        out = jnp.swapaxes(out, -1, -2)

        if threshold is not None:
            out = jnp.where(out >= threshold, 1.0, 0.0)

        return out


class RegressionBank(OutputLayer):
    """Per-key bounded regression head (e.g. note velocities in [0, 1]).

    New capability closing the reference's velocity TODO
    (``models/onsetsframes.py:13``; the O&F2 paper predicts per-pitch
    velocity): a sigmoid-squashed projection trained with masked MSE —
    the loss counts only cells the mask marks active (the paper computes
    velocity loss at onset locations only), so silent frames neither pull
    predictions toward zero nor dilute the gradient.

    The regression runs in the LOG (decibel) domain internally: spectral
    features are decibel-scaled, so they are LINEAR in log-velocity — a
    network asked for linear velocity must learn an exponential on top.
    Training in dB and exponentiating at the output removes that burden
    (measured on the synthetic domain: raw-feature/velocity correlation is
    0.90 in the log domain; the linear-target head plateaued at 0.43).
    External semantics are unchanged: references arrive and finalized
    outputs leave as linear [0, 1] velocities.

    ``floor_db`` sets the dynamic range: velocity 1.0 maps to 1.0 and
    ``10^(floor_db/20)`` (~0.03 at -30 dB) maps to 0.
    """

    floor_db: float = -30.0

    @nn.compact
    def __call__(self, feats):
        """(B, T, E) features -> (B, T, dim_out) raw regression logits."""

        return nn.Dense(self.dim_out, dtype=self.dtype)(feats)

    @nn.nowrap
    def to_log_domain(self, values):
        """Linear [0, 1] -> dB-normalized [0, 1] (1.0 -> 1, floor -> 0)."""

        floor = 10.0 ** (self.floor_db / 20.0)
        values = jnp.clip(values.astype(jnp.float32), floor, 1.0)

        return 1.0 - 20.0 * jnp.log10(values) / self.floor_db

    @nn.nowrap
    def from_log_domain(self, values):
        """dB-normalized [0, 1] -> linear [0, 1]."""

        return 10.0 ** (self.floor_db * (1.0 - values) / 20.0)

    @nn.nowrap
    def get_loss(self, estimated, reference, mask):
        """Masked MSE: estimated (B, T, O) logits vs reference (B, O, T).

        ``mask`` (B, O, T) marks the cells that count (typically the onset
        ground truth); the loss is averaged over active cells only. The
        reference is dB-transformed so the regression target is linear in
        the features.
        """

        predicted = jax.nn.sigmoid(jnp.swapaxes(estimated, -1, -2)
                                   .astype(jnp.float32))
        mask = mask.astype(jnp.float32)

        squared = (predicted - self.to_log_domain(reference)) ** 2

        return jnp.sum(squared * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @nn.nowrap
    def finalize_output(self, raw_output):
        """(B, T, O) logits -> (B, O, T) linear values in [0, 1]."""

        out = super().finalize_output(raw_output)

        return self.from_log_domain(
            jnp.swapaxes(jax.nn.sigmoid(out), -1, -2))
