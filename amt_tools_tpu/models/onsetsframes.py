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

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import tools
from ..ops.lstm import FastLSTM, FastBiLSTM, GroupedBiLSTM
from ..ops.qconv import Int8Conv, Int8Dense
from .common import TranscriptionModel, LogisticBank, RegressionBank

__all__ = [
    'OnsetsFrames',
    'OnsetsFrames2',
    'OnsetsFramesOnline',
    'AcousticModel',
    'GroupedAcousticModel',
    'LanguageModel',
    'OnlineLanguageModel',
    'fuse_acoustic_variables',
    'unfuse_acoustic_variables',
    'fuse_lm_variables',
    'unfuse_lm_variables',
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
    # Checkpoint each conv block separately (jax.checkpoint on the block
    # methods). Whole-stack rematerialization barely cuts peak memory here —
    # the backward recomputes ALL blocks' activations and holds them at once
    # (measured: 6.27 -> 5.55 GB for one batch-32 stack) — whereas per-block
    # checkpoints bound the live set to one block's working set at a time.
    block_remat: bool = False
    # Serving-only: run the convs as int8 MXU contractions (ops.qconv).
    # False | True (dynamic activation scales) | 'static' (calibrated
    # scales, the measured-fast mode — see ops/qconv.py). The parameter
    # tree is unchanged (Int8Conv declares kernel/bias under the same
    # Conv_N names), so float checkpoints load as-is.
    quant: Any = False
    # False trains without dropout noise (BatchNorm still in train mode)
    dropout: bool = True

    def _conv(self, features, name, quantize=True):
        """The conv for one block: float ``nn.Conv`` or int8 drop-in.

        Names are pinned explicitly so both variants produce the exact
        parameter tree auto-naming gives the float stack (Conv_0/1/2).
        """

        if self.quant and quantize:
            return Int8Conv(features, (3, 3), dtype=self.dtype, name=name,
                            static_scale=self.quant == 'static')

        return nn.Conv(features, (3, 3), padding='SAME', dtype=self.dtype,
                       name=name)

    def _block1(self, x, mask, train):
        """conv + BN + ReLU (masked)."""

        # conv1 stays float even under quant: with C_in = in_channels (1)
        # its FLOPs are ~1/48 of conv2's, while quantizing the raw feature
        # input adds a whole extra noise stage that BN then amplifies —
        # measured on the calibrated-activity setup: skipping it moves
        # int8-vs-float note agreement without measurable speed cost
        nf1 = 16 * self.model_complexity
        x = self._conv(nf1, 'Conv_0', quantize=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        return x if mask is None else x * mask

    def _block2(self, x, mask, train):
        """conv + BN + ReLU + 1x2 freq-pool + dropout (masked)."""

        nf1 = 16 * self.model_complexity
        x = self._conv(nf1, 'Conv_1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = nn.Dropout(0.25, deterministic=not (train and self.dropout))(x)
        return x if mask is None else x * mask

    def _block3(self, x, mask, train):
        """conv + BN + ReLU + 1x2 freq-pool + dropout (masked)."""

        nf3 = 32 * self.model_complexity
        x = self._conv(nf3, 'Conv_2')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = nn.Dropout(0.25, deterministic=not (train and self.dropout))(x)
        return x if mask is None else x * mask

    @nn.compact
    def __call__(self, feats, train=False, lengths=None):
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

        # Method-level nn.remat keeps the parameter tree identical to the
        # unrematted stack (Conv_0/BatchNorm_0/... names are assigned by the
        # shared compact scope, verified grad-exact vs the plain blocks)
        if self.block_remat:
            blocks = [nn.remat(AcousticModel._block1, static_argnums=(3,)),
                      nn.remat(AcousticModel._block2, static_argnums=(3,)),
                      nn.remat(AcousticModel._block3, static_argnums=(3,))]
        else:
            blocks = [AcousticModel._block1, AcousticModel._block2,
                      AcousticModel._block3]

        x = feats if frame_mask is None else feats * frame_mask

        for block in blocks:
            x = block(self, x, frame_mask, train)

        # (B, T, F/4, nf3) -> (B, T, F/4 * nf3)
        x = x.reshape(x.shape[:-2] + (-1,))

        if self.quant:
            x = Int8Dense(self.dim_out, dtype=self.dtype, name='Dense_0',
                          static_scale=self.quant == 'static')(x)
        else:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name='Dense_0')(x)
        x = nn.Dropout(0.50, deterministic=not (train and self.dropout))(x)

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
    # Serving-only int8 input projections (False | True | 'static'):
    # the hoisted (B*T, E) @ (E, 4H) contractions are the LMs' only
    # MXU-bound matmuls — the recurrence itself is latency-bound
    quant: Any = False
    # Opt-in: use the Pallas BPTT kernel for TRAINING too (see __call__
    # comment; measured slower at batch 8, re-measured at batch 32+remat
    # via ``bench.py train pallas`` — RESULTS.md)
    pallas_train: bool = False

    @nn.compact
    def __call__(self, feats, train=False, lengths=None):
        hidden = self.dim_out // (2 if self.bidirectional else 1)

        # TPU-optimized scan LSTM with hoisted input projections
        # (ops/lstm.py); whole-sequence INFERENCE fuses the recurrence
        # into a Pallas kernel. The kernel is differentiable (custom-VJP
        # BPTT kernel), but at recipe-scale training batches the XLA scan
        # measures faster (O&F2-c3: 140 vs 197 ms/step bf16 — small-batch
        # steps are overhead-bound and the residual writes cost more than
        # the scan saves), so training keeps the scan by default;
        # ``pallas_train=True`` opts training into the kernel.
        allow_pallas = (not train) or self.pallas_train
        if self.bidirectional:
            return FastBiLSTM(features=hidden, dtype=self.dtype,
                              quant=self.quant)(
                feats, lengths=lengths, allow_pallas=allow_pallas)

        return FastLSTM(features=hidden, dtype=self.dtype,
                        quant=self.quant)(
            feats, lengths=lengths, allow_pallas=allow_pallas)


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
            # Whole-sequence path: the kernel is differentiable (custom
            # VJP) but the XLA scan measures faster at training batch
            # sizes — same perf choice as LanguageModel
            return rnn(feats, allow_pallas=not train), None

        new_carry, out = rnn(feats, initial_carry=carry, return_carry=True)

        return out, new_carry


class GroupedAcousticModel(nn.Module):
    """Every acoustic head of an Onsets & Frames model in ONE conv stack.

    The per-head :class:`AcousticModel` stacks all consume the same input;
    grouped convolutions are block-diagonal over channels and BatchNorm
    statistics are per-channel, so the fused stack computes exactly the
    per-head stacks side by side — a layout change, not an approximation.
    conv1 fuses densely (its input is shared); the final per-head
    projections run as one batched einsum.

    Measured caveat (v5e, XLA ~0.8.x): XLA's TPU grouped-conv lowering
    lays the operand out as (..., groups, 48) and pads the per-group
    channel dim to 128 lanes — 2.7x the activation memory — and runs all
    heads' activations concurrently instead of sequentially, so at serving
    batch sizes the fused stack OOMs where the per-head stacks fit. Until
    that lowering improves, this layout only pays off for small models /
    small batches; the default is therefore ``fused_heads=False``.

    Output: (B, T, H, dim_out) — one embedding slice per head, in the
    caller's head order. :func:`fuse_acoustic_variables` converts a
    per-head checkpoint into this layout.
    """

    dim_in: int
    dim_out: int
    heads: int = 3
    in_channels: int = 1
    model_complexity: int = 2
    dtype: Any = None
    # False trains without dropout noise (BatchNorm still in train mode)
    dropout: bool = True

    @nn.compact
    def __call__(self, feats, train=False, lengths=None):
        num_heads = self.heads
        nf1 = 16 * self.model_complexity
        nf3 = 32 * self.model_complexity

        if lengths is None:
            frame_mask = None
        else:
            # Same padded-frame zeroing as AcousticModel (bucketed eval)
            from ..ops.lstm import lengths_to_mask
            frame_mask = lengths_to_mask(lengths, feats.shape[1])
            frame_mask = frame_mask[:, :, None, None].astype(feats.dtype)

        def masked(x):
            return x if frame_mask is None else x * frame_mask

        x = masked(feats)

        # Block 1: the input is shared across heads, so the per-head conv1
        # kernels concatenate into one dense convolution
        x = nn.Conv(num_heads * nf1, (3, 3), padding='SAME', dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = masked(nn.relu(x))

        # Blocks 2-3: per-head inputs -> grouped (block-diagonal) convs
        x = nn.Conv(num_heads * nf1, (3, 3), padding='SAME',
                    feature_group_count=num_heads, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = masked(nn.Dropout(0.25, deterministic=not (train and self.dropout))(x))

        x = nn.Conv(num_heads * nf3, (3, 3), padding='SAME',
                    feature_group_count=num_heads, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        x = masked(nn.Dropout(0.25, deterministic=not (train and self.dropout))(x))

        # (B, T, F/4, H * nf3) -> (B, T, H, F/4 * nf3): group-blocked
        # channels split per head, flattened frequency-major/channel-minor
        # to match AcousticModel's reshape
        batch, frames, freqs = x.shape[0], x.shape[1], x.shape[2]
        x = x.reshape(batch, frames, freqs, num_heads, nf3)
        x = jnp.transpose(x, (0, 1, 3, 2, 4))
        x = x.reshape(batch, frames, num_heads, freqs * nf3)

        # Per-head dense projections as one batched contraction
        kernel = self.param('head_kernels',
                            nn.initializers.lecun_normal(batch_axis=(0,)),
                            (num_heads, freqs * nf3, self.dim_out))
        bias = self.param('head_bias', nn.initializers.zeros_init(),
                          (num_heads, self.dim_out))

        compute_dtype = self.dtype or x.dtype
        x = jnp.einsum('bthk,hkd->bthd', x.astype(compute_dtype),
                       kernel.astype(compute_dtype))
        x = x + bias.astype(compute_dtype)
        x = nn.Dropout(0.50, deterministic=not (train and self.dropout))(x)

        return x


def fuse_acoustic_variables(variables, head_names, grouped_name='grouped_am'):
    """Convert per-head AcousticModel variables to the fused grouped layout.

    ``head_names`` is the model's head order (``model.head_names``); the
    per-head subtrees ``<name>_am`` are concatenated channel-wise into one
    ``grouped_name`` subtree (conv kernels/biases and BatchNorm vectors on
    the channel axis; dense kernels stacked on a new leading head axis).
    Works on a full variables dict ({'params': ..., 'batch_stats': ...});
    returns a new dict, inputs unmodified. Inverse: :func:`unfuse_acoustic_variables`.
    """

    out = {}
    for collection, tree in variables.items():
        tree = dict(tree)
        heads = [tree.pop(f'{name}_am') for name in head_names
                 if f'{name}_am' in tree]

        if not heads:
            out[collection] = tree
            continue

        fused = {}
        for layer in heads[0]:
            if layer.startswith('Dense'):
                fused['head_kernels'] = jnp.stack(
                    [h[layer]['kernel'] for h in heads])
                fused['head_bias'] = jnp.stack(
                    [h[layer]['bias'] for h in heads])
            else:
                fused[layer] = {
                    key: jnp.concatenate([h[layer][key] for h in heads],
                                         axis=-1)
                    for key in heads[0][layer]}

        tree[grouped_name] = fused
        out[collection] = tree

    return out


def unfuse_acoustic_variables(variables, head_names, grouped_name='grouped_am'):
    """Split fused GroupedAcousticModel variables back into per-head trees."""

    num_heads = len(head_names)

    out = {}
    for collection, tree in variables.items():
        tree = dict(tree)
        fused = tree.pop(grouped_name, None)

        if fused is None:
            out[collection] = tree
            continue

        for i, name in enumerate(head_names):
            head = {}
            for layer, leaves in fused.items():
                if layer == 'head_kernels':
                    head.setdefault('Dense_0', {})['kernel'] = leaves[i]
                elif layer == 'head_bias':
                    head.setdefault('Dense_0', {})['bias'] = leaves[i]
                else:
                    head[layer] = {
                        key: _head_slice(leaf, i, num_heads)
                        for key, leaf in leaves.items()}

            tree[f'{name}_am'] = head

        out[collection] = tree

    return out


def fuse_lm_variables(variables, streams=('onset', 'offset'),
                      grouped_name='group_lm'):
    """Per-head LanguageModel variables -> the grouped single-scan layout.

    Stacks each ``<name>_lm`` subtree's FastBiLSTM parameters on a new
    leading stream axis under ``grouped_name`` (the layout
    ``OnsetsFrames2(fused_lms=True)`` expects; pass
    ``model._fused_lm_streams`` for the stream order). Returns a new
    variables dict; inverse: :func:`unfuse_lm_variables`.
    """

    out = {}
    for collection, tree in variables.items():
        tree = dict(tree)
        present = [name for name in streams if f'{name}_lm' in tree]

        if not present:
            out[collection] = tree
            continue

        if len(present) != len(streams):
            missing = sorted(set(streams) - set(present))
            raise ValueError(f'variables hold LM subtrees for {present} but '
                             f'not {missing}; pass the model\'s stream order '
                             f'(model._fused_lm_streams) as `streams`')

        # A fusable LM left out of `streams` would silently keep the
        # per-head layout for that stream (and the fused model would fail
        # to find it under group_lm) — e.g. the default 2-stream order on
        # an estimate_velocity=True tree
        leftover = [name for name in ('onset', 'offset', 'velocity')
                    if name not in streams and f'{name}_lm' in tree]
        if leftover:
            raise ValueError(f'variables also hold fusable LM subtrees '
                             f'{leftover} not named in `streams`; pass the '
                             f'model\'s stream order '
                             f'(model._fused_lm_streams)')

        lms = [tree.pop(f'{name}_lm')['FastBiLSTM_0'] for name in streams]

        fused = {}
        for direction in ('fwd', 'bwd'):
            fused[f'input_proj_{direction}_kernel'] = jnp.stack(
                [lm[f'input_proj_{direction}']['kernel'] for lm in lms])
            fused[f'input_proj_{direction}_bias'] = jnp.stack(
                [lm[f'input_proj_{direction}']['bias'] for lm in lms])
            fused[f'recurrent_kernel_{direction}'] = jnp.stack(
                [lm[f'recurrent_kernel_{direction}'] for lm in lms])

        tree[grouped_name] = fused
        out[collection] = tree

    return out


def unfuse_lm_variables(variables, streams=('onset', 'offset'),
                        grouped_name='group_lm'):
    """Inverse of :func:`fuse_lm_variables`: grouped -> per-head layout."""

    out = {}
    for collection, tree in variables.items():
        tree = dict(tree)
        fused = tree.pop(grouped_name, None)

        if fused is None:
            out[collection] = tree
            continue

        stacked = fused['recurrent_kernel_fwd'].shape[0]
        if stacked != len(streams):
            raise ValueError(f'{grouped_name} holds {stacked} streams but '
                             f'`streams` names {len(streams)} '
                             f'({tuple(streams)}); pass the model\'s stream '
                             f'order (model._fused_lm_streams) so no trained '
                             f'LM is silently dropped')

        for i, name in enumerate(streams):
            lm = {}
            for direction in ('fwd', 'bwd'):
                lm[f'input_proj_{direction}'] = {
                    'kernel': fused[f'input_proj_{direction}_kernel'][i],
                    'bias': fused[f'input_proj_{direction}_bias'][i]}
                lm[f'recurrent_kernel_{direction}'] = \
                    fused[f'recurrent_kernel_{direction}'][i]
            tree[f'{name}_lm'] = {'FastBiLSTM_0': lm}

        out[collection] = tree

    return out


def _head_slice(leaf, index, num_heads):
    """Slice head ``index``'s channels out of a channel-concatenated leaf."""

    width = leaf.shape[-1] // num_heads

    return leaf[..., index * width:(index + 1) * width]


def _acoustic_model_cls(remat):
    """AcousticModel, optionally wrapped in gradient rematerialization.

    Whole-stack ``nn.remat`` is the measured speed winner on v5e (batch-32
    O&F2-c3 training: 2.49 steps/s vs 2.01 unrematted vs 1.59/1.18 with
    per-block checkpoints): it drops every conv activation from the saved
    set for the cost of one recompute, while per-block checkpointing
    (``AcousticModel.block_remat``) trades lower peak memory (10.9 -> 6.4 GB
    temp) for extra HBM round trips through the saved block boundaries.
    Pass ``remat='blocks'`` on the model for the per-block variant when a
    long-crop/large-batch step does not fit otherwise.
    """

    if remat == 'blocks':
        return functools.partial(AcousticModel, block_remat=True)

    if remat:
        return nn.remat(AcousticModel, static_argnums=(2, 3))

    return AcousticModel


def _grouped_model_cls(remat):
    """GroupedAcousticModel, optionally with gradient rematerialization."""

    if remat == 'blocks':
        raise ValueError("remat='blocks' is only supported with per-head "
                         "acoustic stacks (fused_heads=False)")

    if remat:
        return nn.remat(GroupedAcousticModel, static_argnums=(2, 3))

    return GroupedAcousticModel


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
    # Run all acoustic heads as one grouped conv stack (identical math; see
    # GroupedAcousticModel for when this wins and when it loses).
    # fuse/unfuse_acoustic_variables convert checkpoints between layouts.
    fused_heads: bool = False
    # Run the independent language models (onset/offset/velocity on V2) as
    # ONE grouped scan (ops.lstm.GroupedBiLSTM): identical math, 1/S the
    # sequential recurrence steps. Measured SLOWER on v5e at recipe shapes
    # (the batched recurrent matmul lowers worse than per-head scans;
    # RESULTS.md round 3) — kept opt-in for lowerings where grouping pays.
    # fuse/unfuse_lm_variables convert checkpoints between layouts.
    fused_lms: bool = False
    # Opt-in: route the LMs' TRAINING recurrence through the Pallas BPTT
    # kernel (inference always uses the kernel). Parameter tree unchanged.
    pallas_lms: bool = False

    @property
    def head_names(self):
        """Acoustic-head order (fixes embedding slices and param layout)."""

        return ('pitch', 'onset')

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

    def _setup_acoustic(self):
        """Acoustic stacks: one grouped module or per-head modules."""

        if self.fused_heads:
            if self.quant_acoustic:
                raise ValueError('quant_acoustic is only supported with '
                                 'per-head acoustic stacks (fused_heads=False)')
            Grouped = _grouped_model_cls(self.remat)
            self.grouped_am = Grouped(self.dim_in, self.dim_am,
                                      len(self.head_names), self.in_channels,
                                      self.model_complexity, dtype=self.dtype,
                                      dropout=self.dropout)
        else:
            AcousticModel = _acoustic_model_cls(self.remat)
            for name in self.head_names:
                setattr(self, f'{name}_am',
                        AcousticModel(self.dim_in, self.dim_am,
                                      self.in_channels, self.model_complexity,
                                      dtype=self.dtype,
                                      quant=self.quant_acoustic,
                                      dropout=self.dropout))

    def _embeddings(self, feats, train, lengths):
        """Per-head acoustic embeddings keyed by head name."""

        if self.fused_heads:
            emb = self.grouped_am(feats, train, lengths)
            return {name: emb[..., i, :]
                    for i, name in enumerate(self.head_names)}

        return {name: getattr(self, f'{name}_am')(feats, train, lengths)
                for name in self.head_names}

    @property
    def _fused_lm_streams(self):
        """Head order for the grouped-LM layout; None = not fusable (V1's
        only independent LM is the onset head's, nothing to group)."""

        return None

    def setup(self):
        if self.model_complexity < 2:
            raise ValueError('OnsetsFrames requires model_complexity >= 2 '
                             '(the language-model width is 256 * (complexity - 1)).')

        self._setup_acoustic()

        if self.fused_lms:
            if self._fused_lm_streams is None:
                raise ValueError('fused_lms requires a model with multiple '
                                 'independent language models '
                                 '(OnsetsFrames2); V1 has only the onset LM.')
            if self.quant_lm:
                raise ValueError('quant_lm is only supported with per-head '
                                 'language models (fused_lms=False).')
            self.group_lm = GroupedBiLSTM(features=self.dim_lm // 2,
                                          streams=len(self._fused_lm_streams),
                                          dtype=self.dtype)
        else:
            self.onset_lm = LanguageModel(self.dim_am, self.dim_lm,
                                          dtype=self.dtype,
                                          quant=self.quant_lm,
                                          pallas_train=self.pallas_lms)
        self.onset_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out,
                                       dtype=self.dtype)

        self.pitch_out = LogisticBank(dim_in=self.dim_am, dim_out=self.dim_out,
                                       dtype=self.dtype)

        self.adjoin_lm = LanguageModel(self.dim_aj, self.dim_lm,
                                       dtype=self.dtype, quant=self.quant_lm,
                                       pallas_train=self.pallas_lms)
        self.adjoin_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out,
                                       dtype=self.dtype)

    def __call__(self, feats, train=False, lengths=None):
        output = {}

        emb = self._embeddings(feats, train, lengths)

        # Initial multi-pitch estimate
        multi_pitch = self.pitch_out(emb['pitch'])

        # Onset estimate (lengths mask makes bucketed padded eval exact)
        onsets = self.onset_out(self.onset_lm(emb['onset'], train,
                                              lengths=lengths))
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
    def head_names(self):
        if self.estimate_velocity:
            return ('pitch', 'onset', 'offset', 'velocity')

        return ('pitch', 'onset', 'offset')

    @property
    def dim_aj(self):
        """Refinement consumes onsets + offsets + pitch."""

        return 3 * self.dim_out

    @property
    def _fused_lm_streams(self):
        if self.estimate_velocity:
            return ('onset', 'offset', 'velocity')

        return ('onset', 'offset')

    def setup(self):
        super().setup()

        if not self.fused_lms:
            self.offset_lm = LanguageModel(self.dim_am, self.dim_lm,
                                           dtype=self.dtype,
                                           quant=self.quant_lm,
                                           pallas_train=self.pallas_lms)
        self.offset_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out,
                                       dtype=self.dtype)

        if self.estimate_velocity:
            # Conv stack -> BiLSTM -> regression (the O&F2 paper's velocity
            # stack shape). The LM is load-bearing, not decorative: the
            # velocity target is constant across each note's span while the
            # tone decays, so a per-frame dense readout cannot recover the
            # struck amplitude deep into a long note — the recurrence
            # carries it (measured: within-tolerance 0.37 -> see RESULTS.md)
            if not self.fused_lms:
                self.velocity_lm = LanguageModel(self.dim_am, self.dim_lm,
                                                 dtype=self.dtype,
                                                 quant=self.quant_lm,
                                                 pallas_train=self.pallas_lms)
            self.velocity_out = RegressionBank(dim_in=self.dim_lm,
                                               dim_out=self.dim_out,
                                               dtype=self.dtype)

    def _lm_outputs(self, emb, train, lengths):
        """Per-head LM features: grouped single scan or per-head modules."""

        streams = self._fused_lm_streams

        if self.fused_lms:
            stacked = jnp.stack([emb[name] for name in streams])
            out = self.group_lm(stacked, lengths=lengths)

            return {name: out[i] for i, name in enumerate(streams)}

        modules = {name: getattr(self, f'{name}_lm') for name in streams}

        return {name: modules[name](emb[name], train, lengths=lengths)
                for name in streams}

    def __call__(self, feats, train=False, lengths=None):
        output = {}

        emb = self._embeddings(feats, train, lengths)

        multi_pitch = self.pitch_out(emb['pitch'])

        lm = self._lm_outputs(emb, train, lengths)

        onsets = self.onset_out(lm['onset'])
        output[tools.KEY_ONSETS] = onsets

        offsets = self.offset_out(lm['offset'])
        output[tools.KEY_OFFSETS] = offsets

        if self.estimate_velocity:
            output[tools.KEY_VELOCITY] = self.velocity_out(lm['velocity'])

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
            velocity_head = RegressionBank(dim_in=self.dim_lm,
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
        if self.fused_lms:
            raise ValueError('fused_lms is not supported by the online model '
                             '(its LMs thread streaming carries and V1-style '
                             'heads leave nothing independent to group).')

        self._setup_acoustic()

        self.onset_lm = OnlineLanguageModel(self.dim_am, self.dim_lm)
        self.onset_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out,
                                       dtype=self.dtype)

        self.pitch_out = LogisticBank(dim_in=self.dim_am, dim_out=self.dim_out,
                                       dtype=self.dtype)

        self.adjoin_lm = OnlineLanguageModel(self.dim_aj, self.dim_lm)
        self.adjoin_out = LogisticBank(dim_in=self.dim_lm, dim_out=self.dim_out,
                                       dtype=self.dtype)

    @nn.nowrap
    def init_carries(self, batch_size):
        """Zero streaming state for both recurrent stages."""

        zeros_lm = (jnp.zeros((batch_size, self.dim_lm)),
                    jnp.zeros((batch_size, self.dim_lm)))

        return {'onset': zeros_lm, 'adjoin': (jnp.zeros((batch_size, self.dim_lm)),
                                              jnp.zeros((batch_size, self.dim_lm)))}

    def __call__(self, feats, train=False, carries=None, lengths=None):
        output = {}

        emb = self._embeddings(feats, train, lengths)

        multi_pitch = self.pitch_out(emb['pitch'])

        onset_feats, onset_carry = self.onset_lm(
            emb['onset'],
            carry=None if carries is None else carries['onset'],
            train=train)
        onsets = self.onset_out(onset_feats)
        output[tools.KEY_ONSETS] = onsets

        if self.detach_heads:
            onsets = jax.lax.stop_gradient(onsets)

        joint = jnp.concatenate((onsets, multi_pitch), axis=-1)
        adjoin_feats, adjoin_carry = self.adjoin_lm(
            joint, carry=None if carries is None else carries['adjoin'],
            train=train)
        output[tools.KEY_MULTIPITCH] = self.adjoin_out(adjoin_feats)

        if carries is None:
            return output

        return output, {'onset': onset_carry, 'adjoin': adjoin_carry}
