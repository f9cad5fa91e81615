"""TPU-optimized LSTM layers.

Standard scan-based LSTM cells (including flax's ``OptimizedLSTMCell``)
compute the input projection ``x_t @ W_x`` inside the scan body — T small
matmuls that leave the MXU idle between steps. :class:`FastLSTM` hoists the
input projections out of the scan as ONE large (B*T, E) @ (E, 4H)
contraction, leaving only the unavoidable recurrent matmul ``h @ W_h`` and
elementwise gate math inside ``lax.scan``. Same parameterization and
numerics as a standard LSTM; typically 1.5-3x faster on TPU for the model
sizes used here.

``FastBiLSTM`` runs the forward and backward directions as two scans over
the shared hoisted projections.

On TPU, whole-sequence passes (no mask, no streaming carry) run the
recurrence as a fused Pallas kernel instead (``ops/pallas_lstm.py``,
~2.3x the XLA scan at serving scale). The kernel carries a custom VJP
whose backward is a second Pallas kernel (BPTT in the opposite traversal
order), so differentiating through it is safe — but at recipe-scale
training batches the XLA scan measures faster, so the built-in models
pass ``allow_pallas=not train``; masked/streaming paths always keep the
XLA scan.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ['FastLSTM', 'FastBiLSTM', 'GroupedBiLSTM', 'lengths_to_mask']


def _input_proj(features, name, dtype, quant):
    """The hoisted (B*T, E) @ (E, 4H) projection: float or int8 drop-in.

    With ``quant`` the contraction runs on the int8 MXU path
    (``ops.qconv.Int8Dense`` — identical parameter names, so float
    checkpoints serve as-is). The recurrent matmul stays float: at
    (B, H) @ (H, 4H) per step it is latency-bound, not MXU-bound, and
    quantization error would compound through the recurrence.
    """

    if quant:
        from .qconv import Int8Dense
        return Int8Dense(features, name=name, dtype=dtype,
                         static_scale=quant == 'static')

    return nn.Dense(features, name=name, dtype=dtype)


def _match_varying(value, like):
    """Give ``value`` the device-varying axes of ``like`` (shard_map).

    Inside ``shard_map`` (e.g. the pipeline-parallel stage functions,
    ``parallel/pp.py``) the hoisted projections are device-varying over the
    manual mesh axes, but freshly-created zero carries are not — ``lax.scan``
    then rejects the carry type mismatch. No-op outside shard_map.
    """

    try:
        vma = jax.typeof(like).vma
    except AttributeError:
        return value

    missing = tuple(sorted(set(vma) - set(jax.typeof(value).vma)))
    if not missing:
        return value

    if hasattr(jax.lax, 'pcast'):
        return jax.lax.pcast(value, missing, to='varying')

    return jax.lax.pvary(value, missing)


def _lstm_gates(gates, h, c):
    """The LSTM cell update from pre-activation gates ([i, f, g, o] order).

    THE single copy of the gate numerics: both scan variants (and their
    exactness guarantees) route through it. Gate math accumulates in f32;
    results cast back to the carry dtype so low-precision (bf16)
    activations keep a consistent scan carry.
    """

    hidden = h.shape[-1]

    i = jax.nn.sigmoid(gates[..., 0 * hidden: 1 * hidden])
    f = jax.nn.sigmoid(gates[..., 1 * hidden: 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden: 3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden: 4 * hidden])

    c_new = (f * c.astype(jnp.float32) + i * g).astype(c.dtype)
    h_new = (o * jnp.tanh(c_new.astype(jnp.float32))).astype(h.dtype)

    return h_new, c_new


def _masked_step_outputs(h_new, c_new, h, c, m):
    """Masked-step semantics shared by both scans: padded steps leave the
    carry unchanged and output zeros (bucketed static-shape evaluation is
    EXACT on valid frames; reverse scans effectively start at each
    sequence's true end)."""

    c_keep = jnp.where(m, c_new, c)
    h_keep = jnp.where(m, h_new, h)
    h_out = jnp.where(m, h_new, jnp.zeros_like(h_new))

    return (h_keep, c_keep), h_out


def _lstm_scan(xw, h0, c0, w_h, reverse=False, unroll=1, mask=None):
    """Scan the recurrent half of an LSTM over hoisted input projections.

    xw : (B, T, 4H) input projections (already includes the bias)
    h0, c0 : (B, H) initial state
    w_h : (H, 4H) recurrent weights
    mask : optional (B, T) validity mask (see :func:`_masked_step_outputs`).
    """

    def step(carry, inputs):
        h, c = carry
        if mask is None:
            x_proj = inputs
        else:
            x_proj, m = inputs

        gates = x_proj + jnp.dot(h, w_h.astype(h.dtype),
                                 preferred_element_type=jnp.float32)
        h_new, c_new = _lstm_gates(gates, h, c)

        if mask is None:
            return (h_new, c_new), h_new

        return _masked_step_outputs(h_new, c_new, h, c, m[:, None])

    # Scan over time: (T, B, 4H)
    xw_t = jnp.swapaxes(xw, 0, 1)

    xs = xw_t if mask is None else (xw_t, jnp.swapaxes(mask, 0, 1))

    h0 = _match_varying(h0, xw)
    c0 = _match_varying(c0, xw)

    (h, c), out = jax.lax.scan(step, (h0, c0), xs, reverse=reverse,
                               unroll=unroll)

    # (T, B, H) -> (B, T, H)
    return jnp.swapaxes(out, 0, 1), (h, c)


def _grouped_lstm_scan(xw, w_h, unroll=1, mask=None):
    """One scan over G independent LSTM streams with per-group weights.

    xw : (G, B, T, 4H) hoisted input projections
    w_h : (G, H, 4H) per-group recurrent weights
    mask : optional (G, B, T) validity mask (same semantics as
           :func:`_lstm_scan`)

    The step body runs ONE batched matmul ``(G, B, H) @ (G, H, 4H)``
    instead of G sequential scans' ``(B, H) @ (H, 4H)`` — same FLOPs,
    1/G the sequential scan steps and per-step launch overhead. Used by
    :class:`GroupedBiLSTM` (the opt-in ``fused_lms`` layout). NOT used
    inside a single BiLSTM: folding one layer's two directions into a
    grouped scan measured slower than two plain scans on v5e (the batched
    recurrent matmul lowers worse at these widths; chip A/B in
    RESULTS.md round 3). Gate numerics are :func:`_lstm_gates`, shared
    with :func:`_lstm_scan`.
    """

    hidden = w_h.shape[-2]

    def step(carry, inputs):
        h, c = carry  # (G, B, H)
        if mask is None:
            x_proj = inputs
        else:
            x_proj, m = inputs

        gates = x_proj + jnp.einsum('gbh,gho->gbo', h, w_h.astype(h.dtype),
                                    preferred_element_type=jnp.float32)
        h_new, c_new = _lstm_gates(gates, h, c)

        if mask is None:
            return (h_new, c_new), h_new

        return _masked_step_outputs(h_new, c_new, h, c, m[..., None])

    # Scan over time: (T, G, B, 4H)
    xw_t = jnp.moveaxis(xw, 2, 0)
    xs = xw_t if mask is None else (xw_t, jnp.moveaxis(mask, 2, 0))

    zeros = jnp.zeros(xw.shape[:2] + (hidden,), dtype=xw.dtype)
    h0 = _match_varying(zeros, xw)
    c0 = _match_varying(jnp.zeros_like(zeros), xw)

    (h, c), out = jax.lax.scan(step, (h0, c0), xs, unroll=unroll)

    # (T, G, B, H) -> (G, B, T, H)
    return jnp.moveaxis(out, 0, 2), (h, c)


def lengths_to_mask(lengths, num_frames):
    """(B,) valid lengths -> (B, T) boolean validity mask."""

    return jnp.arange(num_frames)[None, :] < jnp.asarray(lengths)[:, None]


class FastLSTM(nn.Module):
    """Unidirectional LSTM with hoisted input projections.

    (B, T, E) -> (B, T, H). Pass ``initial_carry=(c, h)`` and
    ``return_carry=True`` for streaming use.
    """

    features: int
    unroll: int = 8
    dtype: Optional[jnp.dtype] = None
    # Serving-only int8 input projection (False | True | 'static'; see
    # _input_proj / ops.qconv). Do not train with this.
    quant: Any = False

    @nn.compact
    def __call__(self, inputs, initial_carry=None, return_carry=False,
                 lengths=None, allow_pallas=True):
        batch = inputs.shape[0]
        hidden = self.features

        # Hoisted input projection for all timesteps: one MXU contraction
        xw = _input_proj(4 * hidden, 'input_proj', self.dtype,
                         self.quant)(inputs)

        w_h = self.param('recurrent_kernel', nn.initializers.orthogonal(),
                         (hidden, 4 * hidden))

        if (allow_pallas and lengths is None and initial_carry is None
                and not return_carry):
            from .pallas_lstm import (lstm_scan_pallas_grad,
                                      pallas_lstm_supported)
            if pallas_lstm_supported(batch, hidden):
                return lstm_scan_pallas_grad(xw, w_h)

        if initial_carry is None:
            c0 = jnp.zeros((batch, hidden), dtype=xw.dtype)
            h0 = jnp.zeros((batch, hidden), dtype=xw.dtype)
        else:
            c0, h0 = initial_carry

        mask = None if lengths is None else lengths_to_mask(lengths,
                                                            inputs.shape[1])

        out, (h, c) = _lstm_scan(xw, h0, c0, w_h, unroll=self.unroll,
                                 mask=mask)

        if return_carry:
            return (c, h), out

        return out


class FastBiLSTM(nn.Module):
    """Bidirectional LSTM: two scans over per-direction hoisted projections.

    (B, T, E) -> (B, T, 2 * features) with forward/backward halves
    concatenated on the feature axis.
    """

    features: int
    unroll: int = 8
    dtype: Optional[jnp.dtype] = None
    # Serving-only int8 input projections (False | True | 'static')
    quant: Any = False

    @nn.compact
    def __call__(self, inputs, lengths=None, allow_pallas=True):
        batch = inputs.shape[0]
        hidden = self.features

        xw_f = _input_proj(4 * hidden, 'input_proj_fwd', self.dtype,
                           self.quant)(inputs)
        xw_b = _input_proj(4 * hidden, 'input_proj_bwd', self.dtype,
                           self.quant)(inputs)

        w_h_f = self.param('recurrent_kernel_fwd', nn.initializers.orthogonal(),
                           (hidden, 4 * hidden))
        w_h_b = self.param('recurrent_kernel_bwd', nn.initializers.orthogonal(),
                           (hidden, 4 * hidden))

        if allow_pallas and lengths is None:
            from .pallas_lstm import (lstm_scan_pallas_grad,
                                      pallas_lstm_supported)
            if pallas_lstm_supported(batch, hidden):
                out_f = lstm_scan_pallas_grad(xw_f, w_h_f)
                out_b = lstm_scan_pallas_grad(xw_b, w_h_b, reverse=True)

                return jnp.concatenate([out_f, out_b], axis=-1)

        # One scan per direction. Running both directions as ONE grouped
        # scan (stack [fwd, flipped-bwd] on a group axis, halving the
        # sequential step count) was measured SLOWER on v5e at every
        # training shape that matters — chip A/B, same process: batch 8
        # bf16 10.97 -> 7.62 steps/s, batch 32 bf16 3.13 -> 2.63, batch 32
        # remat 2.56 -> 1.41, batch 8 f32 ~tie (RESULTS.md round 3). The
        # batched (2, B, H) @ (2, H, 4H) recurrent matmul lowers worse
        # than two plain (B, H) @ (H, 4H) steps at these widths, and the
        # time-flips add bandwidth. Grouping pays only across INDEPENDENT
        # streams (see GroupedBiLSTM / fused_lms).
        mask = None if lengths is None else lengths_to_mask(lengths,
                                                            inputs.shape[1])

        zeros = jnp.zeros((batch, hidden), dtype=xw_f.dtype)
        out_f, _ = _lstm_scan(xw_f, zeros, zeros, w_h_f, unroll=self.unroll,
                              mask=mask)
        out_b, _ = _lstm_scan(xw_b, zeros, zeros, w_h_b, unroll=self.unroll,
                              reverse=True, mask=mask)

        return jnp.concatenate([out_f, out_b], axis=-1)


def _stacked_orthogonal(key, shape, dtype=jnp.float32):
    """Independent orthogonal (H, 4H) matrices stacked on a leading axis."""

    init = nn.initializers.orthogonal()

    return jnp.stack([init(k, shape[1:], dtype)
                      for k in jax.random.split(key, shape[0])])


class GroupedBiLSTM(nn.Module):
    """S independent BiLSTMs sharing ONE scan: (S, B, T, E) -> (S, B, T, 2H).

    The flagship's independent language models (onset / offset / velocity —
    same shapes, no data dependencies) each cost a full sequential
    recurrence; grouping them stacks all S streams' two directions into a
    single scan of batched ``(2S, B, H) @ (2S, H, 4H)`` recurrent matmuls —
    1/S the sequential step count of S separate :class:`FastBiLSTM` calls
    for identical math (the step count, not the FLOPs, bounds training
    throughput at recipe batches, RESULTS.md).

    Parameters are the per-stream stacks of FastBiLSTM's
    (``input_proj_{fwd,bwd}_{kernel,bias}``, ``recurrent_kernel_{fwd,bwd}``
    with a leading stream axis); ``models.fuse_lm_variables`` /
    ``unfuse_lm_variables`` convert checkpoints to/from the per-stream
    layout. Scan-only (no Pallas path): this is a training-throughput
    layout; serve checkpoints through the unfused layout for the fused
    Pallas recurrence.
    """

    features: int
    streams: int = 2
    unroll: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, lengths=None):
        streams, _, frames, dim_in = inputs.shape
        if streams != self.streams:
            raise ValueError(f'expected {self.streams} streams, '
                             f'got input shape {inputs.shape}')
        hidden = self.features

        dense_init = nn.initializers.variance_scaling(
            1.0, 'fan_in', 'truncated_normal', batch_axis=(0,))

        compute_dtype = self.dtype if self.dtype is not None else inputs.dtype

        def proj(name):
            kernel = self.param(f'input_proj_{name}_kernel', dense_init,
                                (streams, dim_in, 4 * hidden))
            bias = self.param(f'input_proj_{name}_bias',
                              nn.initializers.zeros,
                              (streams, 4 * hidden))
            xw = jnp.einsum('sbte,seo->sbto', inputs.astype(compute_dtype),
                            kernel.astype(compute_dtype))

            return xw + bias.astype(compute_dtype)[:, None, None, :]

        xw_f = proj('fwd')
        xw_b = proj('bwd')

        w_h_f = self.param('recurrent_kernel_fwd', _stacked_orthogonal,
                           (streams, hidden, 4 * hidden))
        w_h_b = self.param('recurrent_kernel_bwd', _stacked_orthogonal,
                           (streams, hidden, 4 * hidden))

        # All streams' directions in one scan (backward = forward over the
        # time-flipped projections, exactly as in FastBiLSTM)
        xw = jnp.concatenate([xw_f, jnp.flip(xw_b, axis=2)], axis=0)
        w_h = jnp.concatenate([w_h_f, w_h_b], axis=0)

        if lengths is None:
            mask = None
        else:
            m = lengths_to_mask(lengths, frames)
            mask = jnp.concatenate(
                [jnp.broadcast_to(m, (streams,) + m.shape),
                 jnp.broadcast_to(jnp.flip(m, axis=1),
                                  (streams,) + m.shape)], axis=0)

        out, _ = _grouped_lstm_scan(xw, w_h, unroll=self.unroll, mask=mask)

        return jnp.concatenate([out[:streams],
                                jnp.flip(out[streams:], axis=2)], axis=-1)
