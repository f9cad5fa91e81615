"""Int8 convolution for serving: run the MXU at its integer rate.

TPU v5e executes int8 x int8 -> int32 contractions at twice the bf16 MXU
rate. The acoustic conv stacks dominate the serving forward (~236 ms of a
332 ms batch at ~43% bf16 MFU, RESULTS.md breakdown), so quantizing just
those convs attacks the single largest line item in the pipeline.

Design (weight quantization always in-graph; the static activation mode
adds a one-shot calibration pass over representative audio):

- **Weights**: per-output-channel symmetric int8, scales computed from the
  float32 parameters inside the forward. The parameter tree is IDENTICAL
  to the float model's (``kernel``/``bias`` under the same module names),
  so any trained checkpoint serves quantized without conversion; XLA
  hoists the (tiny) weight-quantization ops out of the conv hot path.
- **Activations**, two modes:

  * *dynamic* (default): per-SAMPLE symmetric int8 with a runtime scale
    (``max|x| / 127`` over each batch element separately, so one loud
    clip cannot coarsen its batchmates' quantization grid). No
    calibration needed — but the abs-max reduce forces the producer's
    output to be read twice more (reduce + quantize), and those
    bandwidth passes MEASURED LARGER than the int8 MXU saving on v5e:
    the dynamic int8 pipeline runs at 0.81x the bf16 one even though
    the int8 contractions themselves probe 1.4-2.2x faster (RESULTS.md
    round 3).
  * *static* (``static_scale=True``): one per-layer scalar scale read
    from the ``'quant_stats'`` variable collection, filled by a
    calibration pass (run any forward with ``mutable=['quant_stats']``
    — each layer records the running abs-max it saw; see
    ``serving.calibrate_quant_stats``). With a constant scale the
    round/clip/cast fuses into the producing op's output write — zero
    extra passes — which is what lets the int8 MXU rate shine through
    end-to-end. Still batch-independent (the scale is a constant).

- **Accumulation**: int32 (``preferred_element_type``), dequantized to the
  module's compute dtype with the fused ``s_x * s_w`` rescale + bias.

Quantization error is bounded by half an LSB in each operand: the
activation LSB is ``max|x|/127`` and the weight LSB per channel is
``max|w_c|/127``. The reference has no quantized path (its inference is
f32 torch, ``amt_tools/inference.py:12-47``); this is a beyond-parity
serving capability, opt-in via ``TranscriptionModel.quant_acoustic``.
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ['Int8Conv', 'Int8Dense', 'quantize_symmetric', 'QUANT_STATS',
           'validate_quant_stats']

# Variable collection holding calibrated per-layer activation abs-maxima
# (see module docstring / serving.calibrate_quant_stats)
QUANT_STATS = 'quant_stats'


def quantize_symmetric(x, axis=None):
    """Symmetric int8 quantization of ``x``.

    Returns ``(q, scale)`` with ``q = round(x / scale)`` clipped to
    [-127, 127] as int8, where ``scale = max|x| / 127`` reduced over all
    axes except ``axis`` (None = per-tensor).
    """

    xf = x.astype(jnp.float32)

    if axis is None:
        scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0,
                            jnp.finfo(jnp.float32).tiny)
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)

        return q, scale

    axes = tuple(i for i in range(x.ndim) if i != axis % x.ndim)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax / 127.0, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)

    return q, scale.reshape(x.shape[axis % x.ndim])


def validate_quant_stats(variables, context='static int8 serving'):
    """Raise if static-scale serving would run on uncalibrated stats.

    A ``quant_acoustic='static'`` model initialized on zeros (every
    script's shape-only ``model.init``) records amax = 0; serving with
    that saturates every activation to +/-127 and rescales to ~0 — the
    pipeline would silently decode garbage. Call this with CONCRETE
    variables (pipeline/export construction time) before compiling.
    """

    stats = variables.get(QUANT_STATS)
    if not stats:
        raise ValueError(
            f'{context}: variables carry no "{QUANT_STATS}" collection — '
            f'run serving.calibrate_quant_stats on representative audio '
            f'first (a float checkpoint does not include these scales).')

    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(stats)[0]:
        if float(np.max(np.asarray(leaf))) <= 0.0:
            name = jax.tree_util.keystr(path)
            raise ValueError(
                f'{context}: calibrated activation scale {name} is zero '
                f'(stats recorded from a zeros init, not real audio) — '
                f'run serving.calibrate_quant_stats on representative '
                f'audio first.')


def _static_activation_quant(module, xf):
    """Quantize activations with a calibrated per-layer scalar scale.

    Reads (and, when the ``'quant_stats'`` collection is mutable —
    i.e. during ``init`` or a calibration ``apply`` — updates with a
    running maximum) this layer's activation abs-max. Returns
    ``(x8, scale)`` with a SCALAR scale, so the round/clip/cast fuses
    into the producer's output write with no extra reduction pass.
    Values beyond the calibrated range saturate at +/-127.
    """

    amax = module.variable(QUANT_STATS, 'act_amax',
                           lambda: jnp.zeros((), jnp.float32))

    if module.is_mutable_collection(QUANT_STATS):
        amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(xf)))

    scale = jnp.maximum(amax.value / 127.0, jnp.finfo(jnp.float32).tiny)
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)

    return x8, scale


class Int8Conv(nn.Module):
    """Drop-in ``nn.Conv`` replacement computing the contraction in int8.

    Declares the same parameters (``kernel``: (kh, kw, in, out) with
    lecun-normal init, ``bias``: (out,) zeros) under the same names as
    ``nn.Conv``, so a module tree using ``Int8Conv(name='Conv_0')`` loads
    float checkpoints unchanged. Stride is fixed at 1 — the only stride
    the models' conv stacks use.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: str = 'SAME'
    dtype: Any = None
    # Calibrated scalar activation scale from 'quant_stats' instead of a
    # per-sample runtime scale (see module docstring for the measured
    # bandwidth argument)
    static_scale: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            tuple(self.kernel_size) + (in_features,
                                                       self.features),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)

        # Per-output-channel weight scales (axis -1 of HWIO)
        w8, s_w = quantize_symmetric(kernel, axis=-1)

        if self.static_scale:
            x8, s_x = _static_activation_quant(self, x.astype(jnp.float32))
        else:
            # Per-sample dynamic activation scales
            x8, s_x = quantize_symmetric(x, axis=0)
            s_x = s_x.reshape((-1,) + (1,) * (x.ndim - 1))

        dn = jax.lax.conv_dimension_numbers(
            x.shape, w8.shape, ('NHWC', 'HWIO', 'NHWC'))
        acc = jax.lax.conv_general_dilated(
            x8, w8, window_strides=(1, 1), padding=self.padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32)

        out = acc.astype(jnp.float32) * (s_x * s_w) + bias
        out_dtype = self.dtype if self.dtype is not None else jnp.float32

        return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` replacement computing the matmul in int8.

    Same parameters/names as ``nn.Dense`` (``kernel``: (in, out),
    ``bias``: (out,)); per-output-column weight scales, int32
    accumulation. Dynamic mode uses per-ROW activation scales: unlike a
    conv (whose receptive fields overlap, forcing one scale per sample),
    a dense layer contracts over the feature axis only — every output row
    can carry its own scale, so a loud frame never coarsens another
    frame's quantization grid. ``static_scale=True`` trades that for one
    calibrated scalar (the measured-fast serving mode, see module
    docstring).
    """

    features: int
    dtype: Any = None
    # Calibrated scalar activation scale (see Int8Conv.static_scale)
    static_scale: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)

        w8, s_w = quantize_symmetric(kernel, axis=-1)

        xf = x.astype(jnp.float32)
        if self.static_scale:
            x8, s_x = _static_activation_quant(self, xf)
        else:
            s_x = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                jnp.finfo(jnp.float32).tiny)
            x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

        acc = jax.lax.dot_general(
            x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        out = acc.astype(jnp.float32) * (s_x * s_w) + bias
        out_dtype = self.dtype if self.dtype is not None else jnp.float32

        return out.astype(out_dtype)
