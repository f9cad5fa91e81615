"""Fused TPU LSTM recurrence kernel.

``ops.lstm.FastLSTM`` already hoists the input projections out of the scan,
leaving only the recurrent matmul and gate math per step — but as an XLA
``lax.scan`` each of those steps is a separate while-loop iteration whose
fixed overhead dwarfs its arithmetic: at serving scale (batch 128, hidden
256) one direction measures ~10 ms for 1876 steps (~5.5 us/step) while the
per-step compute is ~0.3 us of MXU work. This kernel runs the whole
recurrence as ONE ``pallas_call``:

    grid = (num_t_blocks,)           sequential on TPU
    resident in VMEM: w_h (H, 4H), carry scratch h/c (B, H)
    per grid step: stream xw block (block_t, B, 4H) HBM -> VMEM,
                   fori_loop the recurrence over the block's rows,
                   stream out block (block_t, B, H) VMEM -> HBM

The carry lives in VMEM scratch, which persists across grid steps on TPU
(the grid is a sequential loop, not parallel dispatch). ``reverse=True``
visits blocks and in-block rows back-to-front while writing each output row
at its natural position, so backward-direction outputs need no flips.

Numerics: the recurrent dot runs on the MXU in bf16 with f32 accumulation;
gate math is f32; the carry is kept in f32 scratch (the XLA path rounds the
carry to bf16 each step when the model dtype is bf16, so the kernel is the
*more* accurate of the two — equivalence tests use a small tolerance).

Replaces the hot path of the reference's LSTM language models
(``/root/reference/amt_tools/models/onsetsframes.py:466-575``).
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['lstm_scan_pallas', 'pallas_lstm_supported', 'DEFAULT_BLOCK_T']

DEFAULT_BLOCK_T = 16


def pallas_lstm_supported(batch, hidden):
    """Whether the fused recurrence kernel supports these sizes on this backend.

    Requires a TPU backend, lane-aligned gate width (4H % 128 == 0, i.e.
    H % 32 == 0), and a sublane-aligned batch (B % 8 == 0).
    """

    import jax

    if jax.default_backend() not in ('tpu', 'axon'):
        return False

    return (4 * hidden) % 128 == 0 and batch % 8 == 0


def _lstm_kernel(xw_ref, wh_ref, out_ref, h_scr, c_scr, *,
                 block_t, hidden, reverse):
    """One grid step: recurrence over ``block_t`` timesteps of the block."""

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    bf16 = wh_ref.dtype == jnp.bfloat16

    def body(i, _):
        r = (block_t - 1 - i) if reverse else i

        h = h_scr[...]
        c = c_scr[...]

        w_h = wh_ref[...]
        acc = jnp.dot(h.astype(w_h.dtype), w_h,
                      preferred_element_type=jnp.float32)

        if bf16:
            # bf16 gate math doubles VPU throughput ((2,1) packing); the
            # tanh form of the logistic sidesteps a Mosaic bf16-sigmoid
            # lowering bug AND is the faster lowering here (measured
            # 2.4 us/step vs 3.4 f32-sigmoid / 2.6 bf16-exp on v5e)
            gates = (xw_ref[r].astype(jnp.float32) + acc).astype(jnp.bfloat16)
            sigmoid = lambda x: 0.5 * jnp.tanh(0.5 * x) + 0.5  # noqa: E731
        else:
            gates = xw_ref[r].astype(jnp.float32) + acc
            sigmoid = jax.nn.sigmoid

        i_g = sigmoid(gates[:, 0 * hidden: 1 * hidden])
        f_g = sigmoid(gates[:, 1 * hidden: 2 * hidden])
        g_g = jnp.tanh(gates[:, 2 * hidden: 3 * hidden])
        o_g = sigmoid(gates[:, 3 * hidden: 4 * hidden])

        # Cell state accumulates in f32 regardless (the XLA bf16 path
        # rounds the carry to bf16 every step; the kernel is strictly
        # more accurate there). These are a few (B, H) VPU ops — cheap
        # next to the (B, 4H) transcendentals above.
        c_new = (f_g.astype(jnp.float32) * c +
                 (i_g * g_g).astype(jnp.float32))
        h_new = o_g.astype(jnp.float32) * jnp.tanh(c_new)

        c_scr[...] = c_new
        h_scr[...] = h_new
        out_ref[r] = h_new.astype(out_ref.dtype)

        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


@functools.partial(jax.jit, static_argnames=('reverse', 'block_t',
                                             'interpret'))
def lstm_scan_pallas(xw, w_h, reverse=False, block_t=DEFAULT_BLOCK_T,
                     interpret=False):
    """Fused LSTM recurrence: (B, T, 4H) projections -> (B, T, H) outputs.

    ``xw`` holds the hoisted input projections including the bias (the same
    quantity ``ops.lstm._lstm_scan`` consumes); ``w_h`` is the (H, 4H)
    recurrent kernel. The initial carry is zero (the whole-sequence
    inference path); streaming/bucketed paths keep the XLA scan.
    """

    batch, num_frames, four_h = xw.shape
    hidden = four_h // 4

    # Time-major for sequential block streaming
    xw_t = jnp.swapaxes(xw, 0, 1)

    padded = -(-num_frames // block_t) * block_t
    if padded != num_frames:
        # Zero-pad the tail: a zero carry is a FIXED POINT under zero
        # input (c' = f*0 + i*0 = 0, h' = o*tanh(0) = 0), so the reverse
        # scan walking the pad rows first still reaches the last valid
        # frame with a zero carry, and the forward scan's pad outputs are
        # simply trimmed.
        xw_t = jnp.pad(xw_t, ((0, padded - num_frames), (0, 0), (0, 0)))

    num_blocks = padded // block_t

    # bf16 models run the recurrent dot on the MXU in bf16; f32 models keep
    # the XLA path's full precision
    compute_dtype = (jnp.bfloat16 if xw.dtype == jnp.bfloat16
                     else jnp.float32)
    wh = w_h.astype(compute_dtype)

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, block_t=block_t, hidden=hidden,
                          reverse=reverse),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(
                (block_t, batch, four_h),
                (lambda i: (num_blocks - 1 - i, 0, 0)) if reverse else
                (lambda i: (i, 0, 0))),
            pl.BlockSpec((hidden, four_h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block_t, batch, hidden),
            (lambda i: (num_blocks - 1 - i, 0, 0)) if reverse else
            (lambda i: (i, 0, 0))),
        out_shape=jax.ShapeDtypeStruct((padded, batch, hidden), xw.dtype),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32),
                        pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(xw_t, wh)

    if padded != num_frames:
        out = out[:num_frames]

    return jnp.swapaxes(out, 0, 1)
