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

__all__ = ['lstm_scan_pallas', 'lstm_scan_pallas_grad',
           'pallas_lstm_supported', 'DEFAULT_BLOCK_T']

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


##################################################
# DIFFERENTIABLE PATH (custom VJP)               #
##################################################
#
# Training steps on the O&F family are LSTM-scan-bound (the 6 scan
# directions are ~40% of a recipe-scale train step), so the kernel needs a
# gradient. jax cannot differentiate pallas_call; instead the forward
# saves its gate activations and cell states as residuals and a second
# kernel runs the classic BPTT recurrence in the opposite traversal order,
# with the same VMEM-carry structure. The dW_h reduction happens OUTSIDE
# the kernel as one large einsum over the saved states (no in-kernel
# transposes needed); the kernel only emits d(xw).


def _lstm_fwd_res_kernel(xw_ref, wh_ref, out_ref, gates_ref, c_ref,
                         h_scr, c_scr, *, block_t, hidden, reverse):
    """Forward step that also records gate activations and cell states."""

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
            gates = (xw_ref[r].astype(jnp.float32) + acc).astype(jnp.bfloat16)
            sigmoid = lambda x: 0.5 * jnp.tanh(0.5 * x) + 0.5  # noqa: E731
        else:
            gates = xw_ref[r].astype(jnp.float32) + acc
            sigmoid = jax.nn.sigmoid

        i_g = sigmoid(gates[:, 0 * hidden: 1 * hidden])
        f_g = sigmoid(gates[:, 1 * hidden: 2 * hidden])
        g_g = jnp.tanh(gates[:, 2 * hidden: 3 * hidden])
        o_g = sigmoid(gates[:, 3 * hidden: 4 * hidden])

        c_new = (f_g.astype(jnp.float32) * c +
                 (i_g * g_g).astype(jnp.float32))
        h_new = o_g.astype(jnp.float32) * jnp.tanh(c_new)

        c_scr[...] = c_new
        h_scr[...] = h_new
        out_ref[r] = h_new.astype(out_ref.dtype)
        c_ref[r] = c_new
        gates_ref[r, :, 0 * hidden: 1 * hidden] = i_g.astype(jnp.float32)
        gates_ref[r, :, 1 * hidden: 2 * hidden] = f_g.astype(jnp.float32)
        gates_ref[r, :, 2 * hidden: 3 * hidden] = g_g.astype(jnp.float32)
        gates_ref[r, :, 3 * hidden: 4 * hidden] = o_g.astype(jnp.float32)

        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _lstm_bwd_kernel(gates_ref, c_ref, cprev_ref, dout_ref, whT_ref,
                     dxw_ref, dh_scr, dc_scr, *, block_t, hidden, reverse):
    """One BPTT block: traversal opposite to the forward's.

    Zero-padded residual rows annihilate the carries (all gate values are
    zero there), so tail padding stays exact in either direction.
    """

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    def body(i, _):
        # Opposite traversal: forward ascending -> backward descending
        r = i if reverse else (block_t - 1 - i)

        i_g = gates_ref[r, :, 0 * hidden: 1 * hidden]
        f_g = gates_ref[r, :, 1 * hidden: 2 * hidden]
        g_g = gates_ref[r, :, 2 * hidden: 3 * hidden]
        o_g = gates_ref[r, :, 3 * hidden: 4 * hidden]

        c_t = c_ref[r]
        tanh_c = jnp.tanh(c_t)

        dh = dout_ref[r].astype(jnp.float32) + dh_scr[...]

        da_o = dh * tanh_c * o_g * (1.0 - o_g)
        dc = dc_scr[...] + dh * o_g * (1.0 - tanh_c * tanh_c)

        da_i = dc * g_g * i_g * (1.0 - i_g)
        da_g = dc * i_g * (1.0 - g_g * g_g)
        da_f = dc * cprev_ref[r] * f_g * (1.0 - f_g)

        dc_scr[...] = dc * f_g

        da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
        dxw_ref[r] = da

        w_h_T = whT_ref[...]
        dh_scr[...] = jnp.dot(da.astype(w_h_T.dtype), w_h_T,
                              preferred_element_type=jnp.float32)

        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _time_major_padded(x, block_t):
    """(B, T, ...) -> (T_padded, B, ...) zero-padded to a block multiple."""

    x = jnp.swapaxes(x, 0, 1)
    padded = -(-x.shape[0] // block_t) * block_t
    if padded != x.shape[0]:
        x = jnp.pad(x, ((0, padded - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

    return x


@functools.partial(jax.jit, static_argnames=('reverse', 'block_t',
                                             'interpret'))
def _lstm_fwd_res(xw, w_h, reverse=False, block_t=DEFAULT_BLOCK_T,
                  interpret=False):
    """Forward with residuals: returns (out, gates, c_seq), batch-major."""

    batch, num_frames, four_h = xw.shape
    hidden = four_h // 4

    xw_t = _time_major_padded(xw, block_t)
    padded = xw_t.shape[0]
    num_blocks = padded // block_t

    compute_dtype = (jnp.bfloat16 if xw.dtype == jnp.bfloat16
                     else jnp.float32)
    wh = w_h.astype(compute_dtype)

    index = ((lambda i: (num_blocks - 1 - i, 0, 0)) if reverse else
             (lambda i: (i, 0, 0)))

    out, gates, c_seq = pl.pallas_call(
        functools.partial(_lstm_fwd_res_kernel, block_t=block_t,
                          hidden=hidden, reverse=reverse),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block_t, batch, four_h), index),
            pl.BlockSpec((hidden, four_h), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_t, batch, hidden), index),
            pl.BlockSpec((block_t, batch, four_h), index),
            pl.BlockSpec((block_t, batch, hidden), index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, batch, hidden), xw.dtype),
            jax.ShapeDtypeStruct((padded, batch, four_h), jnp.float32),
            jax.ShapeDtypeStruct((padded, batch, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32),
                        pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(xw_t, wh)

    out = jnp.swapaxes(out[:num_frames], 0, 1)
    gates = jnp.swapaxes(gates[:num_frames], 0, 1)
    c_seq = jnp.swapaxes(c_seq[:num_frames], 0, 1)

    return out, gates, c_seq


def _shift_prev(x, reverse):
    """Sequence of "previous-step" values along time (zero at the start).

    For a forward scan the state feeding step t is the one at t-1; for a
    reverse scan it is the one at t+1.
    """

    if reverse:
        return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)

    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lstm_scan_pallas_grad(xw, w_h, reverse=False, block_t=DEFAULT_BLOCK_T,
                          interpret=False):
    """Differentiable :func:`lstm_scan_pallas` (custom VJP, both kernels).

    Identical outputs to :func:`lstm_scan_pallas`; under ``jax.grad`` the
    forward additionally saves gate/cell residuals and the backward runs
    the BPTT recurrence as a second Pallas kernel.
    """

    return lstm_scan_pallas(xw, w_h, reverse=reverse, block_t=block_t,
                            interpret=interpret)


def _lstm_grad_fwd(xw, w_h, reverse, block_t, interpret):
    out, gates, c_seq = _lstm_fwd_res(xw, w_h, reverse=reverse,
                                      block_t=block_t, interpret=interpret)

    return out, (xw, w_h, out, gates, c_seq)


def _lstm_grad_bwd(reverse, block_t, interpret, residuals, dout):
    xw, w_h, out, gates, c_seq = residuals
    batch, num_frames, four_h = xw.shape
    hidden = four_h // 4

    c_prev = _shift_prev(c_seq, reverse)
    h_prev = _shift_prev(out, reverse)

    gates_t = _time_major_padded(gates, block_t)
    c_t = _time_major_padded(c_seq, block_t)
    cprev_t = _time_major_padded(c_prev, block_t)
    dout_t = _time_major_padded(dout, block_t)

    padded = gates_t.shape[0]
    num_blocks = padded // block_t

    compute_dtype = (jnp.bfloat16 if xw.dtype == jnp.bfloat16
                     else jnp.float32)
    wh_T = jnp.swapaxes(w_h, 0, 1).astype(compute_dtype)

    # Backward visits blocks in the opposite order to the forward
    index = ((lambda i: (i, 0, 0)) if reverse else
             (lambda i: (num_blocks - 1 - i, 0, 0)))

    dxw = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, block_t=block_t, hidden=hidden,
                          reverse=reverse),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block_t, batch, four_h), index),
            pl.BlockSpec((block_t, batch, hidden), index),
            pl.BlockSpec((block_t, batch, hidden), index),
            pl.BlockSpec((block_t, batch, hidden), index),
            pl.BlockSpec((four_h, hidden), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, batch, four_h), index),
        out_shape=jax.ShapeDtypeStruct((padded, batch, four_h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32),
                        pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(gates_t, c_t, cprev_t, dout_t, wh_T)

    dxw = jnp.swapaxes(dxw[:num_frames], 0, 1)

    # dW_h = sum_t h_prev_t^T da_t — one big contraction, outside the kernel
    dwh = jnp.einsum('bth,btg->hg', h_prev.astype(jnp.float32), dxw)

    return dxw.astype(xw.dtype), dwh.astype(w_h.dtype)


lstm_scan_pallas_grad.defvjp(_lstm_grad_fwd, _lstm_grad_bwd)
