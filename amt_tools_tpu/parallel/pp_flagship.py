"""Pipeline-parallel execution of the Onsets & Frames flagship models.

:mod:`parallel.pp` provides the generic GPipe schedule, but it requires
structure-uniform stages. The flagship models are heterogeneous — acoustic
conv stacks, bidirectional LSTMs of two different input widths, and dense
output banks — so this module maps them onto the uniform machinery with two
tricks, at zero cost to exactness:

1. **Dispatch-by-index stages.** Every stage carries the same parameter
   *structure* (one acoustic stack + one LM + one output dense), and the
   stage function selects its computation with ``lax.switch`` on the pipe
   ``axis_index``. Only the selected branch executes on each device.

2. **Zero-padded weight embedding.** The refinement LM consumes
   ``3 * dim_out`` joint activations while the head LMs consume ``dim_am``;
   the output denses read ``dim_lm`` or ``dim_am``. All input kernels are
   embedded into width-``dim_am`` kernels with zero rows, and the inputs are
   zero-padded to match. A matmul against zero rows contributes exactly
   zero, so stage outputs are bit-for-bit the sequential model's (up to
   float summation order).

The pipeline payload is a ``(microbatch, T, W)`` buffer laid out as
``[features | pitch | onsets | offsets | (velocity) | refined]``; each stage
fills its slice and hands the buffer to the next device over ICI. Stage
order mirrors the sequential data flow (reference ``models/onsetsframes.py:
94-136`` v1, ``:199-327`` v2): head stages are mutually independent so any
order works; the refinement stage comes last because it consumes the heads.

This gives the flagship a one-stage-per-device memory/compute layout that
composes with a ``data`` mesh axis (dp x pp) — see
``tests/test_pipeline_flagship.py`` for the exactness proof against the
plain model and ``__graft_entry__.dryrun_multichip`` for the driver check.
"""

import jax
import jax.numpy as jnp

from .. import tools
from ..models.onsetsframes import AcousticModel, OnsetsFrames, OnsetsFrames2
from ..ops.lstm import FastBiLSTM
from .pp import pipeline_apply, shard_params_pp, stack_stage_params

__all__ = ['flagship_stage_names', 'flagship_pipeline_params',
           'flagship_stage_fn', 'pack_pipeline_inputs',
           'unpack_pipeline_outputs', 'flagship_pipeline_forward']


def flagship_stage_names(model):
    """Pipeline stage order for an Onsets & Frames model.

    Head stages first (model.head_names), refinement ('adjoin') last.
    """

    return tuple(model.head_names) + ('adjoin',)


def _pad_rows(kernel, rows):
    """Embed ``kernel`` into one with ``rows`` input rows (zeros below)."""

    return jnp.zeros((rows,) + kernel.shape[1:],
                     kernel.dtype).at[:kernel.shape[0]].set(kernel)


def _pad_lm(lm_params, dim_in):
    """FastBiLSTM params with input projections padded to ``dim_in`` rows."""

    lm_params = jax.tree_util.tree_map(lambda x: x, lm_params)  # copy
    out = {}
    for key, value in lm_params.items():
        if key.startswith('input_proj'):
            out[key] = {'kernel': _pad_rows(value['kernel'], dim_in),
                        'bias': value['bias']}
        else:
            out[key] = value

    return out


def flagship_pipeline_params(model, variables):
    """Convert flagship variables to stage-stacked uniform pipeline params.

    Every stage gets the same structure: ``am`` (AcousticModel params +
    batch_stats), ``lm`` (FastBiLSTM params, input width ``dim_am``), and
    ``out`` (dense kernel/bias, input width ``dim_am``). Stages that do not
    use a member carry zero filler of the same shape (never executed).
    """

    params = variables['params']
    stats = variables['batch_stats']

    dim_am = model.dim_am

    # Filler templates (shapes only; values are never read)
    am_zero = jax.tree_util.tree_map(jnp.zeros_like,
                                     {'params': params[f'{model.head_names[0]}_am'],
                                      'stats': stats[f'{model.head_names[0]}_am']})
    lm_tmpl = _pad_lm(params['onset_lm']['FastBiLSTM_0'], dim_am)
    lm_zero = jax.tree_util.tree_map(jnp.zeros_like, lm_tmpl)

    stages = []
    for name in flagship_stage_names(model):
        if name == 'adjoin':
            am = am_zero
            lm = _pad_lm(params['adjoin_lm']['FastBiLSTM_0'], dim_am)
            out = params['adjoin_out']['Dense_0']
        else:
            am = {'params': params[f'{name}_am'], 'stats': stats[f'{name}_am']}
            if f'{name}_lm' in params:
                lm = _pad_lm(params[f'{name}_lm']['FastBiLSTM_0'], dim_am)
            else:
                # pitch / velocity heads read the embedding directly
                lm = lm_zero
            out = params[f'{name}_out']['Dense_0']

        stages.append({'am': am, 'lm': lm,
                       'out': {'kernel': _pad_rows(out['kernel'], dim_am),
                               'bias': out['bias']}})

    return stack_stage_params(stages)


def _payload_layout(model, num_feats):
    """(column offsets per slice, total width) of the pipeline payload."""

    dim_out = model.dim_out

    offsets = {'feats': 0}
    cursor = num_feats
    for name in model.head_names + ('adjoin',):
        offsets[name] = cursor
        cursor += dim_out

    return offsets, cursor


def pack_pipeline_inputs(model, feats, num_micro):
    """(B, T, F, C) NHWC features -> (M, mb, T, W) zero-extended payload."""

    batch, frames = feats.shape[:2]
    if batch % num_micro:
        raise ValueError(f'batch {batch} not divisible into {num_micro} '
                         'microbatches')

    flat = feats.reshape(batch, frames, -1)
    _, width = _payload_layout(model, flat.shape[-1])

    payload = jnp.zeros((batch, frames, width), flat.dtype)
    payload = payload.at[..., :flat.shape[-1]].set(flat)

    return payload.reshape((num_micro, batch // num_micro) + payload.shape[1:])


def unpack_pipeline_outputs(model, payload, num_feats):
    """(M, mb, T, W) final payload -> the model's logits dict."""

    offsets, _ = _payload_layout(model, num_feats)
    dim_out = model.dim_out
    flat = payload.reshape((-1,) + payload.shape[2:])

    def grab(name):
        return flat[..., offsets[name]:offsets[name] + dim_out]

    output = {tools.KEY_ONSETS: grab('onset'),
              tools.KEY_MULTIPITCH: grab('adjoin')}
    if 'offset' in offsets:
        output[tools.KEY_OFFSETS] = grab('offset')
    if 'velocity' in offsets:
        output[tools.KEY_VELOCITY] = grab('velocity')

    return output


def flagship_stage_fn(model, feats_shape, axis='pipe', allow_pallas=True):
    """Build the dispatch-by-index stage function for ``pipeline_apply``.

    ``feats_shape``: the per-clip feature shape (T, F, C) the payload's
    feature slice unflattens to.
    """

    frames, num_feats, channels = feats_shape
    flat_feats = num_feats * channels
    offsets, _ = _payload_layout(model, flat_feats)

    dim_am, dim_out = model.dim_am, model.dim_out
    stage_names = flagship_stage_names(model)

    am_module = AcousticModel(model.dim_in, dim_am, model.in_channels,
                              model.model_complexity)
    lm_module = FastBiLSTM(features=model.dim_lm // 2)

    def write(payload, name, value):
        return payload.at[..., offsets[name]:offsets[name] + dim_out].set(value)

    def embedding(params, payload):
        feats = payload[..., :flat_feats].reshape(
            payload.shape[:-1] + (num_feats, channels))
        return am_module.apply({'params': params['am']['params'],
                                'batch_stats': params['am']['stats']}, feats)

    def run_lm(params, x):
        x = jnp.zeros(x.shape[:-1] + (dim_am,), x.dtype).at[..., :x.shape[-1]].set(x)
        return lm_module.apply({'params': params['lm']}, x,
                               allow_pallas=allow_pallas)

    def out_dense(params, x):
        kernel = params['out']['kernel'][:x.shape[-1]]
        return x @ kernel + params['out']['bias']

    def head_direct(name):
        def branch(params, payload):
            return write(payload, name, out_dense(params, embedding(params, payload)))
        return branch

    def head_lm(name):
        def branch(params, payload):
            h = run_lm(params, embedding(params, payload))
            return write(payload, name, out_dense(params, h))
        return branch

    def adjoin(params, payload):
        def grab(name):
            x = payload[..., offsets[name]:offsets[name] + dim_out]
            return jax.lax.stop_gradient(x) if (model.detach_heads and
                                                name != 'pitch') else x

        parts = [grab(n) for n in stage_names[:-1] if n != 'velocity']
        # Reference joint order: onsets(, offsets), pitch — pitch last
        joint = jnp.concatenate(parts[1:] + parts[:1], axis=-1)

        return write(payload, 'adjoin', out_dense(params, run_lm(params, joint)))

    branches = []
    for name in stage_names:
        if name == 'adjoin':
            branches.append(adjoin)
        elif name == 'pitch':
            branches.append(head_direct(name))
        else:
            # onset / offset / velocity heads all run AM -> LM -> dense
            branches.append(head_lm(name))

    def stage_fn(params, payload):
        stage_id = jax.lax.axis_index(axis)
        return jax.lax.switch(stage_id, branches, params, payload)

    return stage_fn


def flagship_pipeline_forward(model, variables, feats, mesh, num_micro,
                              axis='pipe', batch_axis=None,
                              allow_pallas=True):
    """Full pipelined forward: NHWC features -> the model's logits dict.

    Exactly the sequential ``model.apply(variables, feats, False, None)``
    (up to float summation order from the zero-padded matmuls), computed
    one-stage-per-device over ``mesh.shape[axis]`` devices with ``num_micro``
    GPipe microbatches. Differentiable end-to-end (including the
    ``detach_heads`` stop-gradients of the refinement stage).
    """

    stage_params = shard_params_pp(flagship_pipeline_params(model, variables),
                                   mesh, axis=axis)
    stage_fn = flagship_stage_fn(model, feats.shape[1:], axis=axis,
                                 allow_pallas=allow_pallas)

    payload = pack_pipeline_inputs(model, feats, num_micro)
    payload = pipeline_apply(stage_params, payload, stage_fn, mesh,
                             axis=axis, batch_axis=batch_axis)

    return unpack_pipeline_outputs(model, payload,
                                   feats.shape[2] * feats.shape[3])
