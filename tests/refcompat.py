"""Load the REFERENCE torch implementation and port weights to the rebuild.

The differential-parity suite runs the reference (``/root/reference``,
cwitkowitz/amt-tools, torch/numpy) side by side with the rebuild
(``amt_tools_tpu``, jax/flax) on identical weights and inputs, converting
"matches the reference" from an asserted property into a measured one.

Two pieces live here:

* :func:`load_reference` — imports the reference package with the minimal
  dependency stubs in ``tests/refstubs`` (librosa/mido/jams/mir_eval/... are
  not installed in this environment; only a tiny arithmetic core is actually
  exercised by the compared paths, see ``refstubs/librosa/__init__.py``).
* ``port_*`` — torch -> flax weight converters for the model layers
  (reference ``amt_tools/models/common.py:305-620``, ``onsetsframes.py``,
  ``tabcnn.py``), handling the layout differences between the two designs:
  NCHW conv kernels -> HWIO, channel-major flatten -> feature-major flatten,
  fused torch LSTM gates -> hoisted input projections (``ops/lstm.py``).
"""

import sys

import numpy as np

_STUBS = '/root/repo/tests/refstubs'
_REFERENCE = '/root/reference'

_reference_module = None


def load_reference():
    """Import (once) and return the reference ``amt_tools`` package."""

    global _reference_module

    if _reference_module is None:
        for path in (_REFERENCE, _STUBS):
            if path not in sys.path:
                sys.path.insert(0, path)

        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            import amt_tools

        _reference_module = amt_tools

    return _reference_module


def _np(tensor):
    return tensor.detach().cpu().numpy().astype(np.float32)


def port_linear(linear):
    """torch ``nn.Linear`` -> flax Dense {kernel, bias}."""

    return {'kernel': _np(linear.weight).T, 'bias': _np(linear.bias)}


def port_conv(conv):
    """torch ``nn.Conv2d`` (OIHW) -> flax Conv {kernel (HWIO), bias}."""

    return {'kernel': _np(conv.weight).transpose(2, 3, 1, 0),
            'bias': _np(conv.bias)}


def port_batchnorm(bn):
    """torch ``nn.BatchNorm2d`` -> flax BatchNorm params + batch stats."""

    params = {'scale': _np(bn.weight), 'bias': _np(bn.bias)}
    stats = {'mean': _np(bn.running_mean), 'var': _np(bn.running_var)}

    return params, stats


def port_channel_major_linear(linear, channels, *spatial):
    """Port a Linear that consumes a channel-major (torch) flatten.

    torch flattens conv features as ``(C, *spatial)`` row-major (channel
    outermost: reference ``onsetsframes.py:452-455``, ``tabcnn.py:174-176``);
    the rebuild's NHWC layout flattens as ``(*spatial, C)`` (channel
    innermost). Permute the input axis of the weight to match.
    """

    weight = _np(linear.weight)  # (out, C * prod(spatial))
    out_dim = weight.shape[0]

    weight = weight.reshape((out_dim, channels) + spatial)
    # (out, C, *spatial) -> (*spatial, C, out)
    perm = tuple(range(2, 2 + len(spatial))) + (1, 0)
    weight = weight.transpose(perm)

    return {'kernel': weight.reshape(-1, out_dim), 'bias': _np(linear.bias)}


def port_lstm_direction(lstm, reverse=False):
    """One direction of a torch ``nn.LSTM`` -> FastLSTM parameter triple.

    torch computes ``gates = x W_ih^T + b_ih + h W_hh^T + b_hh`` with gate
    order [i, f, g, o] — the same order as ``ops/lstm.py:_lstm_scan``, which
    computes ``gates = input_proj(x) + h @ recurrent_kernel``. So:
    ``input_proj.kernel = W_ih^T``, ``input_proj.bias = b_ih + b_hh``,
    ``recurrent_kernel = W_hh^T``.
    """

    sfx = '_reverse' if reverse else ''

    w_ih = _np(getattr(lstm, f'weight_ih_l0{sfx}'))
    w_hh = _np(getattr(lstm, f'weight_hh_l0{sfx}'))
    b_ih = _np(getattr(lstm, f'bias_ih_l0{sfx}'))
    b_hh = _np(getattr(lstm, f'bias_hh_l0{sfx}'))

    return {'kernel': w_ih.T, 'bias': b_ih + b_hh}, w_hh.T


def port_language_model(ref_lm):
    """Reference ``LanguageModel`` (bidirectional LSTM) -> my LanguageModel params.

    Reference: ``onsetsframes.py:463-503`` (nn.LSTM, batch_first,
    bidirectional, [forward, backward] feature concat). Rebuild:
    ``models/onsetsframes.py:106`` -> ``ops/lstm.py:FastBiLSTM`` (same
    concat order).
    """

    proj_f, rec_f = port_lstm_direction(ref_lm.mlm, reverse=False)
    proj_b, rec_b = port_lstm_direction(ref_lm.mlm, reverse=True)

    return {'FastBiLSTM_0': {
        'input_proj_fwd': proj_f,
        'input_proj_bwd': proj_b,
        'recurrent_kernel_fwd': rec_f,
        'recurrent_kernel_bwd': rec_b,
    }}


def port_acoustic_model(ref_am):
    """Reference ``AcousticModel`` (``onsetsframes.py:329-460``) -> params + stats.

    Layer map: layer1 = Conv/BN/ReLU, layer2 = Conv/BN/ReLU/pool/drop,
    layer3 likewise, fc1 = Linear/drop. The fc1 input is a channel-major
    flatten of (C, F/4); the rebuild flattens feature-major (F/4, C)
    (``models/onsetsframes.py:96-100``).
    """

    params, stats = {}, {}

    for i, layer in enumerate((ref_am.layer1, ref_am.layer2, ref_am.layer3)):
        params[f'Conv_{i}'] = port_conv(layer[0])
        bn_params, bn_stats = port_batchnorm(layer[1])
        params[f'BatchNorm_{i}'] = bn_params
        stats[f'BatchNorm_{i}'] = bn_stats

    fc = ref_am.fc1[0]
    channels = ref_am.layer3[0].out_channels
    feat_height = fc.in_features // channels
    params['Dense_0'] = port_channel_major_linear(fc, channels, feat_height)

    return params, stats


def port_logistic_bank(ref_bank):
    """Reference ``LogisticBank`` (``models/common.py:486-620``) -> params."""

    return {'Dense_0': port_linear(ref_bank.output_layer)}


def port_softmax_groups(ref_groups):
    """Reference ``SoftmaxGroups`` (``models/common.py:305-483``) -> params."""

    return {'Dense_0': port_linear(ref_groups.output_layer)}


def randomize_torch_model(model, seed=0, bn_stats=True):
    """Give every parameter (and BN running stat) a non-degenerate value.

    Fresh torch models have zero running means / unit variances and
    symmetric default inits; randomizing makes the differential comparison
    sensitive to every ported tensor (a dropped or transposed tensor cannot
    hide behind a zero initialization).
    """

    import torch

    gen = torch.Generator().manual_seed(seed)

    with torch.no_grad():
        for param in model.parameters():
            param.copy_(0.25 * torch.randn(param.shape, generator=gen))

        if bn_stats:
            for mod in model.modules():
                if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                    mod.running_mean.copy_(
                        0.2 * torch.randn(mod.running_mean.shape, generator=gen))
                    mod.running_var.copy_(
                        0.5 + torch.rand(mod.running_var.shape, generator=gen))

    return model


def port_onsetsframes(ref_model):
    """Reference ``OnsetsFrames``/``OnsetsFrames2`` -> flax variables dict.

    Head layout (reference ``onsetsframes.py:46-65, 218-227``):
    onset_head = [AM, LM, LogisticBank], pitch_head = [AM, LogisticBank],
    adjoin = [LM, LogisticBank], (V2) offset_head = [AM, LM, LogisticBank].
    Rebuild layout: ``models/onsetsframes.py:451-463, 553-560``.
    """

    params, stats = {}, {}

    def add_am(name, ref_am):
        p, s = port_acoustic_model(ref_am)
        params[f'{name}_am'] = p
        stats[f'{name}_am'] = s

    add_am('onset', ref_model.onset_head[0])
    params['onset_lm'] = port_language_model(ref_model.onset_head[1])
    params['onset_out'] = port_logistic_bank(ref_model.onset_head[2])

    add_am('pitch', ref_model.pitch_head[0])
    params['pitch_out'] = port_logistic_bank(ref_model.pitch_head[1])

    params['adjoin_lm'] = port_language_model(ref_model.adjoin[0])
    params['adjoin_out'] = port_logistic_bank(ref_model.adjoin[1])

    if hasattr(ref_model, 'offset_head'):
        add_am('offset', ref_model.offset_head[0])
        params['offset_lm'] = port_language_model(ref_model.offset_head[1])
        params['offset_out'] = port_logistic_bank(ref_model.offset_head[2])

    return {'params': params, 'batch_stats': stats}


def port_tabcnn(ref_model):
    """Reference ``TabCNN`` (``tabcnn.py:11-221``) -> flax variables dict.

    conv = [Conv, ReLU, Conv, ReLU, Conv, ReLU, pool, drop] -> conv1..3;
    dense = [Linear, ReLU, drop, SoftmaxGroups] -> dense1 + tablature_out.
    dense[0] consumes a channel-major flatten of (C, H', W') where
    H' = (dim_in - 6) // 2 and W' = (frame_width - 6) // 2
    (``tabcnn.py:66-69``); the rebuild flattens (H', W', C)
    (``models/tabcnn.py:92-95``).
    """

    conv_modules = (ref_model.conv[0], ref_model.conv[2], ref_model.conv[4])

    params = {f'conv{i + 1}': port_conv(conv)
              for i, conv in enumerate(conv_modules)}

    channels = conv_modules[-1].out_channels
    height = (ref_model.dim_in - 6) // 2
    width = (ref_model.frame_width - 6) // 2

    params['dense1'] = port_channel_major_linear(
        ref_model.dense[0], channels, height, width)
    params['tablature_out'] = port_softmax_groups(ref_model.dense[3])

    return {'params': params}
