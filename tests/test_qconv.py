"""Int8 serving quantization: numerics, checkpoint compatibility, wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from amt_tools_tpu import tools
from amt_tools_tpu.ops.qconv import Int8Conv, Int8Dense, quantize_symmetric
from amt_tools_tpu.tools.instrument import PianoProfile
from amt_tools_tpu.models import OnsetsFrames2, run_on_batch


def test_quantize_symmetric_round_trip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7, 5).astype(np.float32)) * 3.0

    q, scale = quantize_symmetric(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * float(scale) - np.asarray(x))
    # Round-to-nearest: error bounded by half an LSB
    assert err.max() <= float(scale) / 2 + 1e-7

    # Per-channel (last axis): each channel's max hits ~127
    qc, sc = quantize_symmetric(x, axis=-1)
    assert sc.shape == (5,)
    amax = np.abs(np.asarray(x)).max(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(sc), amax / 127.0, rtol=1e-6)


@pytest.mark.parametrize('module_pair', [
    (Int8Conv(features=12, kernel_size=(3, 3)),
     nn.Conv(12, (3, 3), padding='SAME')),
    (Int8Dense(features=12), nn.Dense(12)),
])
def test_int8_matches_float_within_lsb_bound(module_pair):
    qmod, fmod = module_pair
    rng = np.random.RandomState(1)

    shape = (2, 9, 16, 8) if isinstance(qmod, Int8Conv) else (2, 9, 8)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))  # post-ReLU-like

    variables = fmod.init(jax.random.PRNGKey(0), x)
    y_f = fmod.apply(variables, x)
    # Same params apply through the int8 module (identical tree)
    y_q = qmod.apply(variables, x)

    assert y_q.shape == y_f.shape
    # Error bound: each operand off by <= LSB/2; the products' errors sum
    # over the contraction. Use a generous relative-scale bound.
    tol = 2.0 * float(jnp.max(jnp.abs(y_f))) / 127.0
    assert float(jnp.max(jnp.abs(y_q - y_f))) < tol


def test_quant_model_param_tree_identical_and_loads_float_checkpoint():
    profile = PianoProfile()
    kw = dict(dim_in=72, profile=profile, model_complexity=2)

    m_f = OnsetsFrames2(**kw)
    m_q = OnsetsFrames2(quant_acoustic=True, **kw)

    rng = np.random.RandomState(0)
    dim_out = profile.get_range_len()
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 72, 16).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 16) > 0.9
                               ).astype(np.float32),
    }

    pre = m_f.pre_proc(dict(batch))
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v_f = m_f.init(rngs, pre[tools.KEY_FEATS], train=False)
    v_q = m_q.init(rngs, pre[tools.KEY_FEATS], train=False)

    # Identical trees: a float checkpoint serves quantized without conversion
    tree_f = jax.tree_util.tree_structure(v_f)
    tree_q = jax.tree_util.tree_structure(v_q)
    assert tree_f == tree_q

    out_f, _ = run_on_batch(m_f, v_f, batch, train=False)
    out_q, _ = run_on_batch(m_q, v_f, batch, train=False)

    # Activation maps mostly agree (quantization perturbs logits near the
    # threshold only)
    mp_f = np.asarray(out_f[tools.KEY_MULTIPITCH])
    mp_q = np.asarray(out_q[tools.KEY_MULTIPITCH])
    assert mp_f.shape == mp_q.shape
    assert np.mean(np.abs(mp_f - mp_q)) < 0.05


def test_quant_lm_param_tree_identical_and_close_to_float():
    """quant_lm (int8 LM input projections) keeps the exact float parameter
    tree and perturbs logits only within quantization tolerance."""

    profile = PianoProfile()
    kw = dict(dim_in=72, profile=profile, model_complexity=2)

    m_f = OnsetsFrames2(**kw)
    m_q = OnsetsFrames2(quant_lm=True, **kw)

    rng = np.random.RandomState(0)
    dim_out = profile.get_range_len()
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 72, 16).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 16) > 0.9
                               ).astype(np.float32),
    }

    pre = m_f.pre_proc(dict(batch))
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v_f = m_f.init(rngs, pre[tools.KEY_FEATS], train=False)
    v_q = m_q.init(rngs, pre[tools.KEY_FEATS], train=False)

    assert jax.tree_util.tree_structure(
        v_f['params']) == jax.tree_util.tree_structure(v_q['params'])

    out_f, _ = run_on_batch(m_f, v_f, batch, train=False)
    out_q, _ = run_on_batch(m_q, v_f, batch, train=False)

    mp_f = np.asarray(out_f[tools.KEY_MULTIPITCH])
    mp_q = np.asarray(out_q[tools.KEY_MULTIPITCH])
    assert mp_f.shape == mp_q.shape
    assert np.mean(np.abs(mp_f - mp_q)) < 0.05

    on_f = np.asarray(out_f[tools.KEY_ONSETS])
    on_q = np.asarray(out_q[tools.KEY_ONSETS])
    assert np.mean(np.abs(on_f - on_q)) < 0.05


def test_quant_lm_rejects_fused_lms():
    profile = PianoProfile()
    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2,
                          quant_lm=True, fused_lms=True)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 8, 72, 1).astype(np.float32))

    with pytest.raises(ValueError, match='quant_lm'):
        model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, feats, train=False)


def test_quant_acoustic_rejects_fused_heads():
    profile = PianoProfile()
    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2,
                          quant_acoustic=True, fused_heads=True)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 8, 72, 1).astype(np.float32))

    with pytest.raises(ValueError, match='quant_acoustic'):
        model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, feats, train=False)


def test_tabcnn_quant_param_tree_identical():
    from amt_tools_tpu.models import TabCNN
    from amt_tools_tpu.tools.instrument import GuitarProfile

    profile = GuitarProfile()
    kw = dict(dim_in=48, profile=profile, model_complexity=1)
    m_f = TabCNN(**kw)
    m_q = TabCNN(quant_acoustic=True, **kw)

    rng = np.random.RandomState(0)
    batch = {tools.KEY_FEATS: rng.rand(2, 1, 48, 12).astype(np.float32)}

    pre = m_f.pre_proc(dict(batch))
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    v_f = m_f.init(rngs, pre[tools.KEY_FEATS], train=False)
    v_q = m_q.init(rngs, pre[tools.KEY_FEATS], train=False)

    assert (jax.tree_util.tree_structure(v_f)
            == jax.tree_util.tree_structure(v_q))

    out_f, _ = run_on_batch(m_f, v_f, batch, train=False)
    out_q, _ = run_on_batch(m_q, v_f, batch, train=False)

    lg_f = np.asarray(out_f[tools.KEY_TABLATURE], np.float32)
    lg_q = np.asarray(out_q[tools.KEY_TABLATURE], np.float32)
    assert lg_f.shape == lg_q.shape
    # Logits agree to quantization noise; argmax decode is mostly unchanged
    agree = np.mean(
        lg_f.reshape(*lg_f.shape[:2], profile.get_num_dofs(), -1).argmax(-1)
        == lg_q.reshape(*lg_q.shape[:2], profile.get_num_dofs(), -1).argmax(-1))
    assert agree > 0.95


def test_quantized_outputs_independent_of_batch_composition():
    """Per-sample activation scales: a clip's logits do not change when a
    much louder clip joins its batch."""

    rng = np.random.RandomState(3)
    x_quiet = rng.rand(1, 9, 16, 8).astype(np.float32)
    x_loud = 100.0 * rng.rand(1, 9, 16, 8).astype(np.float32)

    conv = Int8Conv(features=12, kernel_size=(3, 3))
    variables = conv.init(jax.random.PRNGKey(0), x_quiet)

    alone = conv.apply(variables, x_quiet)
    together = conv.apply(variables,
                          np.concatenate([x_quiet, x_loud], axis=0))

    np.testing.assert_array_equal(np.asarray(alone[0]),
                                  np.asarray(together[0]))

def test_static_scale_matches_float_after_calibration():
    """static_scale modules quantize with calibrated scalar scales and
    land within the same LSB-type bound as the dynamic mode."""

    rng = np.random.RandomState(5)

    for qmod, fmod, shape in [
            (Int8Conv(features=12, kernel_size=(3, 3), static_scale=True),
             nn.Conv(12, (3, 3), padding='SAME'), (2, 9, 16, 8)),
            (Int8Dense(features=12, static_scale=True),
             nn.Dense(12), (2, 9, 8))]:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32))

        variables = fmod.init(jax.random.PRNGKey(0), x)
        y_f = fmod.apply(variables, x)

        # Calibration pass records the activation abs-max
        y_cal, mutated = qmod.apply(variables, x, mutable=['quant_stats'])
        stats = mutated['quant_stats']
        amax = float(jax.tree_util.tree_leaves(stats)[0])
        assert amax == pytest.approx(float(jnp.max(jnp.abs(x))), rel=1e-6)

        # Serving pass reads the stats read-only
        y_q = qmod.apply({**variables, 'quant_stats': stats}, x)
        np.testing.assert_array_equal(np.asarray(y_cal), np.asarray(y_q))

        tol = 2.0 * float(jnp.max(jnp.abs(y_f))) / 127.0
        assert float(jnp.max(jnp.abs(y_q - y_f))) < tol


def test_calibrate_quant_stats_running_max_and_model_wiring():
    """serving.calibrate_quant_stats fills every quantized layer's stats;
    a louder second batch raises the recorded maxima (running max)."""

    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.serving import calibrate_quant_stats

    profile = PianoProfile()
    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=2,
                          quant_acoustic='static')
    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=229)

    rng = np.random.RandomState(0)
    audio_soft = jnp.asarray(0.05 * rng.randn(1, 16000).astype(np.float32))
    audio_loud = jnp.asarray(0.9 * rng.randn(1, 16000).astype(np.float32))

    feats = mel.process_jax(audio_soft)
    pre = model.pre_proc({tools.KEY_FEATS: feats})
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    variables = model.init(rngs, pre[tools.KEY_FEATS], train=False)

    v1 = calibrate_quant_stats(model, variables, mel, audio_soft)
    assert 'quant_stats' in v1
    leaves1 = jax.tree_util.tree_leaves(v1['quant_stats'])
    # One scale per quantized layer: 3 heads x (Conv_1, Conv_2, Dense_0)
    assert len(leaves1) == 9
    assert all(float(leaf) > 0 for leaf in leaves1)

    v2 = calibrate_quant_stats(model, v1, mel, audio_loud)
    leaves2 = jax.tree_util.tree_leaves(v2['quant_stats'])
    assert all(float(b) >= float(a) for a, b in zip(leaves1, leaves2))

    # The calibrated model serves (read-only stats) and its activation maps
    # track the float forward
    m_f = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=2)
    batch = {tools.KEY_FEATS: np.asarray(feats, np.float32)}
    out_q, _ = run_on_batch(model, v2, batch, train=False)
    out_f, _ = run_on_batch(m_f, variables, batch, train=False)
    mp_q = np.asarray(out_q[tools.KEY_MULTIPITCH])
    mp_f = np.asarray(out_f[tools.KEY_MULTIPITCH])
    assert np.mean(np.abs(mp_q - mp_f)) < 0.05

def test_static_quant_pipeline_rejects_uncalibrated_stats():
    """Serving static int8 on zeros-init quant stats (a shape-only
    model.init) must fail loudly, not decode silence."""

    from amt_tools_tpu.features import MelSpec
    from amt_tools_tpu.serving import TranscriptionPipeline

    profile = PianoProfile()
    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=2,
                          quant_acoustic='static')
    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=229)

    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    # Shape-only init: records amax = 0 in quant_stats
    variables = model.init(rngs, jnp.zeros((1, 8, 229, 1)), train=False)

    with pytest.raises(ValueError, match='calibrate_quant_stats'):
        TranscriptionPipeline(model, variables, mel)

    # A float checkpoint with no collection at all is also rejected
    bare = {k: v for k, v in variables.items() if k != 'quant_stats'}
    with pytest.raises(ValueError, match='calibrate_quant_stats'):
        TranscriptionPipeline(model, bare, mel)
