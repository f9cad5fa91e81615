"""Model unit tests: shapes, loss correctness, streaming equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.tools.instrument import PianoProfile, GuitarProfile
from amt_tools_tpu.models import (OnsetsFrames, OnsetsFrames2, TabCNN,
                                  AcousticModel, LanguageModel,
                                  OnlineLanguageModel, LogisticBank,
                                  SoftmaxGroups, run_on_batch)


@pytest.fixture(scope='module')
def key():
    return jax.random.PRNGKey(0)


def test_logistic_bank_loss_matches_manual(key):
    bank = LogisticBank(dim_in=8, dim_out=4)

    logits = jax.random.normal(key, (2, 6, 4))      # (B, T, O)
    ref = (jax.random.uniform(key, (2, 4, 6)) > 0.5).astype(jnp.float32)

    loss = bank.get_loss(logits, ref)

    # Manual: BCE per element, mean frames, sum keys, mean batch
    lt = np.swapaxes(np.asarray(logits), -1, -2)
    r = np.asarray(ref)
    bce = np.maximum(lt, 0) - lt * r + np.log1p(np.exp(-np.abs(lt)))
    manual = np.mean(np.sum(np.mean(bce, axis=-1), axis=-1))

    assert abs(float(loss) - manual) < 1e-4


def test_logistic_bank_finalize(key):
    bank = LogisticBank(dim_in=8, dim_out=4)
    logits = jax.random.normal(key, (2, 6, 4))

    probs = bank.finalize_output(logits)
    assert probs.shape == (2, 4, 6)
    assert float(jnp.min(probs)) >= 0 and float(jnp.max(probs)) <= 1

    binary = bank.finalize_output(logits, threshold=0.5)
    assert set(np.unique(np.asarray(binary))).issubset({0.0, 1.0})


def test_softmax_groups_loss_matches_manual(key):
    sg = SoftmaxGroups(dim_in=8, dim_out=6 * 21, num_groups=6, num_classes=21)

    logits = jax.random.normal(key, (2, 5, 6 * 21))
    tabs = jax.random.randint(key, (2, 6, 5), -1, 20)

    loss = sg.get_loss(logits, tabs)

    # Manual cross-entropy
    lg = np.asarray(logits).reshape(2, 5, 6, 21)
    lb = np.swapaxes(np.asarray(tabs), -1, -2)
    lb = np.where(lb == -1, 20, lb)
    logp = lg - np.log(np.sum(np.exp(lg - lg.max(-1, keepdims=True)), -1, keepdims=True)) \
        - lg.max(-1, keepdims=True)
    picked = np.take_along_axis(logp, lb[..., None], axis=-1)[..., 0]
    manual = np.mean(np.mean(np.sum(-picked, axis=-1), axis=-1))

    assert abs(float(loss) - manual) < 1e-4


def test_softmax_groups_finalize(key):
    sg = SoftmaxGroups(dim_in=8, dim_out=6 * 21, num_groups=6, num_classes=21)
    logits = jax.random.normal(key, (2, 5, 6 * 21))

    tabs = sg.finalize_output(logits)
    assert tabs.shape == (2, 6, 5)
    assert int(jnp.min(tabs)) >= -1 and int(jnp.max(tabs)) < 20


def test_acoustic_model_shapes(key):
    am = AcousticModel(dim_in=229, dim_out=256, in_channels=1, model_complexity=1)
    feats = jnp.ones((2, 10, 229, 1))  # (B, T, F, C)

    variables = am.init(key, feats, train=False)
    out = am.apply(variables, feats, train=False)
    assert out.shape == (2, 10, 256)


def test_language_model_shapes(key):
    lm = LanguageModel(dim_in=64, dim_out=32)
    feats = jnp.ones((2, 10, 64))

    variables = lm.init(key, feats)
    out = lm.apply(variables, feats)
    assert out.shape == (2, 10, 32)


def test_online_lstm_streaming_equivalence(key):
    """Feeding frames one at a time with carried state must equal the
    full-sequence pass (the invariant behind the reference's online LSTM)."""

    lm = OnlineLanguageModel(dim_in=16, dim_out=24)
    feats = jax.random.normal(key, (3, 12, 16))

    variables = lm.init(key, feats)

    full, _ = lm.apply(variables, feats, carry=lm.init_carry(3))

    # One frame at a time
    carry = lm.init_carry(3)
    outs = []
    for t in range(12):
        step, carry = lm.apply(variables, feats[:, t:t + 1], carry=carry)
        outs.append(step)
    streamed = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def _of_batch(profile, batch_size=2, num_frames=8, n_mels=72):
    rng = np.random.RandomState(0)
    dim_out = profile.get_range_len()
    return {
        tools.KEY_FEATS: jnp.asarray(rng.rand(batch_size, 1, n_mels, num_frames),
                                     dtype=jnp.float32),
        tools.KEY_MULTIPITCH: jnp.asarray(
            (rng.rand(batch_size, dim_out, num_frames) > 0.9).astype(np.float32)),
        tools.KEY_TIMES: jnp.asarray(np.arange(num_frames) * 0.032)[None].repeat(batch_size, 0),
    }


def test_onsetsframes_run_on_batch(key):
    profile = PianoProfile()
    model = OnsetsFrames(dim_in=72, profile=profile, model_complexity=2)

    batch = _of_batch(profile)
    pre = model.pre_proc(dict(batch))
    variables = model.init({'params': key, 'dropout': key},
                           pre[tools.KEY_FEATS], train=False)

    output, _ = run_on_batch(model, variables, batch, train=False)

    dim_out = profile.get_range_len()
    assert output[tools.KEY_MULTIPITCH].shape == (2, dim_out, 8)
    assert output[tools.KEY_ONSETS].shape == (2, dim_out, 8)
    loss = output[tools.KEY_LOSS]
    assert np.isfinite(float(loss[tools.KEY_LOSS_TOTAL]))
    assert float(loss[tools.KEY_LOSS_TOTAL]) > 0
    # Loss composition
    np.testing.assert_allclose(
        float(loss[tools.KEY_LOSS_TOTAL]),
        float(loss[tools.KEY_LOSS_PITCH]) + float(loss[tools.KEY_LOSS_ONSETS]),
        rtol=1e-6)
    # Finalized predictions are binary (0.5 threshold)
    assert set(np.unique(np.asarray(output[tools.KEY_MULTIPITCH]))).issubset({0.0, 1.0})
    # Times passed through
    assert tools.KEY_TIMES in output


def test_onsetsframes2_offset_head(key):
    profile = PianoProfile()
    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2)

    batch = _of_batch(profile)
    pre = model.pre_proc(dict(batch))
    variables = model.init({'params': key, 'dropout': key},
                           pre[tools.KEY_FEATS], train=False)

    output, _ = run_on_batch(model, variables, batch, train=False)

    assert tools.KEY_OFFSETS in output
    loss = output[tools.KEY_LOSS]
    assert tools.KEY_LOSS_OFFSETS in loss
    np.testing.assert_allclose(
        float(loss[tools.KEY_LOSS_TOTAL]),
        float(loss[tools.KEY_LOSS_PITCH]) + float(loss[tools.KEY_LOSS_ONSETS])
        + float(loss[tools.KEY_LOSS_OFFSETS]), rtol=1e-6)


def test_onsetsframes_bf16_dtype_forward(key):
    """O&F2(dtype=bf16) raw logits track the f32 forward.

    The serving headline builds the model with ``dtype=jnp.bfloat16``
    (params stay f32); since round 5 the LogisticBank/RegressionBank
    heads follow the model dtype instead of silently promoting the bf16
    LM output to f32 for the head matmuls. Pins the bf16 logits (conv
    stacks + BiLSTMs + heads all in bf16 compute) to the f32 forward
    within bf16 rounding at the logit scale.
    """

    profile = PianoProfile()
    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2)

    batch = _of_batch(profile)
    pre = model.pre_proc(dict(batch))
    variables = model.init({'params': key, 'dropout': key},
                           pre[tools.KEY_FEATS], train=False)

    raw_f32 = model.apply(variables, pre[tools.KEY_FEATS], train=False)
    raw_bf16 = model.clone(dtype=jnp.bfloat16).apply(
        variables, pre[tools.KEY_FEATS], train=False)

    for k in (tools.KEY_MULTIPITCH, tools.KEY_ONSETS, tools.KEY_OFFSETS):
        ref = np.asarray(raw_f32[k], dtype=np.float32)
        got = np.asarray(raw_bf16[k], dtype=np.float32)
        assert got.dtype == np.float32 or got.shape == ref.shape
        scale = max(float(np.max(np.abs(ref))), 1.0)
        dev = float(np.max(np.abs(got - ref)))
        assert dev < 0.05 * scale, f'{k}: bf16 dev {dev:.4f} at scale {scale:.2f}'


def test_tabcnn_run_on_batch(key):
    profile = GuitarProfile()
    model = TabCNN(dim_in=96, profile=profile, model_complexity=1)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: jnp.asarray(rng.rand(2, 1, 96, 10), dtype=jnp.float32),
        tools.KEY_TABLATURE: jnp.asarray(rng.randint(-1, 20, (2, 6, 10))),
    }

    pre = model.pre_proc(dict(batch))
    assert pre[tools.KEY_FEATS].shape == (2, 10, 96, 9, 1)

    variables = model.init({'params': key, 'dropout': key},
                           pre[tools.KEY_FEATS], train=False)

    output, _ = run_on_batch(model, variables, batch, train=False)

    assert output[tools.KEY_TABLATURE].shape == (2, 6, 10)
    assert np.isfinite(float(output[tools.KEY_LOSS][tools.KEY_LOSS_TOTAL]))
    tabs = np.asarray(output[tools.KEY_TABLATURE])
    assert tabs.min() >= -1 and tabs.max() < 20


def test_tabcnn_gradients_flow(key):
    """Loss must be differentiable end-to-end w.r.t. the parameters."""

    profile = GuitarProfile()
    model = TabCNN(dim_in=96, profile=profile, model_complexity=1)

    rng = np.random.RandomState(0)
    batch = {
        tools.KEY_FEATS: jnp.asarray(rng.rand(1, 1, 96, 6), dtype=jnp.float32),
        tools.KEY_TABLATURE: jnp.asarray(rng.randint(-1, 20, (1, 6, 6))),
    }

    pre = model.pre_proc(dict(batch))
    variables = model.init({'params': key, 'dropout': key},
                           pre[tools.KEY_FEATS], train=False)

    def loss_fn(params):
        out, _ = run_on_batch(model, {'params': params}, batch, train=True,
                              rngs={'dropout': key})
        return out[tools.KEY_LOSS][tools.KEY_LOSS_TOTAL]

    grads = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total_norm = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total_norm > 0


@pytest.mark.parametrize('remat', [True, 'blocks'])
def test_remat_variants_are_bit_exact(remat):
    """remat=True / remat='blocks' change memory, never math.

    Whole-stack remat wraps each acoustic conv stack in jax.checkpoint;
    'blocks' checkpoints each conv block via method-level nn.remat, which
    must keep the parameter tree identical (Conv_0/BatchNorm_0/... names
    come from the shared compact scope). One full Adam step must produce
    bit-identical parameters vs the unrematted model.
    """

    import optax

    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state, make_train_step

    profile = PianoProfile()
    batch = _of_batch(profile)
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH]

    def one_step(remat_flag):
        model = OnsetsFrames2(dim_in=72, profile=profile,
                              model_complexity=2, remat=remat_flag)
        optimizer = optax.adam(6e-4)
        state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer)
        state, loss = step(state, dict(batch))
        return state.params, float(loss[tools.KEY_LOSS_TOTAL])

    base_params, base_loss = one_step(False)
    params, loss = one_step(remat)

    assert loss == base_loss

    base_leaves, base_tree = jax.tree_util.tree_flatten(base_params)
    leaves, tree = jax.tree_util.tree_flatten(params)
    assert tree == base_tree

    for a, b in zip(base_leaves, leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocks_remat_rejects_fused_heads():
    from amt_tools_tpu.models import OnsetsFrames2
    from amt_tools_tpu.train import init_state

    import optax

    profile = PianoProfile()
    batch = _of_batch(profile)
    batch[tools.KEY_ONSETS] = batch[tools.KEY_MULTIPITCH]

    model = OnsetsFrames2(dim_in=72, profile=profile, model_complexity=2,
                          remat='blocks', fused_heads=True)

    with pytest.raises(ValueError, match='blocks'):
        init_state(model, optax.adam(6e-4), batch, jax.random.PRNGKey(0))
