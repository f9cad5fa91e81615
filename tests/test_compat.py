"""Migration API: reference torch checkpoints -> rebuild variables.

``amt_tools_tpu.compat`` consumes plain state_dicts; these tests prove it
produces exactly the variables the (differentially validated) module-based
porting in ``tests/refcompat.py`` does, from every supported source form:
a live torch module, an in-memory state_dict, and a ``torch.save``d file.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import refcompat
from amt_tools_tpu import tools
from amt_tools_tpu import compat
from amt_tools_tpu.models import OnsetsFrames2, TabCNN, run_on_batch
from amt_tools_tpu.tools.instrument import GuitarProfile, PianoProfile

torch = pytest.importorskip('torch')

ref = refcompat.load_reference()


def _assert_tree_equal(a, b):
    flat_a, tree_a = jax.tree_util.tree_flatten(a)
    flat_b, tree_b = jax.tree_util.tree_flatten(b)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope='module')
def ref_of2():
    model = ref.models.OnsetsFrames2(48, ref.tools.PianoProfile(),
                                     model_complexity=2)
    refcompat.randomize_torch_model(model, seed=3)
    model.eval()
    return model


def test_port_matches_module_based_porting(ref_of2):
    expected = refcompat.port_onsetsframes(ref_of2)

    # From a live module and from its state_dict
    my_model = OnsetsFrames2(dim_in=48, profile=PianoProfile(),
                             model_complexity=2)
    _assert_tree_equal(compat.port_reference_checkpoint(my_model, ref_of2),
                       expected)
    _assert_tree_equal(
        compat.port_onsetsframes_state_dict(ref_of2.state_dict()), expected)


def test_port_from_saved_checkpoint_file(ref_of2, tmp_path):
    expected = refcompat.port_onsetsframes(ref_of2)
    my_model = OnsetsFrames2(dim_in=48, profile=PianoProfile(),
                             model_complexity=2)

    path = tmp_path / 'reference_of2.pt'
    torch.save(ref_of2.state_dict(), str(path))

    variables = compat.port_reference_checkpoint(my_model, str(path))
    _assert_tree_equal(variables, expected)

    # The ported variables actually serve: forward on a real batch
    rng = np.random.RandomState(0)
    dim_out = my_model.profile.get_range_len()
    batch = {
        tools.KEY_FEATS: rng.rand(2, 1, 48, 9).astype(np.float32),
        tools.KEY_MULTIPITCH: (rng.rand(2, dim_out, 9) > 0.9
                               ).astype(np.float32),
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    out, _ = run_on_batch(my_model, variables, batch, train=False)
    assert np.all(np.isfinite(np.asarray(out[tools.KEY_MULTIPITCH])))


def test_port_tabcnn_state_dict():
    ref_model = ref.models.TabCNN(36, ref.tools.GuitarProfile())
    refcompat.randomize_torch_model(ref_model, seed=5)
    ref_model.eval()

    expected = refcompat.port_tabcnn(ref_model)
    my_model = TabCNN(dim_in=36, profile=GuitarProfile(), frame_width=9)

    _assert_tree_equal(compat.port_reference_checkpoint(my_model, ref_model),
                       expected)


def test_port_rejects_unknown_model():
    from amt_tools_tpu.models import AcousticModel

    with pytest.raises(TypeError, match='porting'):
        compat.port_reference_checkpoint(
            AcousticModel(dim_in=8, dim_out=8), {})


@pytest.mark.parametrize('kwargs, match', [
    (dict(estimate_velocity=True), 'velocity'),
    (dict(fused_heads=True), 'fuse_acoustic_variables'),
])
def test_port_rejects_incompatible_of2_configs(ref_of2, kwargs, match):
    model = OnsetsFrames2(dim_in=48, profile=PianoProfile(),
                          model_complexity=2, **kwargs)

    with pytest.raises(ValueError, match=match):
        compat.port_reference_checkpoint(model, ref_of2.state_dict())


def test_port_rejects_online_model(ref_of2):
    from amt_tools_tpu.models import OnsetsFramesOnline

    model = OnsetsFramesOnline(dim_in=48, profile=PianoProfile(),
                               model_complexity=2)

    with pytest.raises(ValueError, match='unidirectional'):
        compat.port_reference_checkpoint(model, ref_of2.state_dict())


def test_port_rejects_fused_lms_model(ref_of2):
    model = OnsetsFrames2(dim_in=48, profile=PianoProfile(),
                          model_complexity=2, fused_lms=True)

    with pytest.raises(ValueError, match='fuse_lm_variables'):
        compat.port_reference_checkpoint(model, ref_of2.state_dict())
