"""Device-side decode ops must match the host (numpy) conversion library."""

import numpy as np
import pytest

import jax.numpy as jnp

from amt_tools_tpu import tools
from amt_tools_tpu.tools import utils
from amt_tools_tpu.tools.instrument import GuitarProfile, PianoProfile
from amt_tools_tpu.ops import decode


@pytest.fixture
def guitar():
    return GuitarProfile()


@pytest.fixture
def piano():
    return PianoProfile()


def test_threshold(rng):
    acts = rng.rand(4, 10).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(decode.threshold(jnp.asarray(acts), 0.5)),
                                  utils.threshold_activations(acts.copy(), 0.5))


def test_onsets_offsets_match_host(rng):
    mp = (rng.rand(12, 30) > 0.7).astype(np.float32)

    np.testing.assert_array_equal(
        np.asarray(decode.multi_pitch_to_onsets(jnp.asarray(mp))),
        utils.multi_pitch_to_onsets(mp))
    np.testing.assert_array_equal(
        np.asarray(decode.multi_pitch_to_offsets(jnp.asarray(mp))),
        utils.multi_pitch_to_offsets(mp))


def test_logistic_to_tablature_matches_host(guitar, rng):
    tabs = rng.randint(-1, guitar.num_pitches, (6, 15))
    logistic = utils.tablature_to_logistic(tabs, guitar, silence=True)

    device = decode.logistic_to_tablature(jnp.asarray(logistic), guitar, silence=True)
    host = utils.logistic_to_tablature(logistic, guitar, silence=True)

    np.testing.assert_array_equal(np.asarray(device), host)


def test_tablature_to_stacked_multi_pitch_matches_host(guitar, rng):
    tabs = rng.randint(-1, guitar.num_pitches, (6, 12))

    device = decode.tablature_to_stacked_multi_pitch(jnp.asarray(tabs), guitar)
    host = utils.tablature_to_stacked_multi_pitch(tabs, guitar)

    np.testing.assert_array_equal(np.asarray(device), host)


def test_stacked_multi_pitch_to_tablature_matches_host(guitar, rng):
    tabs = rng.randint(-1, guitar.num_pitches, (6, 12))
    smp = utils.tablature_to_stacked_multi_pitch(tabs, guitar)

    device = decode.stacked_multi_pitch_to_tablature(jnp.asarray(smp), guitar)
    host = utils.stacked_multi_pitch_to_tablature(smp, guitar)

    np.testing.assert_array_equal(np.asarray(device), host)


def test_stacked_multi_pitch_to_logistic_matches_host(guitar, rng):
    tabs = rng.randint(-1, guitar.num_pitches, (6, 9))
    smp = utils.tablature_to_stacked_multi_pitch(tabs, guitar)

    for silence in (False, True):
        device = decode.stacked_multi_pitch_to_logistic(jnp.asarray(smp), guitar,
                                                        silence=silence)
        host = utils.stacked_multi_pitch_to_logistic(smp, guitar, silence=silence)
        np.testing.assert_array_equal(np.asarray(device), host)


def test_note_segments_matches_host_decode(piano, rng):
    """Device note segmentation must reproduce the host note decoder."""

    mp = (rng.rand(88, 40) > 0.85).astype(np.float32)
    times = np.arange(40) * 0.02

    impulses, end_frames = decode.note_segments(jnp.asarray(mp))
    impulses = np.asarray(impulses)
    end_frames = np.asarray(end_frames)

    # Materialize notes on host from the device outputs
    times_ext = np.append(times, times[-1] + 0.02)
    ps, fs = np.nonzero(impulses)
    got = sorted(zip(ps + piano.low, times[fs], times_ext[end_frames[ps, fs]]))

    ref_p, ref_i = utils.multi_pitch_to_notes(mp, times, piano)
    ref = sorted(zip(ref_p.astype(int), ref_i[:, 0], ref_i[:, 1]))

    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        assert a[0] == b[0]
        np.testing.assert_allclose(a[1:], b[1:], atol=1e-9)


def test_pack_unpack_bits_roundtrip(rng):
    import jax.numpy as jnp

    for T in (16, 17, 23, 64):
        acts = (rng.rand(3, 5, T) > 0.5).astype(np.float32)
        packed = decode.pack_bits(jnp.asarray(acts))
        assert packed.shape == (3, 5, -(-T // 8))
        assert packed.dtype == jnp.uint8
        recovered = decode.unpack_bits(packed, T)
        np.testing.assert_array_equal(recovered, acts)
