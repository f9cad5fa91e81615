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


def test_notes_on_device_bitexact_vs_host(piano, rng):
    """Device compact-buffer decode == tools.multi_pitch_to_notes exactly."""
    import jax
    import jax.numpy as jnp

    for trial in range(4):
        mp = (rng.rand(piano.get_range_len(), 50) > 0.9).astype(np.float32)
        times = np.arange(50) * 0.032

        onsets = None
        if trial % 2:
            # Onset-gated decode path: sparse onsets within active regions
            onsets = mp * (rng.rand(*mp.shape) > 0.5)

        fn = jax.jit(lambda m, o: decode.notes_on_device(m, o, capacity=2048))
        rows, on, off, count = fn(jnp.asarray(mp),
                                  None if onsets is None else jnp.asarray(onsets))
        got_p, got_i = decode.notes_from_device(rows, on, off, count,
                                                times, piano)

        ref_p, ref_i = utils.multi_pitch_to_notes(mp, times, piano,
                                                  onsets=onsets)

        np.testing.assert_array_equal(got_p, ref_p)
        np.testing.assert_array_equal(got_i, ref_i)


def test_notes_on_device_empty_and_overflow(piano):
    import jax.numpy as jnp

    # Empty map -> zero notes
    mp = np.zeros((piano.get_range_len(), 10), dtype=np.float32)
    rows, on, off, count = decode.notes_on_device(jnp.asarray(mp), capacity=8)
    p, i = decode.notes_from_device(rows, on, off, count,
                                    np.arange(10) * 0.01, piano)
    assert len(p) == 0 and i.shape == (0, 2)

    # Overflow: more notes than capacity -> warn + truncate
    mp = np.zeros((piano.get_range_len(), 10), dtype=np.float32)
    mp[:6, 2] = 1.0  # six simultaneous one-frame notes
    rows, on, off, count = decode.notes_on_device(jnp.asarray(mp), capacity=4)
    assert int(count) == 6
    with pytest.warns(UserWarning, match='overflow'):
        p, i = decode.notes_from_device(rows, on, off, count,
                                        np.arange(10) * 0.01, piano)
    assert len(p) == 4


def test_notes_on_device_vmap_batch(piano, rng):
    """Batched decode via vmap matches per-example host decode."""
    import jax
    import jax.numpy as jnp

    batch = (rng.rand(3, piano.get_range_len(), 30) > 0.92).astype(np.float32)
    times = np.arange(30) * 0.032

    fn = jax.jit(jax.vmap(lambda m: decode.notes_on_device(m, capacity=1024)))
    rows, on, off, counts = fn(jnp.asarray(batch))

    for b in range(3):
        got_p, got_i = decode.notes_from_device(rows[b], on[b], off[b],
                                                counts[b], times, piano)
        ref_p, ref_i = utils.multi_pitch_to_notes(batch[b], times, piano)
        np.testing.assert_array_equal(got_p, ref_p)
        np.testing.assert_array_equal(got_i, ref_i)
