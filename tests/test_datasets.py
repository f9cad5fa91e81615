"""Dataset layer tests: synthetic data, slicing coherence, real-format ingestion."""

import json
import os
import struct

import numpy as np
import pytest

from amt_tools_tpu import tools
from amt_tools_tpu.features import MelSpec, CQT
from amt_tools_tpu.datasets import (SyntheticPiano, SyntheticGuitar, DataLoader,
                                    MAPS, GuitarSet, DatasetCombo, collate)


@pytest.fixture(scope='module')
def piano_set(tmp_path_factory):
    return SyntheticPiano(
        base_dir=str(tmp_path_factory.mktemp('synth_piano')),
        data_proc=MelSpec(sample_rate=16000, hop_length=512, n_mels=32),
        num_frames=20, num_tracks=3, track_duration=2.0, notes_per_track=6,
        save_data=False, store_data=True)


def test_synthetic_piano_ground_truth(piano_set):
    assert len(piano_set) == 3

    data = piano_set.get_track_data(piano_set.tracks[0], seq_length=None)
    # Whole track: 1 + N // hop frames
    num_samples = len(data[tools.KEY_AUDIO])
    expected_frames = 1 + num_samples // 512
    assert data[tools.KEY_MULTIPITCH].shape == (88, expected_frames)
    assert data[tools.KEY_FEATS].shape == (1, 32, expected_frames)
    assert data[tools.KEY_ONSETS].shape == (88, expected_frames)
    assert len(data[tools.KEY_TIMES]) == expected_frames
    # There are actual notes
    assert data[tools.KEY_MULTIPITCH].sum() > 0
    assert data[tools.KEY_NOTES].shape[1] == 3


def test_random_crop_coherence(piano_set):
    """A random crop must keep features/labels/audio frame-aligned."""

    data = piano_set[0]
    assert data[tools.KEY_FEATS].shape[-1] == 20
    assert data[tools.KEY_MULTIPITCH].shape[-1] == 20
    assert data[tools.KEY_TIMES].shape[-1] == 20
    assert len(data[tools.KEY_AUDIO]) == piano_set.seq_length
    # Unbatchable entries stripped
    assert tools.KEY_NOTES not in data
    assert tools.KEY_FS not in data
    # Times align with frame starts (snap to frame boundary)
    hop_secs = 512 / 16000
    assert abs((data[tools.KEY_TIMES][1] - data[tools.KEY_TIMES][0]) - hop_secs) < 1e-6


def test_crop_determinism_by_seed(tmp_path):
    kwargs = dict(base_dir=str(tmp_path),
                  data_proc=MelSpec(sample_rate=16000, hop_length=512, n_mels=32),
                  num_frames=10, num_tracks=2, save_data=False)

    a = SyntheticPiano(seed=5, **kwargs)
    b = SyntheticPiano(seed=5, **kwargs)
    np.testing.assert_array_equal(a[0][tools.KEY_FEATS], b[0][tools.KEY_FEATS])


def test_data_loader_batching(piano_set):
    loader = DataLoader(piano_set, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 3 tracks -> batches of 2 + 1
    assert batches[0][tools.KEY_FEATS].shape == (2, 1, 32, 20)
    assert batches[0][tools.KEY_MULTIPITCH].shape == (2, 88, 20)
    # Loader is re-iterable
    assert len(list(loader)) == 2


def test_data_loader_workers_deterministic(piano_set):
    """Worker-thread prefetch yields a batch stream that is a pure function
    of the loader seed (crop RNGs are seeded in the main thread), and the
    batches match the single-threaded layout."""

    def batches(num_workers):
        loader = DataLoader(piano_set, batch_size=2, shuffle=True, seed=3,
                            num_workers=num_workers)
        return list(loader), list(loader)  # two epochs: re-iterable

    (w1_a, w1_b) = batches(2)
    (w2_a, w2_b) = batches(2)

    for got, want in zip(w1_a + w1_b, w2_a + w2_b):
        assert set(got.keys()) == set(want.keys())
        for key in got:
            np.testing.assert_array_equal(np.asarray(got[key]),
                                          np.asarray(want[key]))

    # Same shapes/keys as the synchronous loader (crop draws differ: the
    # worker stream uses per-item seeds, documented)
    sync = list(DataLoader(piano_set, batch_size=2, shuffle=True, seed=3))
    assert len(w1_a) == len(sync)
    assert w1_a[0][tools.KEY_FEATS].shape == sync[0][tools.KEY_FEATS].shape
    assert w1_a[0][tools.KEY_MULTIPITCH].shape == \
        sync[0][tools.KEY_MULTIPITCH].shape


def test_crops_do_not_alias_the_ram_cache(piano_set):
    """Crops own their arrays: mutating a crop must not corrupt the
    dataset's stored track (the crop path shares the cache by reference
    and copies only the sliced window)."""

    track_id = piano_set.tracks[0]
    before = {k: np.array(v) for k, v in piano_set.data[track_id].items()
              if isinstance(v, np.ndarray)}

    crop = piano_set[0]
    for key in (tools.KEY_FEATS, tools.KEY_MULTIPITCH, tools.KEY_AUDIO):
        np.asarray(crop[key])[...] = -123.0

    after = piano_set.data[track_id]
    for key in before:
        np.testing.assert_array_equal(before[key], np.asarray(after[key]))


def test_get_track_frames_probe(piano_set):
    """The cheap frame-count probe equals the whole track's feature frames
    (from the frame algebra before features exist, from the cached feature
    matrix after)."""

    # Before any access: audio-only cache -> frame-algebra answer
    fresh = piano_set.get_track_frames(piano_set.tracks[-1])

    for track_id in piano_set.tracks:
        _ = piano_set[piano_set.tracks.index(track_id)]  # materialize feats
        cached = piano_set.data[track_id]
        want = np.asarray(cached[tools.KEY_FEATS]).shape[-1]
        assert piano_set.get_track_frames(track_id) == want

    assert fresh == piano_set.get_track_frames(piano_set.tracks[-1])


def test_synthetic_guitar(tmp_path):
    guitar_set = SyntheticGuitar(
        base_dir=str(tmp_path),
        data_proc=CQT(sample_rate=22050, hop_length=512, n_bins=72,
                      bins_per_octave=12, fmin=65.0),
        num_frames=12, num_tracks=2, save_data=False)

    data = guitar_set[0]
    assert data[tools.KEY_TABLATURE].shape == (6, 12)
    assert data[tools.KEY_FEATS].shape == (1, 72, 12)
    assert np.all(data[tools.KEY_TABLATURE] >= -1)


def test_feature_caching(tmp_path):
    dataset = SyntheticPiano(
        base_dir=str(tmp_path / 'data'),
        data_proc=MelSpec(sample_rate=16000, hop_length=512, n_mels=32),
        num_frames=10, num_tracks=1, save_data=True,
        save_loc=str(tmp_path / 'cache'))

    _ = dataset[0]
    feats_path = dataset.get_feats_dir(dataset.tracks[0])
    assert os.path.exists(feats_path)

    # Cached features load identically
    cached = tools.load_dict_npz(feats_path)
    assert cached[tools.KEY_FS].item() == 16000


##################################################
# Real-format ingestion (constructed fixtures)   #
##################################################


def _vlq(value):
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def _write_midi(path, note_events, ticks_per_beat=480):
    track = b''
    for delta, msg in note_events:
        track += _vlq(delta) + msg
    track += _vlq(0) + b'\xff\x2f\x00'
    header = b'MThd' + struct.pack('>IHHH', 6, 0, 1, ticks_per_beat)
    with open(path, 'wb') as f:
        f.write(header + b'MTrk' + struct.pack('>I', len(track)) + track)


def _build_mini_maps(root):
    """A MAPS-format directory with one piano and one piece."""

    mus_dir = os.path.join(root, 'AkPnBcht', 'MUS')
    os.makedirs(mus_dir)

    track = 'MAPS_MUS-test_AkPnBcht'
    fs = 16000

    # 1-second C4 note recording
    t = np.arange(fs) / fs
    audio = (0.4 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32)
    tools.write_wav(os.path.join(mus_dir, f'{track}.wav'), audio, fs)

    # Matching MIDI: C4 from 0 to 0.5 s (480 ticks at 120 bpm = 0.5 s)
    _write_midi(os.path.join(mus_dir, f'{track}.mid'), [
        (0, bytes([0x90, 60, 100])),
        (480, bytes([0x80, 60, 0])),
    ])
    # Empty txt to mimic the triple-file layout
    open(os.path.join(mus_dir, f'{track}.txt'), 'w').close()

    return track


def test_maps_format_ingestion(tmp_path):
    track = _build_mini_maps(str(tmp_path / 'MAPS'))

    dataset = MAPS(base_dir=str(tmp_path / 'MAPS'), splits=['AkPnBcht'],
                   data_proc=MelSpec(sample_rate=16000, hop_length=512, n_mels=32),
                   num_frames=None, store_data=True, save_data=True,
                   save_loc=str(tmp_path / 'cache'))

    assert dataset.tracks == [track]

    data = dataset.get_track_data(track)
    assert tools.KEY_MULTIPITCH in data
    # The C4 note is active in the first ~0.5 s
    row = data[tools.KEY_MULTIPITCH][60 - dataset.profile.low]
    assert row[:10].sum() > 5
    assert row[20:].sum() == 0
    # Onset map has exactly one onset for this pitch region... (ambiguity pads frames)
    assert data[tools.KEY_ONSETS].sum() >= 1

    # Ground-truth cache was written and reloads identically
    dataset2 = MAPS(base_dir=str(tmp_path / 'MAPS'), splits=['AkPnBcht'],
                    data_proc=MelSpec(sample_rate=16000, hop_length=512, n_mels=32),
                    num_frames=None, store_data=True, save_data=True,
                    save_loc=str(tmp_path / 'cache'))
    data2 = dataset2.get_track_data(track)
    np.testing.assert_array_equal(data[tools.KEY_MULTIPITCH], data2[tools.KEY_MULTIPITCH])


def _build_mini_guitarset(root):
    """A GuitarSet-format directory with one annotated track."""

    os.makedirs(os.path.join(root, 'annotation'))
    os.makedirs(os.path.join(root, 'audio_mono-mic'))

    track = '00_Test-Track_comp'
    fs = 44100

    t = np.arange(fs) / fs
    audio = (0.3 * np.sin(2 * np.pi * 196.0 * t)).astype(np.float32)
    tools.write_wav(os.path.join(root, 'audio_mono-mic', f'{track}_mic.wav'),
                    audio, fs)

    # Per-string JAMS: one note on string 2 (D) and one on string 5 (e)
    jam = {
        'file_metadata': {'duration': 1.0},
        'annotations': [
            {'namespace': 'note_midi',
             'annotation_metadata': {'data_source': str(s)},
             'data': ([{'time': 0.1, 'duration': 0.4, 'value': float(pitch),
                        'confidence': None}] if pitch else [])}
            for s, pitch in enumerate([None, None, 55, None, None, 67])
        ],
    }
    with open(os.path.join(root, 'annotation', f'{track}.jams'), 'w') as f:
        json.dump(jam, f)

    return track


def test_guitarset_format_ingestion(tmp_path):
    track = _build_mini_guitarset(str(tmp_path / 'GuitarSet'))

    dataset = GuitarSet(base_dir=str(tmp_path / 'GuitarSet'), splits=['00'],
                        data_proc=CQT(sample_rate=22050, hop_length=512,
                                      n_bins=72, bins_per_octave=12, fmin=65.0),
                        sample_rate=22050, num_frames=None, store_data=True,
                        save_data=False)

    assert dataset.tracks == [track]

    data = dataset.get_track_data(track)
    tabs = data[tools.KEY_TABLATURE]
    assert tabs.shape[0] == 6
    # String 2 (D3=50) plays MIDI 55 -> fret 5; string 5 (E4=64) plays 67 -> fret 3
    active_2 = tabs[2][tabs[2] >= 0]
    active_5 = tabs[5][tabs[5] >= 0]
    assert len(active_2) and np.all(active_2 == 5)
    assert len(active_5) and np.all(active_5 == 3)
    # Other strings silent
    assert np.all(tabs[0] == -1)


def test_dataset_combo(piano_set, tmp_path):
    other = SyntheticPiano(
        base_dir=str(tmp_path),
        data_proc=MelSpec(sample_rate=16000, hop_length=512, n_mels=32),
        num_frames=20, num_tracks=2, save_data=False,
        splits=None, seed=9)
    # Rename tracks so they are distinct
    combo = DatasetCombo([piano_set, other])

    assert len(combo) == 5
    data = combo[4]
    assert data[tools.KEY_FEATS].shape[-1] == 20


def test_collate_mixed():
    samples = [{'a': np.ones((2, 3)), 'name': 'x'},
               {'a': np.zeros((2, 3)), 'name': 'y'}]
    batch = collate(samples)
    assert batch['a'].shape == (2, 2, 3)
    assert batch['name'] == ['x', 'y']


def test_synthetic_difficulty_knobs():
    """Noise/reverb/velocity/timbre degrade audio but not ground truth."""

    import numpy as np
    from amt_tools_tpu.datasets.synthetic import (SyntheticPiano, render_notes,
                                                  add_room)
    from amt_tools_tpu import tools

    clean = SyntheticPiano(num_tracks=1, track_duration=2.0, save_data=False,
                           store_data=False)
    hard = SyntheticPiano(num_tracks=1, track_duration=2.0, save_data=False,
                          store_data=False, noise_snr_db=10.0,
                          reverb_time=0.3, velocity_range=(0.4, 1.0),
                          timbre_jitter=0.3)

    track = clean.get_tracks('train')[0]
    d_clean, d_hard = clean.load(track), hard.load(track)

    # Same exact ground truth, different (degraded) audio
    np.testing.assert_array_equal(d_clean[tools.KEY_NOTES],
                                  d_hard[tools.KEY_NOTES])
    np.testing.assert_array_equal(d_clean[tools.KEY_MULTIPITCH],
                                  d_hard[tools.KEY_MULTIPITCH])
    assert d_clean[tools.KEY_AUDIO].shape == d_hard[tools.KEY_AUDIO].shape
    assert not np.allclose(d_clean[tools.KEY_AUDIO], d_hard[tools.KEY_AUDIO])

    # Noise floor is audible in silence: the hard track has no silent samples
    silence = np.abs(d_hard[tools.KEY_AUDIO])[:100]
    assert np.all(silence > 0)

    # add_room SNR is calibrated: measure achieved SNR on a pure tone
    rng = np.random.RandomState(0)
    tone = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    noisy = add_room(tone, 16000, rng, noise_snr_db=20.0)
    scale = np.max(np.abs(noisy)) / 1.0  # renormalization factor if clipped
    noise = noisy.astype(np.float64) - tone * (np.dot(noisy, tone) / np.dot(tone, tone))
    achieved = 10 * np.log10(np.mean(tone ** 2) / np.mean(noise ** 2))
    assert 17.0 < achieved < 23.0

    # velocity variation changes relative note loudness deterministically
    p = np.array([60.0, 60.0])
    i = np.array([[0.0, 0.4], [1.0, 1.4]])
    a = render_notes(p, i, 16000, 2.0, seed=3, velocity_range=(0.2, 1.0))
    e1 = np.sqrt(np.mean(a[:6400] ** 2))
    e2 = np.sqrt(np.mean(a[16000:22400] ** 2))
    assert abs(e1 - e2) / max(e1, e2) > 0.05
