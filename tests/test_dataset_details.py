"""Dataset-layer detail tests: MAESTRO CSV splits, MAPS de-dup, combo routing."""

import os
import struct

import numpy as np
import pytest

from amt_tools_tpu import tools
from amt_tools_tpu.features import MelSpec
from amt_tools_tpu.datasets import MAPS, MAESTRO_V3, DatasetCombo, SyntheticPiano


def _vlq(value):
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def _write_midi(path, events, ticks_per_beat=480):
    track = b''
    for delta, msg in events:
        track += _vlq(delta) + msg
    track += _vlq(0) + b'\xff\x2f\x00'
    header = b'MThd' + struct.pack('>IHHH', 6, 0, 1, ticks_per_beat)
    with open(path, 'wb') as f:
        f.write(header + b'MTrk' + struct.pack('>I', len(track)) + track)


def _write_track(dir_path, name, fs=16000):
    t = np.arange(fs // 2) / fs
    audio = (0.4 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32)
    tools.write_wav(os.path.join(dir_path, f'{name}.wav'), audio, fs)
    _write_midi(os.path.join(dir_path, f'{name}.mid'), [
        (0, bytes([0x90, 60, 100])), (240, bytes([0x80, 60, 0]))])
    open(os.path.join(dir_path, f'{name}.txt'), 'w').close()


def test_maestro_csv_splits(tmp_path):
    """MAESTRO track listing is driven by the CSV metadata."""

    base = tmp_path / 'MAESTRO_V3'
    year_dir = base / '2018'
    os.makedirs(year_dir)

    # Two tracks: one train, one test (MAESTRO midi uses .midi extension)
    for name, split in [('piece_a', 'train'), ('piece_b', 'test')]:
        t = np.arange(8000) / 16000
        audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        tools.write_wav(str(year_dir / f'{name}.wav'), audio, 16000)
        _write_midi(str(year_dir / f'{name}.midi'),
                    [(0, bytes([0x90, 69, 90])), (240, bytes([0x80, 69, 0]))])

    with open(base / 'maestro-v3.0.0.csv', 'w') as f:
        f.write('canonical_composer,split,audio_filename\n')
        f.write('A,train,2018/piece_a.wav\n')
        f.write('B,test,2018/piece_b.wav\n')

    dataset = MAESTRO_V3(base_dir=str(base), splits=['train'],
                         data_proc=MelSpec(sample_rate=16000, hop_length=512,
                                           n_mels=32),
                         num_frames=None, store_data=False, save_data=False)

    assert dataset.tracks == ['2018/piece_a']

    data = dataset.get_track_data('2018/piece_a')
    assert tools.KEY_MULTIPITCH in data
    # The A4 note is present
    assert data[tools.KEY_MULTIPITCH][69 - dataset.profile.low].sum() > 0


def test_maps_remove_overlapping(tmp_path):
    """Pieces that appear in the test pianos are dropped from training."""

    base = tmp_path / 'MAPS'
    for piano in ['AkPnBcht', 'ENSTDkCl']:
        mus = base / piano / 'MUS'
        os.makedirs(mus)

    # Same piece on both pianos + one unique training piece
    _write_track(str(base / 'AkPnBcht' / 'MUS'), 'MAPS_MUS-shared_AkPnBcht')
    _write_track(str(base / 'AkPnBcht' / 'MUS'), 'MAPS_MUS-unique_AkPnBcht')
    _write_track(str(base / 'ENSTDkCl' / 'MUS'), 'MAPS_MUS-shared_ENSTDkCl')

    train_set = MAPS(base_dir=str(base), splits=['AkPnBcht'],
                     data_proc=MelSpec(sample_rate=16000, hop_length=512,
                                       n_mels=32),
                     num_frames=None, store_data=True, save_data=False)

    assert len(train_set.tracks) == 2
    train_set.remove_overlapping(['ENSTDkCl'])
    assert train_set.tracks == ['MAPS_MUS-unique_AkPnBcht']
    # RAM-stored data pruned too
    assert set(train_set.data.keys()) == {'MAPS_MUS-unique_AkPnBcht'}


def test_dataset_combo_get_track_data(tmp_path):
    mel = MelSpec(sample_rate=16000, hop_length=512, n_mels=32)

    a = SyntheticPiano(base_dir=str(tmp_path / 'a'), data_proc=mel,
                       num_frames=10, num_tracks=2, save_data=False,
                       splits=['train'])
    b = SyntheticPiano(base_dir=str(tmp_path / 'b'), data_proc=mel,
                       num_frames=10, num_tracks=2, save_data=False,
                       splits=['other'])

    combo = DatasetCombo([a, b])
    assert len(combo) == 4

    # Routing by track id works for both constituents
    data = combo.get_track_data(b.tracks[1])
    assert tools.KEY_FEATS in data

    with pytest.raises(KeyError):
        combo.get_track_data('nonexistent')
