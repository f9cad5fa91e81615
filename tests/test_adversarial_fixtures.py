"""Foreign-format fixture parsing: hand-derived expectations.

The fixtures in ``tests/fixtures/`` are adversarial real-corpus shapes the
library's own writers never produce (see ``fixtures/generate_fixtures.py``).
Every expected value below is derived by hand from the fixture bytes, not
from the code under test. Reference behaviors: MIDI at
``amt_tools/tools/io.py:426-529`` (via mido, incl. SMPTE division), JAMS at
``amt_tools/tools/io.py:90-424``.
"""

import os

import numpy as np
import pytest

from amt_tools_tpu.tools import io as tio
from amt_tools_tpu.tools import midi as midi_mod

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'fixtures')


class TestFormat1Interleaved:
    """Format-1 SMF: 3 track chunks, 2 channels, mid-file tempo change,
    running status, vel-0 note-offs, cross-channel sustain pedal."""

    @pytest.fixture(scope='class')
    def notes(self):
        return tio.load_notes_midi(os.path.join(FIXTURES, 'format1_interleaved.mid'))

    def test_note_count_and_pitches(self, notes):
        # 4 real notes; program change and pitch bend must be skipped
        assert notes.shape == (4, 4)
        # Onset order of appearance across the merged tracks
        np.testing.assert_array_equal(notes[:, 2], [60, 55, 64, 48])
        np.testing.assert_array_equal(notes[:, 3], [100, 80, 90, 70])

    def test_tempo_map_applied_across_tracks(self, notes):
        # 1/960 s per tick until tick 960, 1/1920 s per tick after
        np.testing.assert_allclose(notes[:, 0], [0.0, 0.125, 0.25, 1.125],
                                   atol=1e-9)

    def test_sustain_extends_across_channels(self, notes):
        # Sustain ON @tick 300, OFF @tick 1100 (= 1.0 + 140/1920 s).
        # All three notes released while the pedal is down extend to it,
        # including the channel-1 note (the reference's pedal handling is
        # channel-agnostic); the post-pedal note keeps its real offset.
        pedal_up = 1.0 + 140.0 / 1920.0
        np.testing.assert_allclose(notes[:, 1],
                                   [pedal_up, pedal_up, pedal_up, 1.25],
                                   atol=1e-9)


class TestSMPTEDivision:
    """SMPTE time division: absolute timing, tempo events ignored."""

    @pytest.fixture(scope='class')
    def notes(self):
        return tio.load_notes_midi(os.path.join(FIXTURES, 'smpte_25fps.mid'))

    def test_absolute_timing(self, notes):
        # 25 fps x 40 ticks/frame = 1000 ticks/s; the set_tempo event in the
        # file must have no effect
        assert notes.shape == (2, 4)
        np.testing.assert_allclose(notes[0], [0.5, 1.5, 69, 100], atol=1e-9)
        np.testing.assert_allclose(notes[1], [2.0, 2.25, 72, 90], atol=1e-9)

    def test_event_times(self):
        events = midi_mod.parse_midi_events(
            os.path.join(FIXTURES, 'smpte_25fps.mid'))
        note_ons = [e for e in events if e['type'] == 'note_on']
        np.testing.assert_allclose([e['time'] for e in note_ons], [0.5, 2.0],
                                   atol=1e-9)


class TestGuitarSetStyleJAMS:
    """GuitarSet-corpus-shaped JAMS: full annotation metadata, extra
    namespaces, float MIDI pitches, unvoiced/zero contour observations."""

    @pytest.fixture(scope='class')
    def path(self):
        return os.path.join(FIXTURES, 'guitarset_style.jams')

    def test_duration(self, path):
        assert tio.load_duration_jams(path) == 3.0

    def test_stacked_notes(self, path):
        stacked = tio.load_stacked_notes_jams(path)

        # Exactly the two note_midi annotations, keyed by data_source;
        # beat_position / tempo / chord / pitch_contour must not leak in
        assert set(stacked.keys()) == {'0', '1'}

        p0, i0 = stacked['0']
        np.testing.assert_allclose(p0, [40.123, 45.0])
        np.testing.assert_allclose(i0, [[0.52, 1.03], [2.0, 2.5]], atol=1e-12)

        p1, i1 = stacked['1']
        np.testing.assert_allclose(p1, [45.21])
        np.testing.assert_allclose(i1, [[0.1, 0.35]], atol=1e-12)

    def test_stacked_pitch_list_raw(self, path):
        stacked = tio.load_stacked_pitch_list_jams(path, uniform=False)

        assert set(stacked.keys()) == {'0', '1'}

        t0, pl0 = stacked['0']
        np.testing.assert_allclose(t0, [0.00, 0.01, 0.02, 0.03])
        # Unvoiced and zero-frequency observations become empty entries
        assert len(pl0[0]) == 0 and len(pl0[2]) == 0
        np.testing.assert_allclose(pl0[1], [190.0])
        np.testing.assert_allclose(pl0[3], [195.0])

        t1, pl1 = stacked['1']
        # Out-of-order observations are sorted
        np.testing.assert_allclose(t1, [0.10, 0.11])
        np.testing.assert_allclose(pl1[0], [110.0])
        np.testing.assert_allclose(pl1[1], [112.0])

    def test_tablature_conversion_end_to_end(self, path):
        """The fixture drives the same pipeline GuitarSet.load uses:
        stacked notes -> stacked multi pitch -> tablature."""

        from amt_tools_tpu import tools

        profile = tools.GuitarProfile(num_frets=19)
        stacked = tio.load_stacked_notes_jams(path)
        # Dataset ordering: string index order
        stacked = {k: stacked[k] for k in sorted(stacked.keys())}

        times = tools.get_frame_times(3 * 22050, 22050, 512)
        smp = tools.stacked_notes_to_stacked_multi_pitch(stacked, times, profile)

        assert smp.shape[0] == 2

        # String 0 (low E, open = MIDI 40): pitch 40.123 rounds to fret 0,
        # 45.0 is fret 5. String 1 (A, open = 45): 45.21 rounds to fret 0.
        frame_06 = int(0.6 * 22050 / 512)   # inside the first note only
        pitch_axis = np.arange(profile.low, profile.high + 1)
        active0 = pitch_axis[smp[0, :, frame_06] > 0]
        np.testing.assert_array_equal(active0, [40])

        frame_22 = int(2.2 * 22050 / 512)
        active0 = pitch_axis[smp[0, :, frame_22] > 0]
        np.testing.assert_array_equal(active0, [45])

        frame_02 = int(0.2 * 22050 / 512)
        active1 = pitch_axis[smp[1, :, frame_02] > 0]
        np.testing.assert_array_equal(active1, [45])


class TestAdversarialMIDIThroughMAPSLoader:
    """The committed format-1 interleaved SMF driven through the real MAPS
    dataset class (wav+mid+txt layout, gt caching, velocity map)."""

    @pytest.fixture(scope='class')
    def dataset_and_track(self, tmp_path_factory):
        import shutil

        from amt_tools_tpu import tools
        from amt_tools_tpu.datasets import MAPS
        from amt_tools_tpu.features import MelSpec

        root = tmp_path_factory.mktemp('maps_adversarial')
        mus_dir = os.path.join(str(root), 'MAPS', 'AkPnBcht', 'MUS')
        os.makedirs(mus_dir)

        track = 'MAPS_MUS-fixture_AkPnBcht'
        shutil.copy(os.path.join(FIXTURES, 'format1_interleaved.mid'),
                    os.path.join(mus_dir, f'{track}.mid'))

        fs = 16000
        audio = np.random.RandomState(0).randn(int(1.5 * fs)).astype(np.float32) * 0.1
        tools.write_wav(os.path.join(mus_dir, f'{track}.wav'), audio, fs)
        open(os.path.join(mus_dir, f'{track}.txt'), 'w').close()

        dataset = MAPS(base_dir=os.path.join(str(root), 'MAPS'),
                       splits=['AkPnBcht'],
                       data_proc=MelSpec(sample_rate=fs, hop_length=512,
                                         n_mels=32),
                       num_frames=None, store_data=True, save_data=False)

        return dataset, track

    def test_notes_and_velocity_ground_truth(self, dataset_and_track):
        from amt_tools_tpu import tools

        dataset, track = dataset_and_track
        data = dataset.get_track_data(track)

        # Hand-derived notes (see TestFormat1Interleaved)
        batched = np.asarray(data[tools.KEY_NOTES]).reshape(-1, 3)
        np.testing.assert_array_equal(batched[:, 2], [60, 55, 64, 48])
        pedal_up = 1.0 + 140.0 / 1920.0
        np.testing.assert_allclose(batched[:, 0], [0.0, 0.125, 0.25, 1.125],
                                   atol=1e-9)
        np.testing.assert_allclose(batched[:, 1],
                                   [pedal_up, pedal_up, pedal_up, 1.25],
                                   atol=1e-9)

        # Velocity map: normalized MIDI velocities on the note spans
        vmap_ = data[tools.KEY_VELOCITY]
        got = tools.extract_note_velocities(batched, vmap_,
                                            data[tools.KEY_TIMES]
                                            if tools.KEY_TIMES in data else
                                            tools.get_frame_times(
                                                int(1.5 * 16000), 16000, 512),
                                            dataset.profile)
        np.testing.assert_allclose(got, np.array([100, 80, 90, 70]) / 127.0)

        # Multi-pitch active where the (sustained) notes are
        mp = data[tools.KEY_MULTIPITCH]
        c4_row = mp[60 - dataset.profile.low]
        assert c4_row[0] == 1.0              # active from t=0
        assert c4_row.sum() > 30             # sustained past one second
