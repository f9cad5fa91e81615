"""MAESTRO piano transcription dataset (V1/V2/V3).

Parity with the reference's ``amt_tools/datasets/MAESTRO.py:13-302``: CSV
split metadata, MIDI ground truth via the MAPS loader, and automatic download
of the official zips from Google Cloud Storage.
"""

import os

from .. import tools
from .maps import MAPS


class _MAESTRO(MAPS):
    """Either version of MAESTRO; ground-truth handling shared with MAPS."""

    # Overridable so tests can exercise the real download/unzip/re-root
    # chain against a local fixture server (reference semantics:
    # ``amt_tools/datasets/MAESTRO.py:176-302``)
    GCS_BASE = 'https://storage.googleapis.com/magentadata/datasets/maestro'

    def __init__(self, base_dir=None, splits=None, hop_length=512,
                 sample_rate=16000, data_proc=None, profile=None,
                 num_frames=None, audio_norm=-1, split_notes=False,
                 reset_data=False, store_data=False, save_data=True,
                 save_loc=None, seed=0, preload_workers=0):
        super().__init__(base_dir, splits, hop_length, sample_rate, data_proc,
                         profile, num_frames, audio_norm, split_notes,
                         reset_data, store_data, save_data, save_loc, seed,
                         preload_workers)

    def get_tracks(self, split):
        """Track names for a split from the dataset's CSV metadata."""

        import pandas as pd

        csv_file = [f for f in os.listdir(self.base_dir) if f.endswith('.csv')][0]
        csv_data = pd.read_csv(os.path.join(self.base_dir, csv_file))

        associations = list(csv_data['split'])
        tracks = list(csv_data['audio_filename'])
        tracks = [tracks[i] for i in range(len(tracks)) if associations[i] == split]
        tracks = sorted(os.path.splitext(track)[0] for track in tracks)

        return tracks

    def remove_overlapping(self, splits):
        raise NotImplementedError('MAESTRO splits are already disjoint.')

    def get_track_dir(self, track):
        raise NotImplementedError('MAESTRO tracks are addressed by year/name.')

    def get_wav_path(self, track):
        return os.path.join(self.base_dir, f'{track}.{tools.WAV_EXT}')

    def get_midi_path(self, track):
        return os.path.join(self.base_dir, f'{track}.{tools.MIDI_EXT}')

    @staticmethod
    def available_splits():
        """MAESTRO provides canonical train/validation/test partitions."""

        return ['train', 'validation', 'test']

    @classmethod
    def download(cls, save_dir):
        """Download the official zip from GCS and re-root the directory."""

        from .common import TranscriptionDataset

        TranscriptionDataset.download(save_dir)

        print(f'Downloading {cls.dataset_name()}')

        url = f'{cls.GCS_BASE}/{cls.url_version()}/{cls.url_version()}.zip'

        zip_path = os.path.join(save_dir, os.path.basename(url))

        tools.stream_url_resource(url, zip_path)
        tools.unzip_and_remove(zip_path)

        # The zip contains a version directory; re-root its contents
        tools.change_base_dir(save_dir, os.path.join(save_dir, cls.url_version()))

    @staticmethod
    def url_version():
        raise NotImplementedError


class MAESTRO_V1(_MAESTRO):
    """MAESTRO V1 (~1184 performances)."""

    @staticmethod
    def url_version():
        return 'maestro-v1.0.0'


class MAESTRO_V2(_MAESTRO):
    """MAESTRO V2 (~1282 performances)."""

    @staticmethod
    def url_version():
        return 'maestro-v2.0.0'


class MAESTRO_V3(_MAESTRO):
    """MAESTRO V3 (~1276 performances)."""

    @staticmethod
    def url_version():
        return 'maestro-v3.0.0'
