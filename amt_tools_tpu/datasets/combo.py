"""Union of multiple transcription datasets.

Completes the reference's incomplete ``DatasetCombo``
(``amt_tools/datasets/combo.py:16-76``, marked untested in its README):
tracks are addressed globally across the constituent datasets.
"""

class DatasetCombo(object):
    """Present several datasets as one (concatenated track list)."""

    def __init__(self, datasets):
        if not datasets:
            raise ValueError('DatasetCombo requires at least one dataset.')

        self.datasets = datasets

        # Global track list: (dataset_index, track_id) addressing
        self.tracks = []
        self._owner = []
        for d_idx, dataset in enumerate(datasets):
            for track in dataset.tracks:
                self.tracks.append(track)
                self._owner.append(d_idx)

    def __len__(self):
        return len(self.tracks)

    def _dataset_for(self, index):
        return self.datasets[self._owner[index]]

    def __getitem__(self, index):
        return self.get_item(index)

    def get_item(self, index, rng=None):
        """Route ``TranscriptionDataset.get_item`` (explicit crop RNG —
        the DataLoader worker-prefetch protocol) to the owning dataset."""

        dataset = self._dataset_for(index)
        local_index = dataset.tracks.index(self.tracks[index])

        return dataset.get_item(local_index, rng=rng)

    def get_track_frames(self, track_id):
        """Route the batched-eval frame-count probe to the owning dataset."""

        for dataset in self.datasets:
            if track_id in dataset.tracks:
                return dataset.get_track_frames(track_id)

        raise KeyError(f'Track {track_id!r} not found in any dataset.')

    def get_track_data(self, track_id, **kwargs):
        """Route to whichever constituent dataset owns the track."""

        for dataset in self.datasets:
            if track_id in dataset.tracks:
                return dataset.get_track_data(track_id, **kwargs)

        raise KeyError(f'Track {track_id!r} not found in any dataset.')

    @classmethod
    def dataset_name(cls):
        return cls.__name__
