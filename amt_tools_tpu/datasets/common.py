"""Transcription dataset base class and batch loader.

Capability parity with the reference's ``amt_tools/datasets/common.py:29-548``
(init pipeline: base dir -> auto-download -> splits -> default features ->
default profile -> seq_length from the frame algebra -> seeded RNG -> optional
RAM preload; ``__getitem__`` returning random label-coherent fixed-length
crops; per-track npz caching of features and ground truth), without the torch
``Dataset``/``DataLoader`` machinery — :class:`DataLoader` here is a small
native collator producing numpy batch dicts ready for ``jax.device_put``.
"""

import os
import shutil
import warnings
from abc import abstractmethod

import numpy as np

from .. import tools


class TranscriptionDataset(object):
    """Generic music transcription dataset."""

    def __init__(self, base_dir, splits, hop_length, sample_rate, data_proc,
                 profile, num_frames, audio_norm, split_notes, reset_data,
                 store_data, save_data, save_loc, seed, preload_workers=0):
        if base_dir is None:
            base_dir = os.path.join(tools.DEFAULT_DATASETS_DIR, self.dataset_name())
        self.base_dir = base_dir

        if not os.path.isdir(self.base_dir):
            warnings.warn(f"Could not find dataset at specified path "
                          f"'{self.base_dir}'. Attempting to download...",
                          category=RuntimeWarning)
            self.download(self.base_dir)

        if splits is None:
            splits = self.available_splits()
        self.splits = splits

        self.hop_length = hop_length
        self.sample_rate = sample_rate

        if data_proc is None:
            from ..features import STFT
            data_proc = STFT(hop_length=self.hop_length,
                             sample_rate=self.sample_rate)
        self.data_proc = data_proc

        if profile is None:
            profile = tools.PianoProfile()
        self.profile = profile

        if num_frames is None:
            # Transcribe whole tracks at a time
            self.seq_length = None
        else:
            # Maximum number of samples producing the desired frame count
            self.seq_length = int(max(self.data_proc.get_sample_range(num_frames)))
        self.num_frames = num_frames

        self.audio_norm = audio_norm
        self.split_notes = split_notes

        self.store_data = store_data
        self.save_data = save_data
        if save_loc is None:
            save_loc = tools.DEFAULT_FEATURES_GT_DIR
        self.save_loc = save_loc

        self.reset_data = reset_data
        if os.path.exists(self.get_gt_dir()) and self.reset_data:
            shutil.rmtree(self.get_gt_dir())
        if self.save_data:
            os.makedirs(self.get_gt_dir(), exist_ok=True)

        if os.path.exists(self.get_feats_dir()) and self.reset_data:
            shutil.rmtree(self.get_feats_dir())
        if self.save_data:
            os.makedirs(self.get_feats_dir(), exist_ok=True)

        self.rng = np.random.RandomState(seed)

        self.tracks = []
        for split in self.splits:
            self.tracks += self.get_tracks(split)

        if self.store_data:
            self.data = {}
            if preload_workers and len(self.tracks) > 1:
                # Parallel ground-truth preload: WAV decode + annotation
                # parsing are independent per track (host-side CPU work)
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=preload_workers) as pool:
                    for track, data in zip(self.tracks,
                                           pool.map(self.load, self.tracks)):
                        self.data[track] = self._freeze_cached(data)
            else:
                for track in self.tracks:
                    self.data[track] = self._freeze_cached(self.load(track))

    @staticmethod
    def _freeze_cached(data):
        """Mark cached numpy arrays read-only before they enter the RAM cache.

        ``get_track_data`` hands whole-track entries out by reference (a deep
        copy per crop was the dominant host cost of the training loop), so an
        accidental in-place mutation downstream would corrupt the cache for
        every later epoch. Clearing the writeable flag turns that silent
        corruption into an immediate ValueError.
        """

        for value in (data or {}).values():
            if isinstance(value, np.ndarray):
                value.flags.writeable = False

        return data

    def __len__(self):
        return len(self.tracks)

    def __getitem__(self, index):
        """A random fixed-length slice of the indexed track, batch-ready."""

        return self.get_item(index)

    def get_item(self, index, rng=None):
        """:meth:`__getitem__` with an explicit crop RNG.

        ``rng`` (a ``np.random.RandomState``) draws the crop start instead
        of the dataset's shared RNG — this is what makes the DataLoader's
        worker-thread prefetch deterministic: each item's RNG is seeded in
        the main thread, so crops are independent of thread scheduling.
        """

        track_id = self.tracks[index]

        data = self.get_track_data(track_id, rng=rng)

        # copy=False: crop entries are fresh by construction (slice_track /
        # the audio slice), so re-copying matching-dtype arrays here would
        # be pure overhead in the loader hot path
        data = tools.dict_to_dtype(data, dtype=tools.FLOAT32, copy=False)

        # Remove unbatchable entries
        for key in (tools.KEY_NOTES, tools.KEY_PITCHLIST, tools.KEY_FS):
            if tools.query_dict(data, key):
                data.pop(key)

        return data

    def calculate_feats(self, data):
        """Compute (or load cached) features for a track."""

        if isinstance(data, dict):
            data = dict(data)  # new dict; entries shared (keys only added)
        else:
            data = {tools.KEY_TRACK: data}

        track = data[tools.KEY_TRACK]

        feats_path = self.get_feats_dir(track)

        if self.save_data and os.path.exists(feats_path):
            feats_dict = tools.load_dict_npz(feats_path)
            feats = feats_dict[tools.KEY_FEATS]
            feats = feats.item() if feats.size == 1 else feats

            fs = feats_dict[tools.KEY_FS].item()
            hop_length = feats_dict[tools.KEY_HOP].item()
        else:
            feats = self.data_proc.process_audio(data[tools.KEY_AUDIO])

            fs = self.data_proc.get_sample_rate()
            hop_length = self.data_proc.get_hop_length()

            if self.save_data:
                os.makedirs(os.path.dirname(feats_path), exist_ok=True)
                tools.save_dict_npz(feats_path, {tools.KEY_FS: fs,
                                                 tools.KEY_HOP: hop_length,
                                                 tools.KEY_FEATS: feats})

        if self.sample_rate != fs or self.hop_length != hop_length:
            warnings.warn("Loaded features' sampling rate or hop length "
                          'differs from expected.', category=RuntimeWarning)

        if tools.query_dict(data, tools.KEY_TIMES):
            times = data[tools.KEY_TIMES]
        else:
            times = self.data_proc.get_times(data[tools.KEY_AUDIO])
            data[tools.KEY_TIMES] = times

        if feats is not None:
            data[tools.KEY_FEATS] = feats

        if self.store_data:
            if feats is not None:
                self.data[track][tools.KEY_FEATS] = feats
            self.data[track][tools.KEY_TIMES] = times
            self._freeze_cached(self.data[track])

        return data

    def get_track_data(self, track_id, sample_start=None, seq_length=None,
                       snap_to_frame=True, rng=None):
        """Features + ground truth for a track, optionally sliced coherently.

        The returned dict is fresh, but full-length entries reference the
        RAM cache directly when ``store_data`` (a deep copy per crop copies
        the whole track's audio + features to slice out ~2% of them —
        measured as the dominant host cost of the training loop). Cropped
        array entries are always fresh copies; callers must not mutate
        whole-track array entries in place.

        ``rng`` overrides the dataset RNG for the random crop draw (used by
        the DataLoader's deterministic worker prefetch).
        """

        if self.store_data:
            data = dict(self.data[track_id])
        else:
            data = self.load(track_id)

        if tools.KEY_FEATS not in data.keys():
            data.update(self.calculate_feats(data))

        if seq_length is None:
            if self.seq_length is not None:
                seq_length = self.seq_length
            else:
                # Whole track requested
                return data

        if sample_start is None:
            max_start = max(1, len(data[tools.KEY_AUDIO]) - seq_length)
            sample_start = (rng if rng is not None
                            else self.rng).randint(0, max_start)

        frame_start = sample_start // self.hop_length
        frame_end = frame_start + self.num_frames

        if snap_to_frame:
            sample_start = frame_start * self.hop_length

        sample_end = sample_start + seq_length

        # Fresh O(crop) copy (not a view into the RAM cache)
        data[tools.KEY_AUDIO] = np.array(
            data[tools.KEY_AUDIO][..., sample_start: sample_end])

        sec_start = sample_start / self.sample_rate
        sec_stop = sample_end / self.sample_rate

        if tools.query_dict(data, tools.KEY_NOTES):
            if isinstance(data[tools.KEY_NOTES], dict):
                # Stacked notes: slice each slice's batched representation
                temp = tools.apply_func_stacked_representation(
                    data[tools.KEY_NOTES],
                    lambda v: tools.notes_to_batched_notes(*v))
                temp = tools.apply_func_stacked_representation(
                    temp, tools.slice_batched_notes,
                    start_time=sec_start, stop_time=sec_stop)
                data[tools.KEY_NOTES] = tools.apply_func_stacked_representation(
                    temp, tools.batched_notes_to_notes)
            else:
                data[tools.KEY_NOTES] = tools.slice_batched_notes(
                    data[tools.KEY_NOTES], sec_start, sec_stop)

        if tools.query_dict(data, tools.KEY_PITCHLIST):
            if isinstance(data[tools.KEY_PITCHLIST], dict):
                data[tools.KEY_PITCHLIST] = tools.apply_func_stacked_representation(
                    data[tools.KEY_PITCHLIST],
                    lambda v: tools.slice_pitch_list(*v, start_time=sec_start,
                                                     stop_time=sec_stop))
            else:
                data[tools.KEY_PITCHLIST] = tools.slice_pitch_list(
                    *data[tools.KEY_PITCHLIST], sec_start, sec_stop)

        skipped_keys = [tools.KEY_AUDIO, tools.KEY_FS, tools.KEY_NOTES,
                        tools.KEY_PITCHLIST]
        data = tools.slice_track(data, frame_start, frame_end, skipped_keys)

        return data

    def get_track_frames(self, track_id):
        """A track's whole-track feature frame count, as cheaply as possible.

        Used by batched evaluation to group tracks by padded length without
        materializing every track's features twice (the grouping pass +
        the per-chunk load). RAM-cached features/audio answer from their
        shapes via the feature module's frame algebra; otherwise the track
        is loaded once (the status quo cost).
        """

        if self.store_data and track_id in getattr(self, 'data', {}):
            data = self.data[track_id]
            if tools.query_dict(data, tools.KEY_FEATS):
                return int(np.asarray(data[tools.KEY_FEATS]).shape[-1])
            if tools.query_dict(data, tools.KEY_AUDIO):
                return int(self.data_proc.get_expected_frames(
                    data[tools.KEY_AUDIO]))

        data = self.load(track_id)
        if tools.query_dict(data, tools.KEY_FEATS):
            return int(np.asarray(data[tools.KEY_FEATS]).shape[-1])
        if tools.query_dict(data, tools.KEY_AUDIO):
            # Frame algebra on the audio length — do NOT compute features
            # just for a shape (the probe exists to avoid double feature
            # work on disk-backed datasets)
            return int(self.data_proc.get_expected_frames(
                data[tools.KEY_AUDIO]))

        data.update(self.calculate_feats(data))
        return int(np.asarray(data[tools.KEY_FEATS]).shape[-1])

    @abstractmethod
    def get_tracks(self, split):
        """Track names associated with a dataset partition."""

        raise NotImplementedError

    @abstractmethod
    def load(self, track):
        """Ground truth for a track, loading the npz cache when present."""

        data = None

        gt_path = self.get_gt_dir(track)

        if self.save_data and os.path.exists(gt_path):
            data = tools.load_dict_npz(gt_path)

            if self.sample_rate != data[tools.KEY_FS].item():
                warnings.warn("Loaded track's sampling rate differs from "
                              'expected.', category=RuntimeWarning)

        if data is None:
            data = {}
        else:
            if tools.query_dict(data, tools.KEY_NOTES) and \
                    data[tools.KEY_NOTES].dtype == object:
                data[tools.KEY_NOTES] = tools.unpack_stacked_representation(
                    data[tools.KEY_NOTES])
            if tools.query_dict(data, tools.KEY_PITCHLIST) and \
                    data[tools.KEY_PITCHLIST].dtype == object:
                data[tools.KEY_PITCHLIST] = tools.unpack_stacked_representation(
                    data[tools.KEY_PITCHLIST])

        data[tools.KEY_TRACK] = track

        return data

    def get_gt_dir(self, track=None):
        """Ground-truth cache directory (or one track's cache path)."""

        path = os.path.join(self.save_loc, self.dataset_name(), tools.GROUND_TRUTH_DIR)

        if track is not None:
            path = os.path.join(path, f'{track}.{tools.NPZ_EXT}')

        return path

    def get_feats_dir(self, track=None):
        """Feature cache directory (keyed by the feature module's name)."""

        path = os.path.join(self.save_loc, self.dataset_name(),
                            self.data_proc.features_name())

        if track is not None:
            path = os.path.join(path, f'{track}.{tools.NPZ_EXT}')

        return path

    @staticmethod
    @abstractmethod
    def available_splits():
        """Supported partitions for the dataset."""

        raise NotImplementedError

    @classmethod
    def dataset_name(cls):
        """Class-name tag for the dataset (used in cache paths)."""

        return cls.__name__

    @staticmethod
    def download(save_dir):
        """Prepare a fresh directory for a download (extended by children)."""

        if os.path.isdir(save_dir):
            shutil.rmtree(save_dir)

        os.makedirs(save_dir)


class DataLoader(object):
    """Native batching loader: shuffles track indices, collates crop dicts.

    Replaces the reference's torch ``DataLoader`` usage. Each iteration
    yields a dict of stacked numpy arrays (a valid device batch). The loader
    is re-iterable, matching the ``train()`` loop's one-pass-per-iteration
    contract.

    ``num_workers`` > 0 prepares batches on a thread pool, overlapping the
    host-side crop/collate work with the device step (the training loop's
    dispatch is async, so with workers the host data path runs entirely in
    the device step's shadow). Worker batches are DETERMINISTIC given the
    seed: crop starts are drawn from per-item RNGs seeded in the main
    thread, so results are independent of thread scheduling — but the draws
    differ from the ``num_workers=0`` stream (which consumes the dataset's
    own RNG).
    """

    def __init__(self, dataset, batch_size=1, shuffle=True, drop_last=False,
                 seed=0, num_workers=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._pool = None

    def __len__(self):
        if self.drop_last:
            return len(self.dataset) // self.batch_size
        return -(-len(self.dataset) // self.batch_size)

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)

        for start in range(0, len(order), self.batch_size):
            idcs = order[start: start + self.batch_size]
            if self.drop_last and len(idcs) < self.batch_size:
                break
            yield idcs

    def __iter__(self):
        if not self.num_workers:
            for idcs in self._batch_indices():
                yield collate([self.dataset[i] for i in idcs])
            return

        yield from self._iter_workers()

    def _make_batch(self, idcs, seeds):
        if hasattr(self.dataset, 'get_item'):
            samples = [self.dataset.get_item(i, rng=np.random.RandomState(s))
                       for i, s in zip(idcs, seeds)]
        else:
            # Duck-typed datasets exposing only __getitem__ still work
            # under workers; their internally drawn randomness (if any) is
            # then scheduling-dependent
            samples = [self.dataset[i] for i in idcs]
        return collate(samples)

    def _iter_workers(self):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix='amt-loader')

        # Per-item crop seeds drawn up-front in the main thread: the batch
        # stream is a pure function of the loader seed, however the pool
        # schedules the work
        jobs = [(idcs, self.rng.randint(0, 2**31 - 1, size=len(idcs)))
                for idcs in self._batch_indices()]

        depth = self.num_workers + self.prefetch
        pending = deque()
        try:
            for job in jobs:
                pending.append(self._pool.submit(self._make_batch, *job))
                if len(pending) >= depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            # A consumer that stops early (e.g. train(single_batch=True))
            # must not leak work into the next epoch: cancel what is still
            # queued, then WAIT for futures already running — a leftover
            # worker computing a track's features concurrently with the
            # next epoch's worker could otherwise race on the same feats
            # npz cache path
            from concurrent.futures import wait as _wait
            for fut in pending:
                fut.cancel()
            _wait([f for f in pending if not f.cancelled()])


def collate(samples):
    """Stack a list of track dicts into one batch dict.

    Array entries are stacked on a new leading axis; non-array entries are
    collected into lists.
    """

    batch = {}
    for key in samples[0].keys():
        values = [sample[key] for sample in samples]
        if tools.utils._is_array(values[0]):
            batch[key] = np.stack([np.asarray(v) for v in values])
        else:
            batch[key] = values

    return batch
