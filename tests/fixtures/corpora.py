"""Generate miniature reference-layout dataset corpora for the paper scripts.

The reference's canonical quality gate is running the literal experiment
scripts (``examples/papers/{of_1,of_2,tabcnn}.py``) against real corpora
(reference ``examples/papers/of_1.py:157-183``). The real corpora cannot be
shipped; these generators build **layout-faithful miniatures** with the
library's own writers (``tools.write_wav``, ``tools.write_notes_midi``,
``tools.write_stacked_notes_jams``) so the scripts' full
load -> train -> checkpoint -> validate paths execute end-to-end in CI:

* :func:`make_maps_corpus` — all 9 piano-type splits in the
  ``<piano>/MUS/MAPS_MUS-<piece>_<piano>.{wav,mid,txt}`` layout, including a
  piece shared between a train and a test piano so
  ``MAPS.remove_overlapping`` has something to remove.
* :func:`make_guitarset_corpus` — ``annotation/*.jams`` +
  ``audio_mono-mic/*_mic.wav`` with 60 tracks per player block (the loader
  slices fixed 60-track windows, reference ``GuitarSet.py:58-60``).
* :func:`make_maestro_corpus` — year directories + the split CSV.

Audio is synthesized from the note ground truth (``datasets.synthetic``), so
trained models see coherent (audio, label) pairs.
"""

import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from amt_tools_tpu import tools
from amt_tools_tpu.datasets.synthetic import render_notes


def _random_piece(rng, duration, num_notes, low=48, high=84):
    """Random monotimbral piece: (pitches, intervals, velocities)."""

    pitches = rng.randint(low, high, num_notes).astype(float)
    onsets = np.sort(rng.uniform(0.05, duration - 0.4, num_notes))
    durations = rng.uniform(0.15, 0.5, num_notes)
    intervals = np.stack([onsets, np.minimum(onsets + durations,
                                             duration - 0.05)], axis=-1)
    velocities = rng.randint(40, 120, num_notes)

    return pitches, intervals, velocities


def _write_track(directory, stem, pitches, intervals, velocities,
                 sample_rate, duration, seed, midi_ext='mid', txt=True):
    audio = render_notes(list(pitches), [list(i) for i in intervals],
                         sample_rate, duration, seed=seed)
    tools.write_wav(os.path.join(directory, f'{stem}.wav'),
                    audio.astype(np.float32), sample_rate)

    batched = tools.notes_to_batched_notes(pitches, intervals)
    tools.write_notes_midi(os.path.join(directory, f'{stem}.{midi_ext}'),
                           batched, velocities)

    if txt:
        open(os.path.join(directory, f'{stem}.txt'), 'w').close()


def make_maps_corpus(root, sample_rate=16000, duration=2.6, notes_per_piece=6,
                     seed=0):
    """MAPS-layout corpus covering all 9 piano splits.

    Each piano gets the piece named after it plus one shared piece
    ('common') on the first train piano and the first test piano, so
    ``remove_overlapping(['ENSTDkAm', ...])`` exercises real removal.
    """

    from amt_tools_tpu.datasets import MAPS

    rng = np.random.RandomState(seed)

    for piano in MAPS.available_splits():
        mus_dir = os.path.join(root, piano, 'MUS')
        os.makedirs(mus_dir, exist_ok=True)

        pieces = [f'piece{piano}']
        if piano in ('AkPnBcht', 'ENSTDkAm'):
            pieces.append('common')

        for piece in pieces:
            stem = f'MAPS_MUS-{piece}_{piano}'
            pitches, intervals, velocities = _random_piece(
                rng, duration, notes_per_piece)
            _write_track(mus_dir, stem, pitches, intervals, velocities,
                         sample_rate, duration, seed=rng.randint(2 ** 31))

    return root


def make_guitarset_corpus(root, sample_rate=22050, duration=0.7,
                          notes_per_track=3, seed=0):
    """GuitarSet-layout corpus: 6 players x 60 tracks (the loader slices
    fixed 60-track alphabetical blocks per player)."""

    from amt_tools_tpu.tools.instrument import GuitarProfile

    rng = np.random.RandomState(seed)
    profile = GuitarProfile(num_frets=19)
    tuning = profile.get_midi_tuning()

    jams_dir = os.path.join(root, 'annotation')
    audio_dir = os.path.join(root, 'audio_mono-mic')
    os.makedirs(jams_dir, exist_ok=True)
    os.makedirs(audio_dir, exist_ok=True)

    for player in range(6):
        for idx in range(60):
            track = f'{player:02d}_Fixture{idx:02d}-{player}_solo'

            # Per-string notes within each string's fret range
            stacked = {}
            all_pitches, all_intervals = [], []
            for string, open_midi in enumerate(tuning):
                count = rng.randint(1, notes_per_track)
                pitches = (open_midi
                           + rng.randint(0, profile.num_pitches, count)).astype(float)
                onsets = np.sort(rng.uniform(0.03, duration - 0.3, count))
                intervals = np.stack(
                    [onsets, np.minimum(onsets + rng.uniform(0.1, 0.3, count),
                                        duration - 0.02)], axis=-1)
                stacked.update(tools.notes_to_stacked_notes(
                    pitches, intervals, key=string))
                all_pitches.append(pitches)
                all_intervals.append(intervals)

            tools.write_stacked_notes_jams(
                stacked, os.path.join(jams_dir, f'{track}.jams'),
                duration=duration)

            audio = render_notes(
                list(np.concatenate(all_pitches)),
                [list(i) for i in np.concatenate(all_intervals)],
                sample_rate, duration, seed=rng.randint(2 ** 31))
            tools.write_wav(os.path.join(audio_dir, f'{track}_mic.wav'),
                            audio.astype(np.float32), sample_rate)

    return root


def make_maestro_corpus(root, sample_rate=16000, duration=2.6,
                        tracks_per_split=2, notes_per_piece=8, seed=0):
    """MAESTRO-layout corpus: year dirs + split CSV (audio_filename paths)."""

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, '2018'), exist_ok=True)

    rows = []
    for split in ('train', 'validation', 'test'):
        for idx in range(tracks_per_split):
            stem = f'2018/MIDI-Unprocessed_{split}_{idx:02d}'
            pitches, intervals, velocities = _random_piece(
                rng, duration, notes_per_piece)
            _write_track(root, stem, pitches, intervals, velocities,
                         sample_rate, duration, seed=rng.randint(2 ** 31),
                         midi_ext='midi', txt=False)
            rows.append({'split': split, 'audio_filename': f'{stem}.wav'})

    with open(os.path.join(root, 'maestro-v3.0.0.csv'), 'w', newline='') as f:
        writer = csv.DictWriter(f, fieldnames=['split', 'audio_filename'])
        writer.writeheader()
        writer.writerows(rows)

    return root


if __name__ == '__main__':
    import tempfile

    base = tempfile.mkdtemp(prefix='amt_corpora_')
    make_maps_corpus(os.path.join(base, 'MAPS'))
    make_guitarset_corpus(os.path.join(base, 'GuitarSet'))
    make_maestro_corpus(os.path.join(base, 'MAESTRO_V3'))
    print(base)
