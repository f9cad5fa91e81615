"""Representation-conversion library (host side).

Implements conversions between the six canonical music representations used by
the framework (capability parity with ``amt_tools/tools/utils.py:131-2677``):

- ``notes``             : (pitches (N,), intervals (N, 2)) loose note groups
- ``batched_notes``     : (N, 3) rows of [onset, offset, pitch]
- ``stacked_notes``     : dict slice -> (pitches, intervals)
- ``pitch_list``        : list of per-frame pitch arrays (ragged)
- ``stacked_pitch_list``: dict slice -> (times, pitch_list)
- ``multi_pitch``       : (F, T) binary activation map
- ``stacked_multi_pitch``: (S, F, T)
- ``tablature``         : (S, T) integer class map, -1 = silence
- ``logistic``          : flattened per-string/fret activations (N, T)
- ``onsets``/``offsets``: (F, T) event maps

All functions here are pure NumPy and vectorized (the reference's sequential
decode loops, e.g. ``multi_pitch_to_notes`` at ``utils.py:369-471`` and
``inhibit_activations`` at ``utils.py:2987``, are re-formulated as suffix scans
and row-wise greedy passes). JAX device-side counterparts for everything needed
inside ``jit`` live in ``amt_tools_tpu.ops``.
"""

import os
import time
import warnings
from copy import deepcopy
from datetime import datetime

import numpy as np

from . import constants
from .instrument import hz_to_midi, midi_to_hz

__all__ = [
    # notes / batched notes
    'notes_to_batched_notes', 'batched_notes_to_notes', 'cat_batched_notes',
    'filter_batched_note_repeats', 'transpose_batched_notes',
    'stacked_notes_to_batched_notes', 'batched_notes_to_hz', 'batched_notes_to_midi',
    'slice_batched_notes', 'sort_batched_notes', 'sort_notes',
    'notes_to_hz', 'notes_to_midi', 'offset_notes', 'detect_overlap_notes', 'filter_notes',
    # stacked notes
    'notes_to_stacked_notes', 'batched_notes_to_stacked_notes', 'stacked_notes_to_notes',
    'stacked_notes_to_hz', 'stacked_notes_to_midi', 'cat_stacked_notes',
    'filter_stacked_note_repeats', 'stacked_notes_to_frets', 'find_pitch_bounds_stacked_notes',
    # pitch list
    'multi_pitch_to_pitch_list', 'pitch_list_to_multi_pitch', 'pitch_list_to_hz',
    'pitch_list_to_midi', 'slice_pitch_list', 'cat_pitch_list', 'unroll_pitch_list',
    'clean_pitch_list', 'pack_pitch_list', 'unpack_pitch_list', 'get_active_pitch_count',
    'contains_empties_pitch_list', 'detect_overlap_pitch_list', 'filter_pitch_list',
    'pitch_list_to_stacked_pitch_list', 'stacked_pitch_list_to_pitch_list',
    'stacked_multi_pitch_to_stacked_pitch_list', 'stacked_pitch_list_to_hz',
    'stacked_pitch_list_to_midi', 'slice_stacked_pitch_list', 'cat_stacked_pitch_list',
    'sort_pitch_list',
    # multi pitch
    'notes_to_multi_pitch', 'multi_pitch_to_notes', 'stacked_multi_pitch_to_multi_pitch',
    'notes_to_velocity', 'extract_note_velocities',
    'multi_pitch_to_stacked_multi_pitch', 'stacked_notes_to_stacked_multi_pitch',
    'stacked_pitch_list_to_stacked_multi_pitch', 'tablature_to_stacked_multi_pitch',
    'logistic_to_stacked_multi_pitch',
    # tablature / logistic
    'stacked_multi_pitch_to_tablature', 'stacked_pitch_list_to_tablature',
    'logistic_to_tablature', 'stacked_multi_pitch_to_logistic', 'tablature_to_logistic',
    # onsets / offsets
    'notes_to_onsets', 'multi_pitch_to_onsets', 'stacked_notes_to_stacked_onsets',
    'stacked_multi_pitch_to_stacked_onsets', 'notes_to_offsets', 'multi_pitch_to_offsets',
    'stacked_notes_to_stacked_offsets', 'stacked_multi_pitch_to_stacked_offsets',
    # activations / signals
    'rms_norm', 'blur_activations', 'normalize_activations', 'threshold_activations',
    'framify_activations', 'inhibit_activations', 'remove_activation_blips',
    'interpolate_gaps', 'get_resample_idcs', 'estimate_hop_length',
    'time_series_to_uniform', 'get_frame_times',
    # stacked representation plumbing
    'apply_func_stacked_representation', 'pack_stacked_representation',
    'unpack_stacked_representation',
    # dict / array plumbing
    'to_numpy', 'tensor_to_array', 'array_to_tensor',
    'dict_to_dtype', 'dict_to_device', 'dict_to_array', 'dict_to_jax', 'dict_to_tensor',
    'dict_squeeze', 'dict_unsqueeze', 'dict_append', 'dict_detach', 'unpack_dict',
    'query_dict', 'get_tag', 'slice_track', 'save_dict_npz', 'load_dict_npz',
    'seed_everything',
    # timing
    'get_current_time', 'print_time', 'compute_time_difference',
]


##################################################
# ARRAY COERCION                                 #
##################################################


def to_numpy(data):
    """Coerce a JAX array (or anything array-like) to a host ``ndarray``."""

    if isinstance(data, np.ndarray):
        return data
    # jax.Array exposes __array__; this also covers lists/scalars
    return np.asarray(data)


def _is_array(entry):
    """True for NumPy arrays and JAX arrays (anything with shape/dtype)."""

    return isinstance(entry, np.ndarray) or (
        hasattr(entry, 'shape') and hasattr(entry, 'dtype') and hasattr(entry, '__array__'))


##################################################
# NOTES <-> BATCHED NOTES                        #
##################################################


def notes_to_batched_notes(pitches, intervals):
    """Convert loose note groups into (N, 3) rows of [onset, offset, pitch]."""

    batched_notes = np.empty([0, 3])

    if len(pitches) > 0:
        batched_notes = np.concatenate(
            (np.asarray(intervals, dtype=np.float64).reshape(-1, 2),
             np.asarray(pitches, dtype=np.float64).reshape(-1, 1)), axis=-1)

    return batched_notes


def batched_notes_to_notes(batched_notes):
    """Convert (N, 3) batched notes back into (pitches, intervals)."""

    batched_notes = np.asarray(batched_notes).reshape(-1, 3)
    pitches, intervals = batched_notes[..., 2], batched_notes[..., :2]

    return pitches, intervals


def cat_batched_notes(batched_notes, new_batched_notes):
    """Concatenate two collections of batched notes along the first axis."""

    return np.concatenate((batched_notes, new_batched_notes), axis=0)


def sort_batched_notes(batched_notes, by=0):
    """Stable-sort batched notes by column (0 onset | 1 offset | 2 pitch)."""

    order = np.argsort(batched_notes[..., by], kind='stable')

    return batched_notes[order]


def sort_notes(pitches, intervals, by=0):
    """Stable-sort loose note groups by attribute (0 onset | 1 offset | 2 pitch)."""

    batched_notes = notes_to_batched_notes(pitches, intervals)
    batched_notes = sort_batched_notes(batched_notes, by)

    return batched_notes_to_notes(batched_notes)


def filter_batched_note_repeats(batched_notes):
    """Drop duplicate (pitch, onset) notes, keeping the longest duration."""

    batched_notes = np.asarray(batched_notes).reshape(-1, 3)

    # Sort by (onset, offset) so that after the flip the longest duration
    # appears first among (pitch, onset) duplicates
    order = np.lexsort((batched_notes[:, 1], batched_notes[:, 0]))
    batched_notes = np.flip(batched_notes[order], axis=0)

    # Unique over (pitch, onset) pairs keeps the first (longest) occurrence
    pitches_onsets = batched_notes[:, [2, 0]]
    keep_indices = np.unique(pitches_onsets, return_index=True, axis=0)[-1]

    return batched_notes[keep_indices]


def transpose_batched_notes(batched_notes):
    """Swap the note and attribute axes of batched notes."""

    return np.transpose(batched_notes, (-1, -2))


def stacked_notes_to_batched_notes(stacked_notes, transposed=False):
    """Concatenate all slices of a stacked batched-notes dict into one array."""

    entries = list(stacked_notes.values())

    return np.concatenate(entries, axis=int(transposed))


def batched_notes_to_hz(batched_notes):
    """Convert the pitch column of batched notes from MIDI to Hz."""

    batched_notes = np.array(batched_notes, copy=True)
    batched_notes[..., 2] = midi_to_hz(batched_notes[..., 2])

    return batched_notes


def batched_notes_to_midi(batched_notes):
    """Convert the pitch column of batched notes from Hz to MIDI."""

    batched_notes = np.array(batched_notes, copy=True)
    batched_notes[..., 2] = hz_to_midi(batched_notes[..., 2])

    return batched_notes


def slice_batched_notes(batched_notes, start_time, stop_time, relative_times=False):
    """Drop notes outside a time window and clip intervals to its boundaries."""

    batched_notes = np.array(batched_notes, copy=True)

    batched_notes = batched_notes[batched_notes[:, 1] > start_time]
    batched_notes = batched_notes[batched_notes[:, 0] <= stop_time]

    batched_notes[:, 0] = np.maximum(batched_notes[:, 0], start_time)
    batched_notes[:, 1] = np.minimum(batched_notes[:, 1], stop_time)

    if relative_times:
        batched_notes[:, :2] -= start_time

    return batched_notes


def notes_to_hz(pitches):
    """Convert note pitches from MIDI to Hz."""

    return midi_to_hz(pitches)


def notes_to_midi(pitches):
    """Convert note pitches from Hz to MIDI."""

    return hz_to_midi(pitches)


def offset_notes(pitches, intervals, semitones):
    """Shift note pitches by a number of semitones."""

    return pitches + semitones, intervals


def detect_overlap_notes(intervals, decimals=3):
    """Check whether any note intervals overlap (at millisecond resolution)."""

    intervals = sort_batched_notes(np.asarray(intervals).reshape(-1, 2), by=0)
    # Flatten to [on_0, off_0, on_1, off_1, ...]: a negative difference means
    # either an inverted interval or an onset before the previous offset.
    # (Fixes a latent reference bug: diffing per-row yields durations only.)
    overlap = np.sum(np.round(np.diff(intervals.flatten()), decimals) < 0) > 0

    return bool(overlap)


def filter_notes(pitches, intervals, profile=None,
                 min_time=-np.inf, max_time=np.inf, suppress_warnings=True):
    """Remove notes with out-of-range nominal pitch or fully out-of-bounds intervals."""

    pitches = np.asarray(pitches)
    intervals = np.asarray(intervals).reshape(-1, 2)

    valid = np.logical_and(intervals[:, 0] <= max_time, intervals[:, 1] >= min_time)

    if profile is not None:
        pitches_r = np.round(pitches)
        in_bounds = np.logical_and(pitches_r >= profile.low, pitches_r <= profile.high)
        if np.any(~in_bounds) and not suppress_warnings:
            warnings.warn('Ignoring notes with nominal pitch exceeding supported '
                          'boundaries.', category=RuntimeWarning)
        valid = np.logical_and(valid, in_bounds)

    if np.any(~valid) and not suppress_warnings:
        warnings.warn('Ignoring notes outside specified time boundaries.',
                      category=RuntimeWarning)

    return pitches[valid], intervals[valid]


##################################################
# STACKED NOTES                                  #
##################################################


def notes_to_stacked_notes(pitches, intervals, key=0):
    """Wrap one collection of notes into a single-slice stacked-notes dict."""

    return {key: (pitches, intervals)}


def batched_notes_to_stacked_notes(batched_notes, transposed=False, i=0):
    """Wrap batched notes into a single-slice stacked-notes dict."""

    if transposed:
        batched_notes = transpose_batched_notes(batched_notes)

    pitches, intervals = batched_notes_to_notes(batched_notes)

    return {i: (pitches, intervals)}


def stacked_notes_to_notes(stacked_notes, sort_by=0):
    """Collapse a stacked-notes dict into one collection of loose notes."""

    all_pitches, all_intervals = [], []
    for pitches, intervals in stacked_notes.values():
        all_pitches.append(np.asarray(pitches, dtype=np.float64))
        all_intervals.append(np.asarray(intervals, dtype=np.float64).reshape(-1, 2))

    pitches = np.concatenate(all_pitches) if all_pitches else np.empty(0)
    intervals = (np.concatenate(all_intervals, axis=0)
                 if all_intervals else np.empty((0, 2)))

    if sort_by is not None:
        pitches, intervals = sort_notes(pitches, intervals, by=sort_by)

    return pitches, intervals


def stacked_notes_to_hz(stacked_notes):
    """Convert all pitches in a stacked-notes dict from MIDI to Hz."""

    return {k: (midi_to_hz(p), i) for k, (p, i) in stacked_notes.items()}


def stacked_notes_to_midi(stacked_notes):
    """Convert all pitches in a stacked-notes dict from Hz to MIDI."""

    return {k: (hz_to_midi(p), i) for k, (p, i) in stacked_notes.items()}


def cat_stacked_notes(stacked_notes, new_stacked_notes):
    """Merge two stacked-notes dicts slice-by-slice."""

    merged = dict(stacked_notes)
    for key, (pitches, intervals) in new_stacked_notes.items():
        if key in merged:
            old_pitches, old_intervals = merged[key]
            merged[key] = (np.append(old_pitches, pitches),
                           np.concatenate((old_intervals.reshape(-1, 2),
                                           np.asarray(intervals).reshape(-1, 2)), axis=0))
        else:
            merged[key] = (pitches, intervals)

    return merged


def filter_stacked_note_repeats(stacked_notes):
    """Remove (pitch, onset) duplicates within each slice of stacked notes."""

    filtered = {}
    for key, (pitches, intervals) in stacked_notes.items():
        batched = filter_batched_note_repeats(notes_to_batched_notes(pitches, intervals))
        filtered[key] = batched_notes_to_notes(batched)

    return filtered


def stacked_notes_to_frets(stacked_notes, tuning=None):
    """Convert per-string MIDI pitches into fret numbers given a tuning.

    ``tuning`` is a list of the lowest MIDI pitch per slice; by default the
    slice keys are assumed to be the open-string MIDI pitches.
    """

    fretted = {}
    for idx, (key, (pitches, intervals)) in enumerate(stacked_notes.items()):
        open_pitch = tuning[idx] if tuning is not None else key
        fretted[key] = (np.round(np.asarray(pitches) - open_pitch).astype(int), intervals)

    return fretted


def find_pitch_bounds_stacked_notes(stacked_notes):
    """Find the lowest/highest pitch present in each slice of stacked notes."""

    bounds = {}
    for key, (pitches, _) in stacked_notes.items():
        pitches = np.asarray(pitches)
        if len(pitches):
            bounds[key] = (np.min(pitches), np.max(pitches))
        else:
            bounds[key] = (None, None)

    return bounds


##################################################
# PITCH LIST                                     #
##################################################


def multi_pitch_to_pitch_list(multi_pitch, profile):
    """Convert an (F, T) activation map into a ragged per-frame pitch list."""

    multi_pitch = to_numpy(multi_pitch)
    num_frames = multi_pitch.shape[-1]

    # Single pass: find active (pitch, frame) pairs, then split per frame
    active_pitch, active_frame = np.where(multi_pitch > 0)
    order = np.argsort(active_frame, kind='stable')
    active_pitch, active_frame = active_pitch[order], active_frame[order]

    counts = np.bincount(active_frame, minlength=num_frames)
    splits = np.cumsum(counts)[:-1]
    per_frame = np.split((profile.low + active_pitch).astype(float), splits)

    return [np.sort(p) for p in per_frame]


def pitch_list_to_multi_pitch(pitch_list, profile):
    """Convert a ragged MIDI pitch list into an (F, T) activation map."""

    pitch_list = filter_pitch_list(pitch_list, profile)

    num_pitches = profile.get_range_len()
    num_frames = len(pitch_list)

    multi_pitch = np.zeros((num_pitches, num_frames))

    counts = get_active_pitch_count(pitch_list)
    if counts.sum():
        frame_idcs = np.repeat(np.arange(num_frames), counts)
        all_pitches = np.concatenate([np.atleast_1d(p) for p in pitch_list]) \
            if num_frames else np.empty(0)
        pitch_idcs = np.round(all_pitches - profile.low).astype(int)
        multi_pitch[pitch_idcs, frame_idcs] = 1

    return multi_pitch


def pitch_list_to_hz(pitch_list):
    """Convert all pitch observations from MIDI to Hz."""

    return [midi_to_hz(p) if len(p) else p for p in pitch_list]


def pitch_list_to_midi(pitch_list):
    """Convert all pitch observations from Hz to MIDI."""

    return [hz_to_midi(p) if len(p) else p for p in pitch_list]


def slice_pitch_list(times, pitch_list, start_time, stop_time):
    """Retain pitch observations within [start_time, stop_time]."""

    valid = np.logical_and(times >= start_time, times <= stop_time)
    idcs = np.where(valid)[0]

    return times[valid], [pitch_list[i] for i in idcs]


def cat_pitch_list(times, pitch_list, new_times, new_pitch_list, decimals=6):
    """Concatenate two pitch lists, merging observations at coincident times."""

    times_r = np.round(times, decimals)
    new_times_r = np.round(new_times, decimals)

    merged = {t: np.asarray(p) for t, p in zip(times_r, pitch_list)}
    for t, p in zip(new_times_r, new_pitch_list):
        if t in merged:
            merged[t] = np.unique(np.append(merged[t], p))
        else:
            merged[t] = np.asarray(p)

    out_times = np.sort(np.array(list(merged.keys())))
    out_pitch_list = [merged[t] for t in out_times]

    return out_times, out_pitch_list


def unroll_pitch_list(times, pitch_list):
    """Flatten a pitch list into parallel (time, pitch) observation arrays."""

    counts = get_active_pitch_count(pitch_list)
    unrolled_times = np.repeat(times, counts)
    unrolled_pitches = (np.concatenate([np.atleast_1d(p) for p in pitch_list])
                        if len(pitch_list) else np.empty(0))

    return unrolled_times, unrolled_pitches


def clean_pitch_list(pitch_list):
    """Remove NaNs and non-positive observations from each frame."""

    return [np.asarray(p)[np.logical_and(~np.isnan(np.asarray(p, dtype=float)),
                                         np.asarray(p, dtype=float) > 0)]
            for p in pitch_list]


def pack_pitch_list(times, pitch_list):
    """Pack a ragged pitch list into flat arrays suitable for npz storage."""

    counts = get_active_pitch_count(pitch_list)
    values = (np.concatenate([np.atleast_1d(p) for p in pitch_list])
              if len(pitch_list) else np.empty(0))

    return {'times': np.asarray(times), 'counts': counts, 'values': values}


def unpack_pitch_list(packed_pitch_list):
    """Invert :func:`pack_pitch_list`."""

    times = packed_pitch_list['times']
    counts = packed_pitch_list['counts'].astype(int)
    values = packed_pitch_list['values']

    splits = np.cumsum(counts)[:-1]
    pitch_list = np.split(values, splits) if len(counts) else []

    return times, list(pitch_list)


def get_active_pitch_count(pitch_list):
    """Count pitch observations at each frame of a pitch list."""

    return np.array([len(np.atleast_1d(p)) for p in pitch_list], dtype=int)


def contains_empties_pitch_list(pitch_list):
    """Check whether any frames contain no pitch observations."""

    return bool(np.any(get_active_pitch_count(pitch_list) == 0))


def detect_overlap_pitch_list(pitch_list):
    """Check whether any frames contain more than one pitch observation."""

    return bool(np.any(get_active_pitch_count(pitch_list) > 1))


def filter_pitch_list(pitch_list, profile, suppress_warnings=True):
    """Remove pitch observations outside the profile's supported range."""

    filtered = []
    dropped = False
    for p in pitch_list:
        p = np.atleast_1d(np.asarray(p, dtype=float))
        valid = np.logical_and(np.round(p) >= profile.low, np.round(p) <= profile.high)
        dropped |= bool(np.any(~valid))
        filtered.append(p[valid])

    if dropped and not suppress_warnings:
        warnings.warn('Ignoring pitch observations exceeding supported boundaries.',
                      category=RuntimeWarning)

    return filtered


def pitch_list_to_stacked_pitch_list(times, pitch_list, i=0):
    """Wrap a single pitch list into a stacked-pitch-list dict."""

    return {i: (times, pitch_list)}


def stacked_pitch_list_to_pitch_list(stacked_pitch_list):
    """Collapse a stacked pitch list into a single (times, pitch_list) pair."""

    out_times, out_pitch_list = np.empty(0), []
    for times, pitch_list in stacked_pitch_list.values():
        out_times, out_pitch_list = cat_pitch_list(out_times, out_pitch_list,
                                                   np.asarray(times), pitch_list)

    return out_times, out_pitch_list


def stacked_multi_pitch_to_stacked_pitch_list(stacked_multi_pitch, times, profile):
    """Convert an (S, F, T) stack into a stacked pitch list."""

    stacked_pitch_list = {}
    for slc in range(len(stacked_multi_pitch)):
        pitch_list = multi_pitch_to_pitch_list(stacked_multi_pitch[slc], profile)
        stacked_pitch_list[slc] = (np.asarray(times), pitch_list)

    return stacked_pitch_list


def stacked_pitch_list_to_hz(stacked_pitch_list):
    """Convert a stacked pitch list from MIDI to Hz."""

    return {k: (t, pitch_list_to_hz(p)) for k, (t, p) in stacked_pitch_list.items()}


def stacked_pitch_list_to_midi(stacked_pitch_list):
    """Convert a stacked pitch list from Hz to MIDI."""

    return {k: (t, pitch_list_to_midi(p)) for k, (t, p) in stacked_pitch_list.items()}


def slice_stacked_pitch_list(stacked_pitch_list, start_time, stop_time):
    """Slice each constituent pitch list to a time window."""

    return {k: slice_pitch_list(np.asarray(t), p, start_time, stop_time)
            for k, (t, p) in stacked_pitch_list.items()}


def cat_stacked_pitch_list(stacked_pitch_list, new_stacked_pitch_list):
    """Merge two stacked pitch lists slice-by-slice."""

    merged = dict(stacked_pitch_list)
    for key, (times, pitch_list) in new_stacked_pitch_list.items():
        if key in merged:
            merged[key] = cat_pitch_list(np.asarray(merged[key][0]), merged[key][1],
                                         np.asarray(times), pitch_list)
        else:
            merged[key] = (times, pitch_list)

    return merged


def sort_pitch_list(times, pitch_list):
    """Sort a pitch list by frame time."""

    order = np.argsort(times, kind='stable')

    return np.asarray(times)[order], [pitch_list[i] for i in order]


##################################################
# MULTI PITCH                                    #
##################################################


def notes_to_multi_pitch(pitches, intervals, times, profile, include_offsets=True):
    """Rasterize loose MIDI notes into an (F, T) activation map.

    Onset/offset frames are chosen as the last frame beginning at or before the
    respective event (matching ``amt_tools/tools/utils.py:1665-1737``).
    """

    num_pitches = profile.get_range_len()
    times = np.asarray(times)
    num_frames = len(times)

    multi_pitch = np.zeros((num_pitches, num_frames))

    if num_frames == 0:
        return multi_pitch

    # Extend times by one hop to bound note offsets
    _times = np.append(times, times[-1] + estimate_hop_length(times))

    pitches, intervals = filter_notes(pitches, intervals, profile,
                                      min_time=np.min(_times), max_time=np.max(_times))

    if len(pitches) == 0:
        return multi_pitch

    pitch_rows = np.round(pitches - profile.low).astype(int)

    # Frame of the last time <= event time; searchsorted('right') - 1 computes
    # this in O(N log T) instead of the reference's broadcasted argmin
    onset_frames = np.searchsorted(_times, intervals[:, 0], side='right') - 1
    offset_frames = np.searchsorted(_times, intervals[:, 1], side='right') - 1

    onset_frames = np.clip(onset_frames, 0, num_frames - 1)
    offset_frames = np.clip(offset_frames, 0, num_frames - 1)

    # Paint activation spans via a difference array, then a cumulative sum:
    # O(N + F*T) instead of a per-note Python loop
    ends = offset_frames + int(include_offsets)
    ends = np.maximum(ends, onset_frames + 1)
    diff = np.zeros((num_pitches, num_frames + 1))
    np.add.at(diff, (pitch_rows, onset_frames), 1)
    np.add.at(diff, (pitch_rows, np.minimum(ends, num_frames)), -1)
    multi_pitch = (np.cumsum(diff[:, :-1], axis=1) > 0).astype(float)

    return multi_pitch


def notes_to_velocity(pitches, intervals, velocities, times, profile,
                      include_offsets=True, midi_scale=None):
    """Rasterize per-note velocities into an (F, T) map in [0, 1].

    The velocity analog of :func:`notes_to_multi_pitch` (closing the
    reference's velocity TODO, ``models/onsetsframes.py:13``): each note's
    span carries its velocity; overlapping same-pitch notes keep the louder
    one. ``midi_scale=True`` divides by 127 (0-127 MIDI velocities),
    ``False`` takes values as already-normalized [0, 1]; the default
    ``None`` infers per call (max > 1 -> MIDI scale) — pass it explicitly
    when rasterizing many tracks of known provenance so a track whose
    loudest note happens to be <= 1 is not mis-scaled.
    """

    num_pitches = profile.get_range_len()
    times = np.asarray(times)
    num_frames = len(times)

    velocity = np.zeros((num_pitches, num_frames))

    if num_frames == 0 or len(np.atleast_1d(pitches)) == 0:
        return velocity

    _times = np.append(times, times[-1] + estimate_hop_length(times))

    pitches = np.asarray(pitches, dtype=float)
    intervals = np.asarray(intervals).reshape(-1, 2)
    velocities = np.asarray(velocities, dtype=float).reshape(-1)
    if midi_scale is None:
        midi_scale = bool(velocities.size and velocities.max() > 1.0)
    if midi_scale:
        velocities = velocities / 127.0

    # Same validity rule as filter_notes (keep velocities aligned)
    valid = np.logical_and(intervals[:, 0] <= np.max(_times),
                           intervals[:, 1] >= np.min(_times))
    rounded = np.round(pitches)
    valid &= np.logical_and(rounded >= profile.low, rounded <= profile.high)

    pitches, intervals, velocities = pitches[valid], intervals[valid], velocities[valid]
    if len(pitches) == 0:
        return velocity

    pitch_rows = np.round(pitches - profile.low).astype(int)
    onset_frames = np.clip(np.searchsorted(_times, intervals[:, 0], side='right') - 1,
                           0, num_frames - 1)
    offset_frames = np.clip(np.searchsorted(_times, intervals[:, 1], side='right') - 1,
                            0, num_frames - 1)
    ends = np.maximum(offset_frames + int(include_offsets), onset_frames + 1)
    ends = np.minimum(ends, num_frames)

    # Loudest-wins painting, quietest notes first
    order = np.argsort(velocities, kind='stable')
    for i in order:
        velocity[pitch_rows[i], onset_frames[i]: ends[i]] = velocities[i]

    return velocity


def extract_note_velocities(batched_notes, velocity, times, profile,
                            window=1):
    """Read each note's velocity off an (F, T) velocity map at its onset.

    ``batched_notes`` is (N, 3); returns an (N,) array in [0, 1]. Inverse of
    :func:`notes_to_velocity` at onset frames — used to attach predicted
    velocities to decoded notes. ``window`` > 1 averages the map over the
    first ``window`` frames of each note (clipped to the note's own span),
    pooling out per-frame prediction noise.
    """

    batched_notes = np.asarray(batched_notes).reshape(-1, 3)
    velocity = to_numpy(velocity)
    times = np.asarray(times)

    if len(batched_notes) == 0:
        return np.empty(0)

    _times = np.append(times, times[-1] + estimate_hop_length(times))

    num_frames = velocity.shape[1]
    rows = np.clip(np.round(batched_notes[:, 2] - profile.low).astype(int),
                   0, velocity.shape[0] - 1)
    frames = np.clip(np.searchsorted(_times, batched_notes[:, 0], side='right') - 1,
                     0, num_frames - 1)

    if window <= 1:
        return velocity[rows, frames]

    # Last frame each note still occupies (its span's inclusive end)
    ends = np.clip(np.searchsorted(_times, batched_notes[:, 1], side='right') - 1,
                   frames, num_frames - 1)

    values = np.zeros(len(batched_notes))
    counts = np.zeros(len(batched_notes))
    for offset in range(window):
        cols = frames + offset
        valid = (cols <= ends) & (cols < num_frames)
        values += np.where(valid, velocity[rows, np.minimum(cols, num_frames - 1)], 0.0)
        counts += valid

    return values / np.maximum(counts, 1)


def multi_pitch_to_notes(multi_pitch, times, profile, onsets=None, offsets=None):
    """Decode an (F, T) activation map into loose MIDI note groups.

    Matches the sequential reference decode (``utils.py:369-471``) but runs as
    vectorized suffix scans: a note starting at an onset impulse extends until
    the first frame where the pitch deactivates or a new onset occurs.
    """

    multi_pitch = to_numpy(multi_pitch)
    times = np.asarray(times)

    if onsets is None:
        onsets = multi_pitch_to_onsets(multi_pitch)
    else:
        onsets = to_numpy(onsets)

    # Ensure all onsets have corresponding pitch activations
    active = np.logical_or(onsets > 0, multi_pitch > 0)

    # Collapse onset spans to impulses at their starting frame
    onset_impulses = multi_pitch_to_onsets(onsets) > 0

    num_pitches, num_frames = active.shape[-2:]

    if num_frames == 0 or not np.any(onset_impulses):
        return np.empty(0), np.empty((0, 2))

    # Bound final offsets by one hop past the last frame
    times_ext = np.append(times, times[-1] + estimate_hop_length(times))

    frame_idx = np.arange(num_frames)

    # next_inactive[p, t] : smallest t' >= t with active[p, t'] == 0 (else T)
    cand = np.where(~active, frame_idx[None, :], num_frames)
    next_inactive = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1]

    # next_onset[p, t] : smallest t' >= t with an onset impulse (else T)
    cand = np.where(onset_impulses, frame_idx[None, :], num_frames)
    next_onset = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1]

    # Shift by one so the search starts strictly after the onset frame
    pad = np.full((num_pitches, 1), num_frames)
    next_inactive = np.concatenate([next_inactive[:, 1:], pad], axis=1)
    next_onset = np.concatenate([next_onset[:, 1:], pad], axis=1)

    end_frames = np.minimum(next_inactive, next_onset)

    pitch_rows, onset_frames = np.nonzero(onset_impulses)
    offset_frames = end_frames[pitch_rows, onset_frames]

    pitches = pitch_rows + profile.low
    intervals = np.stack([times[onset_frames], times_ext[offset_frames]], axis=-1)

    return sort_notes(pitches.astype(float), intervals)


def stacked_multi_pitch_to_multi_pitch(stacked_multi_pitch):
    """Collapse an (..., S, F, T) stack into (..., F, T) via max."""

    return np.max(to_numpy(stacked_multi_pitch), axis=-3)


def multi_pitch_to_stacked_multi_pitch(multi_pitch):
    """Add a singleton stack dimension to an (F, T) activation map."""

    return np.expand_dims(multi_pitch, axis=-3)


def stacked_notes_to_stacked_multi_pitch(stacked_notes, times, profile, include_offsets=True):
    """Rasterize each slice of stacked notes into an (S, F, T) stack."""

    stack = [notes_to_multi_pitch(p, i, times, profile, include_offsets)
             for p, i in stacked_notes.values()]

    return np.stack(stack, axis=-3)


def stacked_pitch_list_to_stacked_multi_pitch(stacked_pitch_list, profile):
    """Discretize each slice of a stacked pitch list into an (S, F, T) stack."""

    stack = [pitch_list_to_multi_pitch(p, profile)
             for _, p in stacked_pitch_list.values()]

    return np.stack(stack, axis=-3)


def tablature_to_stacked_multi_pitch(tablature, profile):
    """Expand (..., S, T) tablature class indices into an (..., S, F, T) stack."""

    tablature = to_numpy(tablature).astype(int)
    num_dofs, num_frames = tablature.shape[-2:]
    num_pitches = profile.get_range_len()

    stacked_multi_pitch = np.zeros(tablature.shape[:-2] + (num_dofs, num_pitches, num_frames))

    tuning = np.asarray(profile.get_midi_tuning())
    dof_start = np.expand_dims(tuning - profile.low, -1)

    non_silent = tablature >= 0
    pitch_idcs = (tablature + dof_start)[non_silent].astype(int)

    idcs = np.nonzero(non_silent)
    stacked_multi_pitch[idcs[:-1] + (pitch_idcs, idcs[-1])] = 1

    return stacked_multi_pitch


def logistic_to_stacked_multi_pitch(logistic, profile, silence=True):
    """Scatter flattened per-string activations into an (..., S, F, T) stack."""

    logistic = to_numpy(logistic)
    tuning = profile.get_midi_tuning()
    num_dofs = len(tuning)
    group = profile.num_pitches + int(silence)

    dims = logistic.shape[:-2] + (num_dofs, profile.get_range_len(), logistic.shape[-1])
    stacked_multi_pitch = np.zeros(dims)

    for dof in range(num_dofs):
        acts = logistic[..., dof * group + int(silence): (dof + 1) * group, :]
        lo = tuning[dof] - profile.low
        stacked_multi_pitch[..., dof, lo: lo + profile.num_pitches, :] = acts

    return stacked_multi_pitch


##################################################
# TABLATURE / LOGISTIC                           #
##################################################


def stacked_multi_pitch_to_tablature(stacked_multi_pitch, profile):
    """Collapse an (..., S, F, T) stack into (..., S, T) class indices (-1 = silence)."""

    stacked_multi_pitch = to_numpy(stacked_multi_pitch)
    tuning = profile.get_midi_tuning()

    tablature = []
    for dof in range(stacked_multi_pitch.shape[-3]):
        lo = tuning[dof] - profile.low
        multi_pitch = stacked_multi_pitch[..., dof, lo: lo + profile.num_pitches, :]

        silent = np.sum(multi_pitch, axis=-2) == 0
        highest = np.argmax(multi_pitch, axis=-2)
        highest = np.where(silent, -1, highest)

        tablature.append(np.expand_dims(highest, axis=-2))

    return np.concatenate(tablature, axis=-2)


def stacked_pitch_list_to_tablature(stacked_pitch_list, profile):
    """Convert a stacked pitch list directly into tablature."""

    smp = stacked_pitch_list_to_stacked_multi_pitch(stacked_pitch_list, profile)

    return stacked_multi_pitch_to_tablature(smp, profile)


def logistic_to_tablature(logistic, profile, silence, silence_thr=0.05):
    """Interpret flattened string/fret activations as tablature class indices."""

    logistic = to_numpy(logistic)
    tuning = profile.get_midi_tuning()
    group = profile.num_pitches + int(silence)

    tablature = []
    for dof in range(len(tuning)):
        acts = logistic[..., dof * group: (dof + 1) * group, :]
        max_acts, highest = np.max(acts, axis=-2), np.argmax(acts, axis=-2)

        if silence:
            highest = highest - 1
        else:
            highest = np.where(max_acts <= silence_thr, -1, highest)

        tablature.append(np.expand_dims(highest, axis=-2))

    return np.concatenate(tablature, axis=-2)


def stacked_multi_pitch_to_logistic(stacked_multi_pitch, profile, silence=False):
    """Flatten an (..., S, F, T) stack into per-string/fret activations (..., N, T)."""

    stacked_multi_pitch = to_numpy(stacked_multi_pitch)
    tuning = profile.get_midi_tuning()

    logistic = []
    for dof in range(stacked_multi_pitch.shape[-3]):
        lo = tuning[dof] - profile.low
        multi_pitch = stacked_multi_pitch[..., dof, lo: lo + profile.num_pitches, :]

        if silence:
            silence_acts = (np.sum(multi_pitch, axis=-2, keepdims=True) == 0)
            multi_pitch = np.concatenate((silence_acts.astype(multi_pitch.dtype),
                                          multi_pitch), axis=-2)

        logistic.append(multi_pitch)

    return np.concatenate(logistic, axis=-2)


def tablature_to_logistic(tablature, profile, silence=False):
    """Convert tablature class indices into unique string/fret activations."""

    smp = tablature_to_stacked_multi_pitch(tablature, profile)

    return stacked_multi_pitch_to_logistic(smp, profile, silence)


##################################################
# ONSETS / OFFSETS                               #
##################################################


def notes_to_onsets(pitches, intervals, times, profile, ambiguity=None):
    """Rasterize note onsets into an (F, T) activation map.

    With ``ambiguity`` (seconds), each onset is extended to span the ambiguity
    window (truncated at the note's duration); otherwise only the onset frame
    is marked.
    """

    intervals = np.asarray(intervals, dtype=float).reshape(-1, 2)
    onset_times = intervals[:, :1]

    if ambiguity is not None:
        durations = np.minimum(intervals[:, 1:] - onset_times, ambiguity)
        offset_times = onset_times + durations
    else:
        offset_times = onset_times.copy()

    truncated = np.concatenate((onset_times, offset_times), axis=-1)

    return notes_to_multi_pitch(pitches, truncated, times, profile)


def multi_pitch_to_onsets(multi_pitch):
    """Edge-detect where pitch activity begins (first frame counts as onset)."""

    multi_pitch = to_numpy(multi_pitch)

    first_frame = multi_pitch[..., :1]
    adjacent_diff = multi_pitch[..., 1:] - multi_pitch[..., :-1]

    onsets = np.concatenate([first_frame, adjacent_diff], axis=-1)

    return np.where(onsets > 0, onsets, 0)


def stacked_notes_to_stacked_onsets(stacked_notes, times, profile, ambiguity=None):
    """Per-slice onset maps for stacked notes -> (S, F, T)."""

    stack = [notes_to_onsets(p, i, times, profile, ambiguity)
             for p, i in stacked_notes.values()]

    return np.stack(stack, axis=-3)


def stacked_multi_pitch_to_stacked_onsets(stacked_multi_pitch):
    """Edge-detect onsets independently on each slice of a stack."""

    return multi_pitch_to_onsets(stacked_multi_pitch)


def notes_to_offsets(pitches, intervals, times, profile, ambiguity=None):
    """Rasterize note offsets into an (F, T) activation map."""

    intervals = np.asarray(intervals, dtype=float).reshape(-1, 2)
    offset_times = intervals[:, 1:]

    if ambiguity is not None:
        onset_times = np.maximum(offset_times - ambiguity, intervals[:, :1])
    else:
        onset_times = offset_times.copy()

    truncated = np.concatenate((onset_times, offset_times), axis=-1)

    return notes_to_multi_pitch(pitches, truncated, times, profile)


def multi_pitch_to_offsets(multi_pitch):
    """Edge-detect where pitch activity ceases (last frame counts as offset)."""

    multi_pitch = to_numpy(multi_pitch)

    last_frame = multi_pitch[..., -1:]
    adjacent_diff = -1 * (multi_pitch[..., 1:] - multi_pitch[..., :-1])

    offsets = np.concatenate([adjacent_diff, last_frame], axis=-1)

    return np.where(offsets > 0, offsets, 0)


def stacked_notes_to_stacked_offsets(stacked_notes, times, profile, ambiguity=None):
    """Per-slice offset maps for stacked notes -> (S, F, T)."""

    stack = [notes_to_offsets(p, i, times, profile, ambiguity)
             for p, i in stacked_notes.values()]

    return np.stack(stack, axis=-3)


def stacked_multi_pitch_to_stacked_offsets(stacked_multi_pitch):
    """Edge-detect offsets independently on each slice of a stack."""

    return multi_pitch_to_offsets(stacked_multi_pitch)


##################################################
# ACTIVATIONS / SIGNALS                          #
##################################################


def rms_norm(audio):
    """Normalize audio so its root-mean-square energy is 1."""

    audio = np.asarray(audio, dtype=np.float64)
    rms = np.sqrt(np.mean(audio ** 2))

    return (audio / rms).astype(constants.FLOAT32) if rms > 0 else audio.astype(constants.FLOAT32)


def blur_activations(activations, kernel=None, normalize=False, threshold=False):
    """Blur activations by convolving with a kernel (identity by default)."""

    from scipy.signal import convolve

    if kernel is None:
        kernel = np.array([[1.0]])

    activations = convolve(np.asarray(activations, dtype=float),
                           np.asarray(kernel, dtype=float), mode='same')

    if normalize:
        activations = normalize_activations(activations)
    if threshold:
        activations = threshold_activations(activations)

    return activations


def normalize_activations(activations):
    """Scale activations into [0, 1] by their maximum magnitude."""

    activations = np.asarray(activations, dtype=float)
    max_val = np.max(np.abs(activations)) if activations.size else 0

    return activations / max_val if max_val > 0 else activations


def threshold_activations(activations, threshold=0.5):
    """Binarize activations at a threshold."""

    activations = to_numpy(activations)

    return np.where(activations >= threshold, 1.0, 0.0).astype(activations.dtype)


def framify_activations(activations, win_length, hop_length=1, pad=True):
    """Chunk activations into overlapping windows along the last axis.

    Output has shape (..., T', win_length) with the window axis appended at
    -1 and the chunk axis at -2, matching ``utils.py:2922-2984``.
    """

    activations = to_numpy(activations)
    num_frames = activations.shape[-1]
    pad_length = win_length // 2

    if pad:
        target = num_frames + 2 * pad_length
    else:
        target = max(win_length, num_frames)

    # Center-pad with zeros along the last axis (librosa pad_center semantics)
    lpad = (target - num_frames) // 2
    rpad = target - num_frames - lpad
    padding = [(0, 0)] * (activations.ndim - 1) + [(lpad, rpad)]
    activations = np.pad(activations, padding)

    num_hops = (target - 2 * pad_length) // hop_length

    windows = np.lib.stride_tricks.sliding_window_view(activations, win_length, axis=-1)
    windows = windows[..., ::hop_length, :][..., :num_hops, :]

    return np.ascontiguousarray(windows)


def inhibit_activations(activations, times, window_length):
    """Suppress activations within a time window after a kept activation.

    Row-wise greedy pass over the sparse non-zeros — same output as the
    reference's repeated global ``nonzero`` loop (``utils.py:2987-3039``) but
    O(nnz) instead of O(nnz^2).
    """

    activations = np.array(to_numpy(activations), copy=True)
    times = np.asarray(times)

    pitch_idcs, frame_idcs = activations.nonzero()

    out = np.zeros_like(activations)

    # Non-zeros arrive row-major (sorted by pitch, then frame)
    for pitch in np.unique(pitch_idcs):
        frames = frame_idcs[pitch_idcs == pitch]
        last_kept_time = -np.inf
        for frame in frames:
            if times[frame] >= last_kept_time + window_length:
                out[pitch, frame] = 1
                last_kept_time = times[frame]

    return out


def remove_activation_blips(activations):
    """Zero out single-frame positives in activations."""

    activations = np.array(to_numpy(activations), copy=True)

    onsets = multi_pitch_to_onsets(activations)
    offsets = multi_pitch_to_offsets(activations)

    blip_locations = np.logical_and(onsets > 0, offsets > 0)
    activations[blip_locations] = 0

    return activations


def interpolate_gaps(arr, gap_val=0):
    """Linearly interpolate across interior runs of ``gap_val`` in a 1-D array."""

    arr = np.array(arr, dtype=float, copy=True)

    is_gap = arr == gap_val
    gap_onsets = np.append(np.diff(is_gap.astype(int)), [0]) == 1
    gap_offsets = np.append([0], np.diff((~is_gap).astype(int))) == 1

    onset_idcs, offset_idcs = np.where(gap_onsets)[0], np.where(gap_offsets)[0]

    first_onset = np.min(onset_idcs) if len(onset_idcs) else len(arr)
    last_offset = np.max(offset_idcs) if len(offset_idcs) else 0

    offset_idcs = offset_idcs[offset_idcs > first_onset]
    onset_idcs = onset_idcs[onset_idcs < last_offset]

    for start, end in zip(onset_idcs, offset_idcs):
        arr[start: end + 1] = np.linspace(arr[start], arr[end], end - start + 1)

    return arr


def get_resample_idcs(times, target_times):
    """Indices resampling a time grid onto target times (nearest observation)."""

    times = np.asarray(times)
    target_times = np.asarray(target_times)

    if not len(times):
        return None

    idcs = np.searchsorted(times, target_times, side='right') - 1

    return np.clip(idcs, 0, len(times) - 1)


def estimate_hop_length(times):
    """Estimate the hop of a semi-regular time grid (median of regular diffs)."""

    if not len(times):
        raise ValueError('Cannot estimate hop length from an empty time array.')

    times = np.sort(np.asarray(times))

    if len(times) == 1:
        raise ValueError('Cannot estimate hop length from a single time.')

    non_gaps = np.append([False], np.isclose(np.diff(times, n=2), 0))

    if not np.sum(non_gaps):
        if len(times) == 2:
            return times[1] - times[0]
        raise ValueError('Time observations are too irregular.')

    return float(np.median(np.diff(times)[non_gaps]))


def time_series_to_uniform(times, values, hop_length=None, duration=None,
                           suppress_warnings=True):
    """Snap a semi-regular ragged time series onto a uniform hop grid."""

    if not len(times) or not len(values):
        return np.array([]), []

    if hop_length is None:
        if not suppress_warnings:
            warnings.warn('Estimating hop length from irregular observation times.',
                          category=RuntimeWarning)
        hop_length = estimate_hop_length(times)

    if duration is None:
        duration = times[-1]

    num_entries = int(np.ceil(duration / hop_length)) + 1

    new_values = [np.array([])] * num_entries
    new_times = hop_length * np.arange(num_entries)

    idcs = np.round(np.asarray(times) / hop_length).astype(int)

    for i in range(len(idcs)):
        if times[i] <= duration:
            new_values[idcs[i]] = values[i]

    return new_times, new_values


def get_frame_times(duration, sample_rate, hop_length):
    """Frame start times for audio of a given duration."""

    total_num_frames = int(1 + (duration * sample_rate - 1) // hop_length)

    return np.arange(total_num_frames) * hop_length / sample_rate


##################################################
# STACKED REPRESENTATION PLUMBING                #
##################################################


def apply_func_stacked_representation(stacked_representation, func, **kwargs):
    """Apply a function to each slice of a stacked-representation dict."""

    return {k: func(v, **kwargs) for k, v in stacked_representation.items()}


def pack_stacked_representation(stacked_representation):
    """Pack a stacked-representation dict into an npz-friendly object array."""

    keys = np.array(list(stacked_representation.keys()), dtype=object)
    values = np.empty(len(keys), dtype=object)
    for i, k in enumerate(stacked_representation.keys()):
        values[i] = stacked_representation[k]

    return np.array([keys, values], dtype=object)


def unpack_stacked_representation(packed_stacked_representation):
    """Invert :func:`pack_stacked_representation`."""

    keys, values = packed_stacked_representation

    return {k: v for k, v in zip(keys, values)}


##################################################
# DICT / ARRAY PLUMBING                          #
##################################################


def _map_dict(track, fn):
    """Apply ``fn`` to array entries of a (possibly nested) dictionary."""

    out = {}
    for key, entry in track.items():
        if isinstance(entry, dict):
            out[key] = _map_dict(entry, fn)
        elif _is_array(entry):
            out[key] = fn(entry)
        else:
            out[key] = entry

    return out


def dict_to_dtype(track, dtype, copy=True):
    """Cast all array entries of a track dictionary to a dtype.

    ``copy=False`` passes already-matching arrays through unchanged (the
    crop hot path's entries are fresh by construction, so the defensive
    copy is pure overhead there).
    """

    return _map_dict(track, lambda a: np.asarray(a).astype(dtype, copy=copy))


def dict_to_device(track, device=None):
    """Place all array entries of a track dictionary onto a JAX device."""

    import jax

    return _map_dict(track, lambda a: jax.device_put(a, device))


def dict_to_array(track):
    """Bring all array entries of a track dictionary back to host NumPy."""

    return _map_dict(track, to_numpy)


def dict_to_jax(track, device=None):
    """Convert all NumPy entries of a track dictionary to JAX arrays."""

    import jax.numpy as jnp
    import jax

    def _to_jax(a):
        a = jnp.asarray(a)
        return jax.device_put(a, device) if device is not None else a

    return _map_dict(track, _to_jax)


# Alias retained for naming parity with the reference's dict_to_tensor
dict_to_tensor = dict_to_jax



# Reference-name alias ('tensor' = device array here); see dict_to_jax
dict_to_tensor = dict_to_jax
def tensor_to_array(data):
    """JAX array -> host ndarray (parity with the reference's torch helper)."""

    return to_numpy(data)


def array_to_tensor(data, device=None):
    """ndarray -> JAX array, optionally placed on a device."""

    import jax
    import jax.numpy as jnp

    data = jnp.asarray(data)

    return jax.device_put(data, device) if device is not None else data


def dict_squeeze(track, dim=None):
    """Squeeze a dimension of all array entries of a track dictionary."""

    def _squeeze(a):
        if dim is None:
            return a.squeeze()
        if a.ndim > abs(dim if dim >= 0 else dim + 1) and a.shape[dim] == 1:
            return a.squeeze(dim)
        return a

    return _map_dict(track, _squeeze)


def dict_unsqueeze(track, dim=0):
    """Add a (batch) dimension to all array entries of a track dictionary."""

    return _map_dict(track, lambda a: np.expand_dims(a, dim)
                     if isinstance(a, np.ndarray) else a[None] if dim == 0 else a)


def dict_append(track, additions, dim=-1):
    """Append array entries of ``additions`` to matching entries of ``track``."""

    track = dict(track)
    for key, entry in additions.items():
        if key not in track or track[key] is None:
            track[key] = entry
        elif isinstance(entry, dict):
            track[key] = dict_append(track[key], entry, dim)
        elif _is_array(entry):
            track[key] = np.concatenate((to_numpy(track[key]), to_numpy(entry)), axis=dim)
        elif isinstance(entry, list):
            track[key] = list(track[key]) + entry
        else:
            track[key] = entry

    return track


def dict_detach(track):
    """Stop gradients on all JAX entries of a track dictionary."""

    import jax

    return _map_dict(track, lambda a: jax.lax.stop_gradient(a)
                     if not isinstance(a, np.ndarray) else a)


def unpack_dict(data, key):
    """Fetch ``data[key]`` if present, else None."""

    if isinstance(data, dict) and key in data.keys():
        return data[key]

    return None


def query_dict(dictionary, key):
    """Check whether a key exists in a dictionary with a non-None value."""

    return unpack_dict(dictionary, key) is not None


def get_tag(tag=None):
    """Default a file tag to the current date and time."""

    date_time = datetime.now().strftime('%m_%d_%Y_%H_%M_%S')

    return date_time if tag is None else tag


def slice_track(track, start, stop, skip=None, pad=True):
    """Slice all array entries of a track dict along the last axis.

    Entries shorter than the requested window are zero-padded (tablature is
    padded with -1), matching ``utils.py:3908-3967``.

    Returns a new dict whose sliced arrays are fresh O(window) copies;
    skipped and non-array entries are passed through BY REFERENCE (they are
    not copied — the crop hot loop must not deep-copy full-length tracks,
    measured as the dominant host cost of ``train()``'s data path).
    """

    if skip is None:
        skip = []

    out = dict(track)

    for key in out.keys():
        if key not in skip and _is_array(out[key]):
            entry = to_numpy(out[key])[..., start: stop]

            num_missing = max(0, (stop - start) - entry.shape[-1]) if pad else 0
            if num_missing:
                fill = -1 if key == constants.KEY_TABLATURE else 0
                padding = [(0, 0)] * (entry.ndim - 1) + [(0, num_missing)]
                entry = np.pad(entry, padding, constant_values=fill)
            else:
                # Materialize the view: callers own their crop outright (the
                # source track may live in a dataset's RAM cache)
                entry = np.array(entry)

            out[key] = entry

    return out


def save_dict_npz(path, d):
    """Save a flat dictionary to an npz file (object entries pickled).

    Atomic: written to a temp file and renamed, so a concurrent writer or
    an interrupted run can never leave a truncated cache entry behind
    (dataset feature/ground-truth caches are shared across processes).
    """

    path = str(path)
    if not path.endswith('.npz'):
        # np.savez appends .npz when missing; pin it so the rename matches
        path += '.npz'

    # pid alone is not unique: two loader threads in one process writing
    # the same cache path would race on the temp file and could rename a
    # corrupted archive into the shared cache
    import threading
    tmp = f'{path}.tmp.{os.getpid()}.{threading.get_ident()}'
    try:
        np.savez_compressed(tmp, **d)
        # np.savez appended .npz to the temp name too
        os.replace(f'{tmp}.npz', path)
    finally:
        if os.path.exists(f'{tmp}.npz'):
            os.remove(f'{tmp}.npz')


def load_dict_npz(path):
    """Load a dictionary previously saved with :func:`save_dict_npz`."""

    with np.load(path, allow_pickle=True) as data:
        return {k: data[k] for k in data.files}


def seed_everything(seed):
    """Seed Python/NumPy RNGs; JAX keys are derived explicitly from the seed."""

    import random

    random.seed(seed)
    np.random.seed(seed)

    return seed


##################################################
# TIMING                                         #
##################################################


def get_current_time(decimals=3):
    """Current system time in seconds."""

    return round(time.time(), decimals)


def print_time(t, label=None):
    """Print a time value with an optional label."""

    print(f'{label + " " if label else ""}time : {t} seconds')


def compute_time_difference(start_time, pr=True, label=None, decimals=3):
    """Elapsed seconds since ``start_time`` (optionally printed)."""

    elapsed = round(get_current_time(decimals) - start_time, decimals)

    if pr:
        print_time(elapsed, label)

    return elapsed
