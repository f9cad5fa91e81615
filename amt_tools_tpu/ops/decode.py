"""Device-side decoding ops: everything the models' post-processing and the
estimators need inside ``jit``.

jnp counterparts of the host conversions in ``tools.utils`` (the reference
runs these on torch tensors, e.g. ``utils.py:1988-2226``), plus a fully
vectorized on-device note decoder built from suffix scans (replacing the
data-dependent Python loop at the reference's ``utils.py:369-471``).
"""

import jax.numpy as jnp

__all__ = [
    'threshold',
    'pack_bits',
    'unpack_bits',
    'multi_pitch_to_onsets',
    'multi_pitch_to_offsets',
    'logistic_to_tablature',
    'tablature_to_stacked_multi_pitch',
    'stacked_multi_pitch_to_tablature',
    'stacked_multi_pitch_to_multi_pitch',
    'stacked_multi_pitch_to_logistic',
    'note_segments',
    'notes_on_device',
    'notes_from_device',
]


def threshold(activations, thr=0.5):
    """Binarize activations at a threshold."""

    return jnp.where(activations >= thr, 1.0, 0.0)


def pack_bits(x):
    """Pack binary (..., T) activations into (..., ceil(T/8)) uint8 on device.

    8x smaller device->host transfers for thresholded activation maps
    (little-endian bit order; invert with :func:`unpack_bits` or
    ``np.unpackbits(..., bitorder='little')``).
    """

    num_frames = x.shape[-1]
    pad = (-num_frames) % 8
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x = x.reshape(x.shape[:-1] + (-1, 8)).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)

    return (x * weights).sum(-1).astype(jnp.uint8)


def unpack_bits(packed, num_frames):
    """Host-side inverse of :func:`pack_bits` -> float32 binary activations."""

    import numpy as np

    bits = np.unpackbits(np.asarray(packed), axis=-1, bitorder='little')

    return bits[..., :num_frames].astype(np.float32)


def multi_pitch_to_onsets(multi_pitch):
    """Edge-detect activation starts along the last axis."""

    first = multi_pitch[..., :1]
    diff = multi_pitch[..., 1:] - multi_pitch[..., :-1]
    onsets = jnp.concatenate([first, diff], axis=-1)

    return jnp.where(onsets > 0, onsets, 0.0)


def multi_pitch_to_offsets(multi_pitch):
    """Edge-detect activation ends along the last axis."""

    last = multi_pitch[..., -1:]
    diff = -(multi_pitch[..., 1:] - multi_pitch[..., :-1])
    offsets = jnp.concatenate([diff, last], axis=-1)

    return jnp.where(offsets > 0, offsets, 0.0)


def logistic_to_tablature(logistic, profile, silence, silence_thr=0.05):
    """(..., N, T) flattened string/fret activations -> (..., S, T) class ids."""

    num_dofs = profile.get_num_dofs()
    group = profile.num_pitches + int(silence)
    lead = logistic.shape[:-2]

    # (..., S, group, T) view of the flattened activations
    acts = logistic.reshape(lead + (num_dofs, group, logistic.shape[-1]))

    max_acts = jnp.max(acts, axis=-2)
    highest = jnp.argmax(acts, axis=-2)

    if silence:
        tablature = highest - 1
    else:
        tablature = jnp.where(max_acts <= silence_thr, -1, highest)

    return tablature


def tablature_to_stacked_multi_pitch(tablature, profile):
    """(..., S, T) class ids -> (..., S, F, T) one-hot pitch activations."""

    num_pitches = profile.get_range_len()
    tuning = jnp.asarray(profile.get_midi_tuning())

    # Absolute pitch row per (string, frame); silence maps out of range
    pitch_idx = tablature + (tuning - profile.low)[..., :, None]
    pitch_idx = jnp.where(tablature >= 0, pitch_idx, num_pitches)

    one_hot = jnp.arange(num_pitches)[:, None] == pitch_idx[..., None, :]

    return one_hot.astype(jnp.float32)


def tablature_to_local_multi_pitch(tablature, num_classes):
    """(..., S, T) class ids -> (..., S, num_classes, T) LOCAL one-hot.

    Fret-space variant of :func:`tablature_to_stacked_multi_pitch`: row f
    is "fret f active on this string" rather than an absolute pitch row,
    so each string's map has ``num_classes`` (frets + 1) rows instead of
    the instrument's full pitch range — the note decode does ~half the
    row work on a standard guitar (20 fret classes vs a 44-pitch range).
    Map a decoded row back to MIDI with ``row + tuning[string]``.
    """

    one_hot = jnp.arange(num_classes)[:, None] == tablature[..., None, :]

    return one_hot.astype(jnp.float32)


def stacked_multi_pitch_to_tablature(stacked_multi_pitch, profile):
    """(..., S, F, T) stack -> (..., S, T) class ids (-1 = silence)."""

    tuning = profile.get_midi_tuning()
    num_pitches = profile.num_pitches

    tabs = []
    for dof in range(stacked_multi_pitch.shape[-3]):
        lo = int(tuning[dof]) - profile.low
        mp = stacked_multi_pitch[..., dof, lo: lo + num_pitches, :]
        silent = jnp.sum(mp, axis=-2) == 0
        highest = jnp.argmax(mp, axis=-2)
        tabs.append(jnp.where(silent, -1, highest)[..., None, :])

    return jnp.concatenate(tabs, axis=-2)


def stacked_multi_pitch_to_multi_pitch(stacked_multi_pitch):
    """Collapse (..., S, F, T) -> (..., F, T) by max."""

    return jnp.max(stacked_multi_pitch, axis=-3)


def stacked_multi_pitch_to_logistic(stacked_multi_pitch, profile, silence=False):
    """(..., S, F, T) stack -> (..., N, T) flattened string/fret activations."""

    tuning = profile.get_midi_tuning()
    num_pitches = profile.num_pitches

    parts = []
    for dof in range(stacked_multi_pitch.shape[-3]):
        lo = int(tuning[dof]) - profile.low
        mp = stacked_multi_pitch[..., dof, lo: lo + num_pitches, :]
        if silence:
            silent = (jnp.sum(mp, axis=-2, keepdims=True) == 0).astype(mp.dtype)
            mp = jnp.concatenate([silent, mp], axis=-2)
        parts.append(mp)

    return jnp.concatenate(parts, axis=-2)


def note_segments(multi_pitch, onsets=None):
    """Vectorized on-device note segmentation.

    For an (F, T) activation map (optionally gated by an onset map), computes
    per-cell note boundaries with suffix scans:

    Returns ``(onset_impulses, end_frames)`` where ``onset_impulses`` is a
    bool (F, T) map of note starts and ``end_frames[f, t]`` gives, for a note
    starting at frame t of pitch f, the exclusive end frame (first frame > t
    where the pitch deactivates or re-onsets; T if it runs to the edge).

    Host code converts the (sparse) impulse map into a ragged note list; all
    O(F*T) work stays on device.
    """

    if onsets is None:
        onsets = multi_pitch_to_onsets(multi_pitch)

    active = jnp.logical_or(onsets > 0, multi_pitch > 0)

    # Binarize BEFORE edge detection: on a (0, 1) map rising edges can never
    # be adjacent, which is what caps notes at 64 per 128-frame tile in
    # notes_on_device (NOTE_TILE_CAP exactness). An unthresholded float map
    # (e.g. 0.1 -> 0.3 -> 0.7) would otherwise produce adjacent positive
    # diffs and could overflow a tile's compaction silently.
    onset_binary = (onsets > 0).astype(jnp.float32)
    onset_impulses = multi_pitch_to_onsets(onset_binary) > 0

    num_frames = active.shape[-1]

    # int16 frame indices run the suffix scans at 2x VPU throughput
    # ((2,1) packing; 12.5 -> 8.7 ms/batch at serving scale); int32 only
    # for tracks too long to index in 15 bits (~17 min at hop 512)
    idx_dtype = jnp.int16 if num_frames < 2 ** 15 - 1 else jnp.int32
    frame_idx = jnp.arange(num_frames, dtype=idx_dtype)
    sentinel = jnp.asarray(num_frames, idx_dtype)

    # Suffix-min scans: next inactive frame and next onset frame at/after t
    cand_inactive = jnp.where(~active, frame_idx, sentinel)
    next_inactive = _reverse_cummin(cand_inactive)

    cand_onset = jnp.where(onset_impulses, frame_idx, sentinel)
    next_onset = _reverse_cummin(cand_onset)

    # Shift by one: the search starts strictly after the onset frame
    pad_shape = next_inactive.shape[:-1] + (1,)
    pad = jnp.full(pad_shape, num_frames, idx_dtype)
    next_inactive = jnp.concatenate([next_inactive[..., 1:], pad], axis=-1)
    next_onset = jnp.concatenate([next_onset[..., 1:], pad], axis=-1)

    end_frames = jnp.minimum(next_inactive, next_onset).astype(jnp.int32)

    return onset_impulses, end_frames


def _reverse_cummin(x):
    """Cumulative minimum from the right along the last axis."""

    import jax.lax as lax

    return lax.cummin(x, axis=x.ndim - 1, reverse=True)


# Tile geometry for the two-level note compaction: onset impulses are
# RISING EDGES of the onset map, so two adjacent frames can never both be
# impulses and a 128-frame tile holds at most 64 notes — TILE_CAP = 64 is
# exact for every input, not a heuristic.
NOTE_TILE_W = 128
NOTE_TILE_CAP = 64


def notes_on_device(multi_pitch, onsets=None, capacity=1024):
    """Full note decode on device into fixed-capacity compact buffers.

    Extends :func:`note_segments` so the serving loop ships NOTES, not
    activation maps: for an (F, T) activation map, returns
    ``(pitch_rows, onset_frames, offset_frames, count)`` where the first
    three are int32 vectors of length ``capacity`` listing detected notes in
    row-major (pitch-major) order — the same order the host decoder's
    ``np.nonzero`` produces — and ``count`` is the true number of notes
    (entries past ``count`` are zero-fill; ``count > capacity`` signals
    overflow). Convert to (pitches, intervals) with
    :func:`notes_from_device`; together they reproduce
    ``tools.multi_pitch_to_notes`` (reference ``utils.py:369-471``)
    bit-for-bit while keeping all O(F*T) work on device and shrinking the
    device->host transfer to O(capacity).

    The sparse impulse map compacts via a two-level cumsum: per 128-frame
    tile, the j-th impulse position is the count of prefix sums <= j (a
    compare-reduce; exact because impulses cannot be adjacent, see
    ``NOTE_TILE_CAP``), and output slots map to tiles by comparing against
    the running tile-count offsets. No sort, top_k, or scatter touches the
    full F*T grid — measured 1.9x the previous flat ``top_k`` formulation
    (itself ~80x ``jnp.nonzero(size=...)``) at serving scale on v5e.

    Batch with ``jax.vmap`` (``capacity`` is static).
    """

    impulses, end_frames = note_segments(multi_pitch, onsets)
    num_rows, num_frames = impulses.shape

    num_tiles = -(-num_frames // NOTE_TILE_W)
    imp = jnp.pad(impulses, ((0, 0), (0, num_tiles * NOTE_TILE_W - num_frames))
                  ).reshape(num_rows, num_tiles, NOTE_TILE_W)

    # Within-tile ranks; csum is nondecreasing, so the j-th impulse of a
    # tile sits at #(w: csum[w] <= j)
    csum = jnp.cumsum(imp.astype(jnp.int32), axis=-1)
    j_idx = jnp.arange(NOTE_TILE_CAP, dtype=jnp.int32)
    tile_pos = jnp.sum(csum[:, :, None, :] <= j_idx[None, None, :, None],
                       axis=-1).astype(jnp.int32)

    # Row-major tile offsets into the output slots
    counts = csum[..., -1].reshape(-1)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    total = jnp.sum(counts)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    tile_id = jnp.sum(offsets[None, :] <= slots[:, None],
                      axis=-1).astype(jnp.int32) - 1
    j = slots - offsets[tile_id]
    live = slots < jnp.minimum(total, capacity)

    tile_id = jnp.where(live, tile_id, 0)
    j = jnp.where(live, j, 0)

    t_on = ((tile_id % num_tiles) * NOTE_TILE_W +
            tile_pos.reshape(-1, NOTE_TILE_CAP)[tile_id, j])
    row = tile_id // num_tiles

    flat_idx = jnp.where(live, row * num_frames + t_on, 0)
    pitch_rows = jnp.where(live, row, 0).astype(jnp.int32)
    onset_frames = jnp.where(live, t_on, 0).astype(jnp.int32)
    offset_frames = jnp.where(live, end_frames.reshape(-1)[flat_idx],
                              0).astype(jnp.int32)

    return pitch_rows, onset_frames, offset_frames, total


def notes_from_device(pitch_rows, onset_frames, offset_frames, count,
                      times, profile, low=None):
    """Host finalization of :func:`notes_on_device` buffers.

    Returns ``(pitches, intervals)`` identical to
    ``tools.multi_pitch_to_notes`` on the same activation map. O(count) —
    no per-frame work. ``low`` overrides the row -> MIDI offset (default
    ``profile.low``; pass the string's open tuning for LOCAL fret-space
    maps, see :func:`tablature_to_local_multi_pitch`).
    """

    import warnings

    import numpy as np

    from ..tools import utils

    capacity = len(pitch_rows)
    count = int(count)
    if count > capacity:
        warnings.warn(f'notes_on_device overflow: {count} notes > capacity '
                      f'{capacity}; {count - capacity} notes dropped.')
        count = capacity

    if count == 0:
        return np.empty(0), np.empty((0, 2))

    rows = np.asarray(pitch_rows[:count])
    on = np.asarray(onset_frames[:count])
    off = np.asarray(offset_frames[:count])

    times = np.asarray(times)
    times_ext = np.append(times, times[-1] + utils.estimate_hop_length(times))

    pitches = rows + (profile.low if low is None else low)
    intervals = np.stack([times[on], times_ext[off]], axis=-1)

    return utils.sort_notes(pitches.astype(float), intervals)
