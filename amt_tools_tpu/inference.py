"""Offline and mock-real-time (online) inference entry points.

Capability parity with the reference's ``amt_tools/inference.py:12-146``. In
the functional design, model parameters (``variables``) are passed explicitly
and the forward pipeline is jit-compiled once per feature shape — the online
loop re-uses the compiled per-frame step, so dispatch overhead stays constant.

Divergence from the reference: accumulated note predictions keep the (N, 3)
batched-note convention throughout (the reference accumulates transposed
(3, N) arrays and fixes them up afterwards, ``inference.py:136-140``).
"""

import numpy as np

from . import tools
from .models.common import run_on_batch

__all__ = [
    'run_offline',
    'run_offline_batched',
    'run_single_frame',
    'run_online',
    'run_online_stateful',
]


def _predict(model, variables, batch):
    """Run the model pipeline on a device batch and pull results to host."""

    output, _ = run_on_batch(model, variables, batch, train=False)

    return tools.dict_squeeze(tools.dict_to_array(output), dim=0)


def run_offline(track_data, model, variables, estimator=None, bucket=0):
    """Whole-track inference: features -> predictions -> (estimates).

    With ``bucket`` > 0, features are zero-padded along time to the next
    multiple of ``bucket`` frames and a valid-frame count is threaded into
    the model's masked recurrence — so whole-dataset evaluation reuses one
    compiled executable per bucket instead of recompiling per track length,
    with EXACT results for the valid frames (padded tails are trimmed).

    Caveat: monitoring loss terms are averaged over padded + valid frames,
    so reported validation losses are diluted by each track's padding
    fraction (predictions and metrics are unaffected). Use ``bucket=0``
    when exact loss values matter.
    """

    track_id = tools.unpack_dict(track_data, tools.KEY_TRACK)

    track_data = tools.dict_to_dtype(track_data, dtype=tools.FLOAT32)

    arrays = {k: v for k, v in track_data.items() if tools.utils._is_array(v)}

    num_frames = None
    if bucket and tools.query_dict(arrays, tools.KEY_FEATS):
        num_frames = np.asarray(arrays[tools.KEY_FEATS]).shape[-1]
        padded = -(-num_frames // bucket) * bucket
        if padded != num_frames:
            # Pad every frame-aligned entry (features, labels, times) so the
            # model's loss terms see consistently-shaped references;
            # tablature pads with -1 (the slice_track convention)
            for key, value in list(arrays.items()):
                value = np.asarray(value)
                if value.ndim >= 1 and value.shape[-1] == num_frames:
                    fill = -1 if key == tools.KEY_TABLATURE else 0
                    pad = [(0, 0)] * (value.ndim - 1) + [(0, padded - num_frames)]
                    arrays[key] = np.pad(value, pad, constant_values=fill)
        arrays[tools.KEY_VALID_FRAMES] = np.asarray(num_frames)

    # Treat the track as a batch of one
    batch = tools.dict_unsqueeze(tools.dict_to_jax(arrays))

    predictions = _predict(model, variables, batch)

    if num_frames is not None:
        # Trim every frame-aligned entry back to the true length
        predictions = {
            k: (v[..., :num_frames]
                if tools.utils._is_array(v) and getattr(v, 'ndim', 0) >= 1
                and v.shape[-1] == -(-num_frames // bucket) * bucket else v)
            for k, v in predictions.items()}
        predictions.pop(tools.KEY_VALID_FRAMES, None)

    if estimator is not None:
        predictions.update(estimator.process_track(predictions, track_id))

    return predictions


def run_offline_batched(track_datas, model, variables, estimator=None,
                        bucket=128):
    """Whole-track inference on SEVERAL tracks per dispatch.

    Batched counterpart of :func:`run_offline` (BASELINE "batched
    whole-dataset eval"): every track is padded to the group's bucketed
    frame count, frame-aligned entries are stacked into one batch, and a
    single forward serves all of them — per-track predictions come back
    exact via the masked recurrence (``KEY_VALID_FRAMES``), trimmed to each
    track's true length. Entries that are not frame-aligned (audio, ragged
    notes/pitch lists) are dropped from the model batch.

    Returns one predictions dict per input track. Monitoring loss terms
    are batch-level (identical for every track in the group; their mean
    over equally-sized groups equals the overall mean).
    """

    if not track_datas:
        return []

    track_ids = [tools.unpack_dict(t, tools.KEY_TRACK) for t in track_datas]

    prepared = []
    frame_counts = []
    for track_data in track_datas:
        track_data = tools.dict_to_dtype(track_data, dtype=tools.FLOAT32)
        arrays = {k: v for k, v in track_data.items()
                  if tools.utils._is_array(v)}
        frame_counts.append(np.asarray(arrays[tools.KEY_FEATS]).shape[-1])
        prepared.append(arrays)

    padded = -(-max(frame_counts) // bucket) * bucket

    # Keys every track provides with a frame-aligned last axis
    keys = set(prepared[0])
    for arrays in prepared[1:]:
        keys &= set(arrays)
    keys = [k for k in sorted(keys)
            if all(np.asarray(a[k]).ndim >= 1 and
                   np.asarray(a[k]).shape[-1] == n
                   for a, n in zip(prepared, frame_counts))]

    batch = {}
    for key in keys:
        fill = -1 if key == tools.KEY_TABLATURE else 0
        stacked = []
        for arrays, num_frames in zip(prepared, frame_counts):
            value = np.asarray(arrays[key])
            pad = [(0, 0)] * (value.ndim - 1) + [(0, padded - num_frames)]
            stacked.append(np.pad(value, pad, constant_values=fill))
        batch[key] = np.stack(stacked)

    batch[tools.KEY_VALID_FRAMES] = np.asarray(frame_counts)

    output, _ = run_on_batch(model, variables, tools.dict_to_jax(batch),
                             train=False)
    output = tools.dict_to_array(output)

    all_predictions = []
    for index, (track_id, num_frames) in enumerate(zip(track_ids, frame_counts)):
        predictions = {}
        for key, value in output.items():
            if tools.utils._is_array(value) and getattr(value, 'ndim', 0) >= 1 \
                    and value.shape[0] == len(track_ids):
                entry = value[index]
                if getattr(entry, 'ndim', 0) >= 1 and entry.shape[-1] == padded:
                    entry = entry[..., :num_frames]
                predictions[key] = entry
            else:
                predictions[key] = value
        predictions.pop(tools.KEY_VALID_FRAMES, None)

        if estimator is not None:
            predictions.update(estimator.process_track(predictions, track_id))

        all_predictions.append(predictions)

    return all_predictions


def run_single_frame(track_data, model, variables, estimator=None):
    """Inference on a single (batched) frame group."""

    track_id = tools.unpack_dict(track_data, tools.KEY_TRACK)

    track_data = tools.dict_to_dtype(track_data, dtype=tools.FLOAT32)
    batch = tools.dict_to_jax(
        {k: v for k, v in track_data.items() if tools.utils._is_array(v)})

    new_predictions = _predict(model, variables, batch)

    if estimator is not None:
        new_predictions.update(estimator.process_track(new_predictions, track_id))

    return new_predictions


def run_online(track_data, model, variables, estimator=None):
    """Mock-real-time inference: feed one frame group at a time.

    Features are windowed by the model's ``frame_width`` and each window is
    processed independently (stateful estimators such as
    ``IterativeNoteTranscriber`` accumulate notes across calls).
    """

    features = tools.unpack_dict(track_data, tools.KEY_FEATS)
    times = tools.unpack_dict(track_data, tools.KEY_TIMES)

    num_frame_groups = features.shape[-1]

    # Window the features to mimic real-time operation
    features = tools.framify_activations(np.asarray(features), model.frame_width)

    predictions = {}
    note_chunks = []

    for i in range(num_frame_groups):
        batch = tools.dict_unsqueeze({
            tools.KEY_FEATS: features[..., i, :],
            tools.KEY_TIMES: times[..., i: i + 1],
        })

        new_predictions = run_single_frame(batch, model, variables, estimator)

        # Accumulate notes separately: they are ragged (N, 3) collections
        if tools.query_dict(new_predictions, tools.KEY_NOTES):
            note_chunks.append(np.asarray(new_predictions.pop(tools.KEY_NOTES)).reshape(-1, 3))

        predictions = tools.dict_append(predictions, new_predictions)

    if note_chunks:
        predictions[tools.KEY_NOTES] = np.concatenate(note_chunks, axis=0)

    if estimator is not None:
        # Reset streaming state for the next track
        estimator.reset_state()

    return predictions


def run_online_stateful(track_data, model, variables, estimator=None):
    """Frame-at-a-time inference for carry-threading streaming models.

    For models exposing ``init_carries``/``__call__(feats, carries=...)``
    (e.g. ``OnsetsFramesOnline``): each frame is processed with full
    recurrent context carried across calls — true low-latency streaming
    rather than independent context windows.
    """

    import jax
    import jax.numpy as jnp

    features = np.asarray(tools.unpack_dict(track_data, tools.KEY_FEATS),
                          dtype=np.float32)
    times = np.asarray(tools.unpack_dict(track_data, tools.KEY_TIMES))
    track_id = tools.unpack_dict(track_data, tools.KEY_TRACK)

    num_frames = features.shape[-1]

    carries = model.init_carries(1)

    # One compiled step reused for every frame
    @jax.jit
    def step(variables, frame, carries):
        batch = model.pre_proc({tools.KEY_FEATS: frame})
        return model.apply(variables, batch[tools.KEY_FEATS],
                           carries=carries)

    predictions = {}
    note_chunks = []

    for i in range(num_frames):
        frame = jnp.asarray(features[None, ..., i: i + 1])

        raw, carries = step(variables, frame, carries)

        batch = {tools.KEY_OUTPUT: raw, tools.KEY_TIMES: times[i: i + 1][None]}
        output = model.post_proc(batch)
        output[tools.KEY_TIMES] = batch[tools.KEY_TIMES]

        new_predictions = tools.dict_squeeze(tools.dict_to_array(output), dim=0)

        if estimator is not None:
            new_predictions.update(estimator.process_track(new_predictions, track_id))

        if tools.query_dict(new_predictions, tools.KEY_NOTES):
            note_chunks.append(
                np.asarray(new_predictions.pop(tools.KEY_NOTES)).reshape(-1, 3))

        predictions = tools.dict_append(predictions, new_predictions)

    if note_chunks:
        predictions[tools.KEY_NOTES] = np.concatenate(note_chunks, axis=0)

    if estimator is not None:
        estimator.reset_state()

    return predictions
