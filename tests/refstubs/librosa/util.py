"""librosa.util subset used by the reference's conversion utilities.

``pad_center`` and ``frame`` (``/root/reference/amt_tools/tools/utils.py:
2957,2965``) are implemented exactly; everything else fails loudly.
"""

import numpy as np


def pad_center(data, *, size, axis=-1, **kwargs):
    n = data.shape[axis]
    lpad = int((size - n) // 2)
    if lpad < 0:
        raise ValueError(f'Target size ({size}) must be at least input size ({n})')

    lengths = [(0, 0)] * data.ndim
    lengths[axis] = (lpad, int(size - n - lpad))

    return np.pad(data, lengths, **kwargs)


def frame(x, *, frame_length, hop_length, axis=-1):
    if x.shape[axis] < frame_length:
        raise ValueError('Input is too short for the given frame length')

    num_frames = 1 + (x.shape[axis] - frame_length) // hop_length
    # librosa implements this with as_strided; take() is equivalent and safe
    idx = (np.arange(frame_length)[:, None]
           + hop_length * np.arange(num_frames)[None, :])

    if axis not in (-1, x.ndim - 1):
        raise NotImplementedError('stub frame() supports axis=-1 only')

    framed = np.take(x, idx.reshape(-1), axis=axis)

    return framed.reshape(x.shape[:axis if axis >= 0 else x.ndim - 1]
                          + (frame_length, num_frames))


def normalize(*args, **kwargs):
    raise NotImplementedError(
        'librosa.util.normalize is not implemented by the differential-test stub')
