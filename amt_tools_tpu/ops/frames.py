"""Device-side framing / windowing ops (jit- and vmap-safe).

The reference framifies TabCNN inputs on the host with a GPU->numpy->GPU
round trip every batch (``models/tabcnn.py:122-127``); here framification is
a pure jnp gather that stays inside the compiled graph.
"""

import jax.numpy as jnp

__all__ = [
    'framify',
]


def framify(activations, win_length, hop_length=1, pad=True):
    """Chunk (..., T) activations into (..., T', win_length) windows.

    Matches ``tools.utils.framify_activations`` semantics: with ``pad`` the
    input is zero center-padded so T' = T and window t is centered on frame t.
    """

    activations = jnp.asarray(activations)
    num_frames = activations.shape[-1]
    pad_length = win_length // 2

    if pad:
        target = num_frames + 2 * pad_length
    else:
        target = max(win_length, num_frames)

    lpad = (target - num_frames) // 2
    rpad = target - num_frames - lpad
    padding = [(0, 0)] * (activations.ndim - 1) + [(lpad, rpad)]
    activations = jnp.pad(activations, padding)

    num_hops = (target - 2 * pad_length) // hop_length

    starts = jnp.arange(num_hops) * hop_length
    idcs = starts[:, None] + jnp.arange(win_length)[None, :]

    return jnp.take(activations, idcs, axis=-1)
