"""JAX/Pallas compute primitives: spectral transforms, framing, decoding, recurrence."""

from . import spectral
from . import frames
from . import decode

__all__ = ['spectral', 'frames', 'decode']

# pallas_cqt / pallas_stft / lstm are imported lazily by their users (they
# pull in jax.experimental.pallas / flax)
