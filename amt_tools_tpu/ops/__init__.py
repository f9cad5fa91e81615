"""JAX/Pallas compute primitives: spectral transforms, framing, decoding, recurrence."""

from . import spectral
from . import frames
from . import decode

__all__ = ['spectral', 'frames', 'decode']
