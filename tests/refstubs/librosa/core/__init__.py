"""librosa.core stub (import-graph satisfaction only)."""

from . import constantq  # noqa: F401


def amplitude_to_db(*args, **kwargs):
    raise NotImplementedError(
        'librosa.core.amplitude_to_db is not implemented by the differential-test stub')


def power_to_db(*args, **kwargs):
    raise NotImplementedError(
        'librosa.core.power_to_db is not implemented by the differential-test stub')
