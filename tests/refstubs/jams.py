"""jams stub (import-graph satisfaction for ``tools/io.py:16``)."""


def __getattr__(name):
    raise NotImplementedError(
        f'jams.{name} is not implemented by the differential-test stub')
