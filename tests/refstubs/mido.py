"""mido stub (import-graph satisfaction for ``tools/io.py:15``)."""


def __getattr__(name):
    raise NotImplementedError(
        f'mido.{name} is not implemented by the differential-test stub')
