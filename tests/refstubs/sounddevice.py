"""sounddevice stub.

``/root/reference/amt_tools/features/stream.py:20-24`` guards its import
with ``except OSError`` only, so a missing module (ImportError) would
propagate and break the whole reference import. The stub fails loudly if a
stream is actually opened.
"""


def __getattr__(name):
    raise NotImplementedError(
        f'sounddevice.{name} is not implemented by the differential-test stub')
