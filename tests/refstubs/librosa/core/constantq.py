"""librosa.core.constantq stub.

The reference's VQT module imports the private helper
``__early_downsample_count`` at module level
(``/root/reference/amt_tools/features/vqt.py``); the name must exist for the
import to succeed. The differential suite never exercises the VQT runtime
path, so calling it fails loudly.
"""


def __early_downsample_count(*args, **kwargs):  # noqa: N807
    raise NotImplementedError(
        'librosa.core.constantq.__early_downsample_count is not implemented '
        'by the differential-test stub')
