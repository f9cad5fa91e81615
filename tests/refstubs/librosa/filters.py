"""librosa.filters stub (import-graph satisfaction only)."""


def window_bandwidth(*args, **kwargs):
    raise NotImplementedError(
        'librosa.filters.window_bandwidth is not implemented by the differential-test stub')


def wavelet_lengths(*args, **kwargs):
    raise NotImplementedError(
        'librosa.filters.wavelet_lengths is not implemented by the differential-test stub')


class _ConstantQ:
    def __getattr__(self, name):
        raise NotImplementedError(
            f'librosa.filters.constant_q.{name} is not implemented by the '
            'differential-test stub')


constant_q = _ConstantQ()
