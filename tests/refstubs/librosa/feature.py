"""librosa.feature stub (import-graph satisfaction only)."""


def melspectrogram(*args, **kwargs):
    raise NotImplementedError(
        'librosa.feature.melspectrogram is not implemented by the differential-test stub')
