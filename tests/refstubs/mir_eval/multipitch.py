def evaluate(*args, **kwargs):
    raise NotImplementedError(
        'mir_eval.multipitch.evaluate is not implemented by the differential-test stub')


def resample_multipitch(*args, **kwargs):
    raise NotImplementedError(
        'mir_eval.multipitch.resample_multipitch is not implemented by the '
        'differential-test stub')
