def __getattr__(name):
    raise NotImplementedError(
        f'mir_eval.util.{name} is not implemented by the differential-test stub')
