def __getattr__(name):
    raise NotImplementedError(
        f'mirdata.datasets.guitarset.{name} is not implemented by the '
        'differential-test stub')
