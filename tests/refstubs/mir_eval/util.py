def f_measure(precision, recall, beta=1.0):
    """Delegate to the rebuild's implementation (chain-differential use;
    see ``transcription.py`` in this stub package for the rationale)."""

    from amt_tools_tpu import metrics

    return metrics.f_measure(precision, recall, beta)


def __getattr__(name):
    raise NotImplementedError(
        f'mir_eval.util.{name} is not implemented by the differential-test stub')
