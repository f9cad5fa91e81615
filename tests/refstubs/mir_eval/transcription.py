def precision_recall_f1_overlap(*args, **kwargs):
    """Delegate to the rebuild's native implementation.

    The estimator/evaluator CHAIN differentials exercise the reference's
    plumbing around the metric (unpack keys, batched-note conversions,
    Hz conversion, slice averaging) — for those the reference side needs a
    working note matcher. Delegating to ``amt_tools_tpu.metrics`` (its own
    mir_eval-parity implementation, unit-tested in ``test_metrics.py``)
    keeps the chain comparison meaningful while making the shared metric
    core explicit rather than circular-by-accident.
    """

    from amt_tools_tpu import metrics

    return metrics.precision_recall_f1_overlap(*args, **kwargs)
