def precision_recall_f1_overlap(*args, **kwargs):
    raise NotImplementedError(
        'mir_eval.transcription.precision_recall_f1_overlap is not implemented '
        'by the differential-test stub')
