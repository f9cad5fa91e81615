"""Tests for the native mir_eval-equivalent metrics."""

import numpy as np

from amt_tools_tpu.metrics import (match_notes, precision_recall_f1_overlap,
                                   multipitch_metrics, f_measure)


def test_perfect_match():
    intervals = np.array([[0.0, 1.0], [1.5, 2.0], [2.5, 3.5]])
    pitches = np.array([440.0, 220.0, 330.0])

    p, r, f, avg = precision_recall_f1_overlap(intervals, pitches, intervals, pitches)
    assert p == 1.0 and r == 1.0 and f == 1.0 and abs(avg - 1.0) < 1e-9


def test_onset_tolerance():
    ref_i = np.array([[0.0, 1.0]])
    ref_p = np.array([440.0])

    # Within 50 ms -> match
    est_i = np.array([[0.04, 1.0]])
    p, r, f, _ = precision_recall_f1_overlap(ref_i, ref_p, est_i, ref_p)
    assert f == 1.0

    # Beyond 50 ms -> no match
    est_i = np.array([[0.06, 1.0]])
    p, r, f, _ = precision_recall_f1_overlap(ref_i, ref_p, est_i, ref_p)
    assert f == 0.0


def test_pitch_tolerance():
    ref_i = np.array([[0.0, 1.0]])

    # 49 cents away -> match
    est_p = np.array([440.0 * 2 ** (49 / 1200)])
    _, _, f, _ = precision_recall_f1_overlap(ref_i, [440.0], ref_i, est_p)
    assert f == 1.0

    # 51 cents away -> no match
    est_p = np.array([440.0 * 2 ** (51 / 1200)])
    _, _, f, _ = precision_recall_f1_overlap(ref_i, [440.0], ref_i, est_p)
    assert f == 0.0


def test_offset_criterion():
    ref_i = np.array([[0.0, 1.0]])
    ref_p = np.array([440.0])

    # Offset off by 0.3 s: fine without offset criterion
    est_i = np.array([[0.0, 1.3]])
    _, _, f, _ = precision_recall_f1_overlap(ref_i, ref_p, est_i, ref_p)
    assert f == 1.0

    # With offset_ratio=0.2: tolerance = max(0.05, 0.2 * 1.0) = 0.2 -> fail
    _, _, f, _ = precision_recall_f1_overlap(ref_i, ref_p, est_i, ref_p,
                                             offset_ratio=0.2)
    assert f == 0.0

    # Offset off by 0.15 s -> within 0.2 tolerance
    est_i = np.array([[0.0, 1.15]])
    _, _, f, _ = precision_recall_f1_overlap(ref_i, ref_p, est_i, ref_p,
                                             offset_ratio=0.2)
    assert f == 1.0


def test_bipartite_matching_one_to_one():
    """Two estimates near one reference: only one may match."""

    ref_i = np.array([[0.0, 1.0]])
    ref_p = np.array([440.0])
    est_i = np.array([[0.0, 1.0], [0.01, 1.0]])
    est_p = np.array([440.0, 440.0])

    matching = match_notes(ref_i, ref_p, est_i, est_p)
    assert len(matching) == 1

    p, r, f, _ = precision_recall_f1_overlap(ref_i, ref_p, est_i, est_p)
    assert p == 0.5 and r == 1.0


def test_matching_prefers_maximum():
    """Greedy would fail this; maximum matching finds both pairs."""

    # ref0 matches est0 and est1; ref1 matches only est0.
    # Maximum matching: ref0-est1, ref1-est0.
    ref_i = np.array([[0.0, 1.0], [0.04, 1.0]])
    ref_p = np.array([440.0, 440.0])
    est_i = np.array([[0.0, 1.0], [0.045, 1.0]])
    est_p = np.array([440.0, 440.0])
    # est1 onset 0.045: |0.045-0| <= 0.05 matches ref0; |0.045-0.04| matches ref1
    # est0 onset 0: matches ref0 and ref1 (|0-0.04|<=0.05)
    matching = match_notes(ref_i, ref_p, est_i, est_p)
    assert len(matching) == 2


def test_empty_inputs():
    p, r, f, avg = precision_recall_f1_overlap(np.empty((0, 2)), [], [[0, 1]], [440.0])
    assert (p, r, f, avg) == (0.0, 0.0, 0.0, 0.0)

    p, r, f, avg = precision_recall_f1_overlap([[0, 1]], [440.0], np.empty((0, 2)), [])
    assert (p, r, f, avg) == (0.0, 0.0, 0.0, 0.0)


def test_multipitch_metrics_perfect():
    times = np.arange(10) * 0.01
    freqs = [np.array([440.0, 220.0])] * 10

    m = multipitch_metrics(times, freqs, times, freqs)
    assert m['Precision'] == 1.0 and m['Recall'] == 1.0 and m['Accuracy'] == 1.0


def test_multipitch_metrics_partial():
    times = np.arange(4) * 0.01
    ref = [np.array([440.0]), np.array([440.0]), np.array([440.0]), np.array([440.0])]
    est = [np.array([440.0]), np.array([440.0]), np.array([880.0]), np.array([])]

    m = multipitch_metrics(times, ref, times, est)
    # 2 TP out of 3 estimates, 4 references
    assert abs(m['Precision'] - 2 / 3) < 1e-9
    assert abs(m['Recall'] - 0.5) < 1e-9


def test_multipitch_window_cents():
    times = np.arange(3) * 0.01
    ref = [np.array([440.0])] * 3
    # 30 cents sharp: matches at 50-cent window, not at 10-cent
    est = [np.array([440.0 * 2 ** (30 / 1200)])] * 3

    assert multipitch_metrics(times, ref, times, est, window=50.0)['Recall'] == 1.0
    assert multipitch_metrics(times, ref, times, est, window=10.0)['Recall'] == 0.0


def test_f_measure():
    assert f_measure(1.0, 1.0) == 1.0
    assert f_measure(0.0, 0.0) == 0.0
    assert abs(f_measure(0.5, 1.0) - 2 / 3) < 1e-9
