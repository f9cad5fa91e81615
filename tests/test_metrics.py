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


# --- Independent-oracle fixtures (round-5 advisor item) -------------------
#
# The reference-chain differentials route mir_eval calls through a stub that
# delegates to THIS metric core, so a bug in the core would pass those tests
# on both sides. These fixtures ground the core externally: a brute-force
# augmenting-path maximum-matching oracle, implemented independently below
# from mir_eval's published rules (onset within 50 ms, pitch within 50
# cents, offset within max(50 ms, offset_ratio * ref duration); maximal
# one-to-one matching — reference mir_eval.transcription.match_notes).


def _oracle_prf(ref_i, ref_p, est_i, est_p, offset_ratio=None):
    ref_i, est_i = np.asarray(ref_i, float), np.asarray(est_i, float)
    ref_p, est_p = np.asarray(ref_p, float), np.asarray(est_p, float)

    edges = [[] for _ in range(len(ref_p))]
    for i in range(len(ref_p)):
        for j in range(len(est_p)):
            if abs(ref_i[i, 0] - est_i[j, 0]) > 0.05:
                continue
            if abs(1200 * np.log2(est_p[j] / ref_p[i])) > 50.0:
                continue
            if offset_ratio is not None:
                tol = max(0.05, offset_ratio * (ref_i[i, 1] - ref_i[i, 0]))
                if abs(ref_i[i, 1] - est_i[j, 1]) > tol:
                    continue
            edges[i].append(j)

    # Simple DFS augmenting-path maximum matching (independent of the
    # library's Hopcroft-Karp implementation)
    match_of_est = {}

    def try_augment(i, seen):
        for j in edges[i]:
            if j in seen:
                continue
            seen.add(j)
            if j not in match_of_est or try_augment(match_of_est[j], seen):
                match_of_est[j] = i
                return True
        return False

    matched = sum(try_augment(i, set()) for i in range(len(ref_p)))

    p = matched / max(1, len(est_p))
    r = matched / max(1, len(ref_p))
    f = 2 * p * r / max(1e-12, p + r) if (p + r) else 0.0
    return p, r, f


def test_against_brute_force_oracle():
    """Randomized-but-fixed note sets vs the independent matching oracle.

    Perturbations are drawn away from the exact tolerance boundaries so
    <= vs < disagreements cannot produce spurious failures.
    """

    rng = np.random.RandomState(42)

    for trial in range(20):
        n_ref = rng.randint(1, 12)
        onsets = np.sort(rng.rand(n_ref) * 4.0)
        durations = 0.15 + rng.rand(n_ref) * 0.8
        ref_i = np.stack([onsets, onsets + durations], axis=1)
        ref_p = 220.0 * 2 ** (rng.randint(0, 36, n_ref) / 12.0)

        # Estimates: perturbed copies (some matching, some not) + spurious
        est_rows = []
        est_p = []
        for i in range(n_ref):
            kind = rng.randint(0, 4)
            if kind == 0:   # clean hit (small jitter, far from 50 ms edge)
                d_on, d_cents = rng.uniform(-0.03, 0.03), rng.uniform(-30, 30)
            elif kind == 1:  # onset miss
                d_on, d_cents = rng.choice([-1, 1]) * rng.uniform(0.08, 0.3), 0.0
            elif kind == 2:  # pitch miss
                d_on, d_cents = 0.0, rng.choice([-1, 1]) * rng.uniform(70, 300)
            else:            # dropped note
                continue
            est_rows.append([ref_i[i, 0] + d_on,
                             ref_i[i, 1] + rng.uniform(-0.02, 0.02)])
            est_p.append(ref_p[i] * 2 ** (d_cents / 1200))
        for _ in range(rng.randint(0, 3)):  # spurious
            on = rng.rand() * 4.0
            est_rows.append([on, on + 0.3])
            est_p.append(2000.0 * 2 ** rng.uniform(0, 1))

        if not est_rows:
            est_rows = [[0.0, 0.1]]
            est_p = [5000.0]
        est_i = np.array(est_rows)
        est_p = np.array(est_p)

        for offset_ratio in (None, 0.2):
            p0, r0, f0 = _oracle_prf(ref_i, ref_p, est_i, est_p, offset_ratio)
            p, r, f, _ = precision_recall_f1_overlap(
                ref_i, ref_p, est_i, est_p, offset_ratio=offset_ratio)
            assert abs(p - p0) < 1e-9 and abs(r - r0) < 1e-9 \
                and abs(f - f0) < 1e-9, \
                (trial, offset_ratio, (p, r, f), (p0, r0, f0))


def test_evaluator_chain_against_oracle():
    """NoteEvaluator end-to-end == oracle on a fixed non-trivial case.

    Exercises the full chain (batched notes -> stacked notes -> evaluator
    -> P/R/F1 dict) against golden values from the independent oracle, so
    the evaluator plumbing is grounded without mir_eval installed.
    """

    from amt_tools_tpu import tools
    from amt_tools_tpu.evaluate import NoteEvaluator

    # 4 refs; est: 1 clean hit, 1 onset-late (0.2 s), 1 pitch-off (2
    # semitones), 1 duplicate of the clean hit, 1 spurious
    ref_i = np.array([[0.0, 1.0], [1.5, 2.2], [2.5, 3.0], [3.2, 3.9]])
    ref_p = np.array([261.63, 329.63, 392.0, 440.0])
    est_i = np.array([[0.01, 1.02], [1.7, 2.2], [2.5, 3.0],
                      [0.02, 0.98], [4.0, 4.3]])
    est_p = np.array([261.63, 329.63, 392.0 * 2 ** (2 / 12), 261.63, 880.0])

    p0, r0, f0 = _oracle_prf(ref_i, ref_p, est_i, est_p)
    assert (p0, r0) == (1 / 5, 1 / 4)  # hand check: only the clean hit pair

    batched_ref = tools.notes_to_batched_notes(ref_p, ref_i)
    batched_est = tools.notes_to_batched_notes(est_p, est_i)

    results = NoteEvaluator().evaluate(batched_est, batched_ref)
    assert abs(results[tools.KEY_PRECISION] - p0) < 1e-9
    assert abs(results[tools.KEY_RECALL] - r0) < 1e-9
    assert abs(results[tools.KEY_F1] - f0) < 1e-9
