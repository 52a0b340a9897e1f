"""Forced-alignment tests, modeled on the reference test strategy
(reference: test/test_force_alignment.py): hand-built tiny negative
log-prob fixtures with analytically known best paths."""

import numpy as np
import pytest

from pero_ocr_tpu.core.force_alignment import (
    align_text,
    complete_state_seq,
    force_align,
    viterbi_ctc,
    _skip_allowed,
)

LOW = 0.1   # cheap frame
HIGH = 10.0  # expensive frame


class TestCompleteStateSeq:
    def test_single_symbol(self):
        states, chars = complete_state_seq([5], 0)
        np.testing.assert_array_equal(states, [0, 5, 0])
        np.testing.assert_array_equal(chars, [-1, 0, -1])

    def test_two_symbols(self):
        states, chars = complete_state_seq([5, 7], 0)
        np.testing.assert_array_equal(states, [0, 5, 0, 7, 0])
        np.testing.assert_array_equal(chars, [-1, 0, -1, 1, -1])

    def test_blank_in_seq_raises(self):
        with pytest.raises(ValueError):
            complete_state_seq([0, 1], 0)


class TestSkipAllowed:
    def test_distinct_labels_allow_skip(self):
        states, _ = complete_state_seq([1, 2], 0)
        skip = _skip_allowed(states)
        # states: [b, 1, b, 2, b]; only state 3 (label 2) can be skipped into.
        np.testing.assert_array_equal(skip, [False, False, False, True, False])

    def test_repeated_labels_forbid_skip(self):
        states, _ = complete_state_seq([1, 1], 0)
        skip = _skip_allowed(states)
        np.testing.assert_array_equal(skip, [False, False, False, False, False])


class TestForceAlign:
    def test_simple_path(self):
        # Two symbols (1, 2), blank 0; 4 frames. Costs make path b,1,2,2 best.
        neg_logprobs = np.array(
            [
                [LOW, HIGH, HIGH],
                [HIGH, LOW, HIGH],
                [HIGH, HIGH, LOW],
                [HIGH, HIGH, LOW],
            ]
        )
        path = force_align(neg_logprobs, [1, 2], 0)
        assert path == [0, 1, 2, 2]

    def test_repeated_symbol_needs_blank(self):
        # 'aa' needs a blank between the two a's.
        neg_logprobs = np.array(
            [
                [HIGH, LOW],
                [LOW, HIGH],
                [HIGH, LOW],
            ]
        )
        path = force_align(neg_logprobs, [1, 1], 0)
        assert path == [1, 0, 1]

    def test_impossible_alignment_raises(self):
        # 'aa' in 2 frames is impossible (needs >= 3).
        neg_logprobs = np.full((2, 2), LOW)
        with pytest.raises(ValueError):
            force_align(neg_logprobs, [1, 1], 0)

    def test_empty_sequence_raises(self):
        with pytest.raises(ValueError):
            force_align(np.full((3, 2), LOW), [], 0)

    def test_seq_positions(self):
        neg_logprobs = np.array(
            [
                [LOW, HIGH, HIGH],
                [HIGH, LOW, HIGH],
                [HIGH, HIGH, LOW],
            ]
        )
        positions = force_align(neg_logprobs, [1, 2], 0, return_seq_positions=True)
        assert positions == [-1, 0, 1]

    def test_skip_transition_used(self):
        # Distinct labels can follow each other without an intervening blank.
        neg_logprobs = np.array(
            [
                [HIGH, LOW, HIGH],
                [HIGH, HIGH, LOW],
            ]
        )
        path = force_align(neg_logprobs, [1, 2], 0)
        assert path == [1, 2]

    def test_long_random_alignment_is_valid(self):
        rng = np.random.default_rng(0)
        neg_logprobs = rng.uniform(0.0, 5.0, size=(50, 6))
        labels = [1, 2, 3, 2, 5]
        path = force_align(neg_logprobs, labels, 0)
        # Collapsing the path must reproduce the labels.
        collapsed = []
        for s in path:
            if s != 0 and (not collapsed or collapsed[-1] != s or True):
                collapsed.append(s)
        squeezed = []
        prev = None
        for s in path:
            if s != prev:
                squeezed.append(s)
            prev = s
        non_blank = [s for s in squeezed if s != 0]
        assert non_blank == labels


class TestAlignText:
    def test_best_frame_per_char(self):
        neg_logprobs = np.array(
            [
                [LOW, HIGH, HIGH],
                [HIGH, LOW, HIGH],
                [HIGH, 0.5, HIGH],   # second frame of label 1, worse
                [HIGH, HIGH, LOW],
            ]
        )
        positions = align_text(neg_logprobs, np.array([1, 2]), 0)
        assert positions.tolist() == [1, 3]


class TestViterbiBatchedAgainstBruteForce:
    def test_matches_exhaustive_search(self):
        """Compare Viterbi cost against brute-force enumeration on a tiny
        problem."""
        rng = np.random.default_rng(1)
        neg_logprobs = rng.uniform(0.1, 3.0, size=(5, 4))
        labels = [1, 2]
        states, _ = complete_state_seq(labels, 0)
        skip = _skip_allowed(states)
        gathered = neg_logprobs[:, states]
        path = viterbi_ctc(gathered, skip)
        vit_cost = gathered[np.arange(5), path].sum()

        # Brute force over all monotone state paths.
        import itertools

        n_states = len(states)
        best = np.inf
        for assignment in itertools.product(range(n_states), repeat=5):
            if assignment[0] not in (0, 1):
                continue
            if assignment[-1] not in (n_states - 1, n_states - 2):
                continue
            ok = True
            for a, b in zip(assignment, assignment[1:]):
                d = b - a
                if d not in (0, 1, 2) or (d == 2 and not skip[b]):
                    ok = False
                    break
            if not ok:
                continue
            cost = gathered[np.arange(5), list(assignment)].sum()
            best = min(best, cost)
        assert vit_cost == pytest.approx(best)
