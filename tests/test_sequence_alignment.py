"""Levenshtein tests (modeled on reference: test/test_sequence_alignment.py)."""

import numpy as np
import pytest

from pero_ocr_tpu.sequence_alignment import (
    edit_stats_for_alignment,
    levenshtein_alignment,
    levenshtein_alignment_path,
    levenshtein_alignment_substring,
    levenshtein_distance,
    levenshtein_distance_substring,
)


class TestDistance:
    @pytest.mark.parametrize(
        "a,b,d",
        [
            ("", "", 0),
            ("abc", "abc", 0),
            ("abc", "abd", 1),
            ("abc", "ab", 1),
            ("ab", "abc", 1),
            ("kitten", "sitting", 3),
            ("abc", "", 3),
            ("", "abc", 3),
            ("flaw", "lawn", 2),
        ],
    )
    def test_cases(self, a, b, d):
        assert levenshtein_distance(list(a), list(b)) == d

    def test_custom_costs(self):
        # Substitution cost 3 forces del+ins (cost 2) instead.
        assert levenshtein_distance(list("a"), list("b"), sub_cost=3) == 2

    def test_random_symmetric(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            a = rng.integers(0, 4, size=rng.integers(0, 10)).tolist()
            b = rng.integers(0, 4, size=rng.integers(0, 10)).tolist()
            assert levenshtein_distance(a, b) == levenshtein_distance(b, a)

    def test_matches_naive_dp(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            a = rng.integers(0, 3, size=rng.integers(1, 9)).tolist()
            b = rng.integers(0, 3, size=rng.integers(1, 9)).tolist()

            # Straightforward reference DP.
            m, n = len(a), len(b)
            D = np.zeros((m + 1, n + 1))
            D[:, 0] = np.arange(m + 1)
            D[0, :] = np.arange(n + 1)
            for i in range(1, m + 1):
                for j in range(1, n + 1):
                    D[i, j] = min(
                        D[i - 1, j] + 1,
                        D[i, j - 1] + 1,
                        D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                    )
            assert levenshtein_distance(a, b) == D[m, n]


class TestAlignment:
    def test_identity(self):
        alig = levenshtein_alignment(list("abc"), list("abc"))
        assert alig == [("a", "a"), ("b", "b"), ("c", "c")]

    def test_substitution(self):
        alig = levenshtein_alignment(list("abc"), list("axc"))
        assert alig == [("a", "a"), ("b", "x"), ("c", "c")]

    def test_deletion_and_insertion_markers(self):
        alig = levenshtein_alignment(list("ac"), list("abc"))
        assert (None, "b") in alig
        alig = levenshtein_alignment(list("abc"), list("ac"))
        assert ("b", None) in alig

    def test_alignment_cost_consistent(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            a = rng.integers(0, 3, size=rng.integers(1, 8)).tolist()
            b = rng.integers(0, 3, size=rng.integers(1, 8)).tolist()
            alig = levenshtein_alignment(a, b)
            # Reconstruction: sources and targets in order.
            src = [p[0] for p in alig if p[0] is not None]
            tgt = [p[1] for p in alig if p[1] is not None]
            assert src == a
            assert tgt == b
            # Cost of the alignment equals the distance.
            cost = sum(
                1
                for s, t in alig
                if s is None or t is None or s != t
            )
            assert cost == levenshtein_distance(a, b)


class TestAlignmentPath:
    def test_directions(self):
        path = levenshtein_alignment_path(list("abc"), list("abc"))
        assert path == [0, 0, 0]

    def test_insertion_direction(self):
        path = levenshtein_alignment_path(list("ac"), list("abc"))
        assert path.count(-1) == 1 and path.count(0) == 2


class TestEditStats:
    def test_counts(self):
        alig = [("a", "a"), ("b", "x"), (None, "c"), ("d", None)]
        nphn, ncor, nins, ndel, nsub = edit_stats_for_alignment(alig)
        assert (nphn, ncor, nins, ndel, nsub) == (3, 1, 1, 1, 1)

    def test_empty(self):
        assert edit_stats_for_alignment([]) == (0, 0, 0, 0, 0)


class TestSubstring:
    def test_exact_substring_free(self):
        assert levenshtein_distance_substring(list("xxhelloyy"), list("hello")) == 0

    def test_substring_with_error(self):
        assert levenshtein_distance_substring(list("xxhellqyy"), list("hello")) == 1

    def test_alignment_substring_reconstruction(self):
        alig = levenshtein_alignment_substring(list("xxabyy"), list("ab"))
        src = [p[0] for p in alig if p[0] is not None]
        assert src == list("xxabyy")
        matched = [(s, t) for s, t in alig if t is not None]
        assert matched == [("a", "a"), ("b", "b")]
