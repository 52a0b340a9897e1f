"""ErrorsSummary tests (modeled on reference: test/test_error_summary.py):
per-line CER accounting, confusion counters, boundary-error classes,
aggregation."""

import math

import pytest

from pero_ocr_tpu.error_summary import (
    BoundaryErrorsSummary,
    ErrorsSummary,
    MatchTypes,
    get_match_type,
    get_non_matching_prefix,
    get_non_matching_suffix,
)


class TestMatchType:
    def test_types(self):
        assert get_match_type("a", "a") == MatchTypes.C
        assert get_match_type("a", "b") == MatchTypes.S
        assert get_match_type(None, "b") == MatchTypes.I
        assert get_match_type("a", None) == MatchTypes.D

    def test_double_none_raises(self):
        with pytest.raises(AssertionError):
            get_match_type(None, None)


class TestNonMatching:
    def test_prefix(self):
        types = [MatchTypes.S, MatchTypes.I, MatchTypes.C, MatchTypes.S]
        assert get_non_matching_prefix(types) == [MatchTypes.S, MatchTypes.I]

    def test_suffix(self):
        types = [MatchTypes.C, MatchTypes.S, MatchTypes.D]
        assert get_non_matching_suffix(types) == [MatchTypes.S, MatchTypes.D]

    def test_all_matching(self):
        assert get_non_matching_suffix([MatchTypes.C, MatchTypes.C]) == []


class TestBoundaryErrors:
    def test_correct(self):
        b = BoundaryErrorsSummary([])
        assert b.correct

    def test_pure_deletion(self):
        b = BoundaryErrorsSummary([MatchTypes.D, MatchTypes.D])
        assert b.pure_deletions and not b.mixed_deletions

    def test_mixed_insertion(self):
        b = BoundaryErrorsSummary([MatchTypes.S, MatchTypes.I])
        assert b.mixed_insertions

    def test_pure_substitution(self):
        b = BoundaryErrorsSummary([MatchTypes.S])
        assert b.pure_substitutions

    def test_ins_and_del_raises(self):
        with pytest.raises(AssertionError):
            BoundaryErrorsSummary([MatchTypes.I, MatchTypes.D])


class TestErrorsSummary:
    def test_exact_match(self):
        s = ErrorsSummary.from_lists(list("hello"), list("hello"))
        assert s.nb_errors == 0
        assert s.error_rate == 0
        assert s.ending_errors.correct

    def test_substitution(self):
        s = ErrorsSummary.from_lists(list("abc"), list("axc"))
        assert s.nb_errors == 1
        assert s.nb_subs == 1
        assert s.error_rate == pytest.approx(1 / 3)
        assert s.confusions["b"]["x"] == 1

    def test_insertion_and_deletion(self):
        s_ins = ErrorsSummary.from_lists(list("ac"), list("abc"))
        assert s_ins.nb_inss == 1
        s_del = ErrorsSummary.from_lists(list("abc"), list("ac"))
        assert s_del.nb_dels == 1

    def test_empty_ref(self):
        s = ErrorsSummary.from_lists([], list("ab"))
        assert s.error_rate == math.inf

    def test_aggregate(self):
        s1 = ErrorsSummary.from_lists(list("abc"), list("abc"))
        s2 = ErrorsSummary.from_lists(list("abc"), list("axc"))
        total = ErrorsSummary.aggregate([s1, s2])
        assert total.nb_lines_summarized == 2
        assert total.ref_len == 6
        assert total.nb_errors == 1
        assert total.error_rate == pytest.approx(1 / 6)
        assert total.confusions["b"]["x"] == 1
        assert total.confusions["a"]["a"] == 2

    def test_str(self):
        s = ErrorsSummary.from_lists(list("abcd"), list("abce"))
        text = str(s)
        assert "25.00 %" in text and "sub: 1" in text


class TestLayoutHelpersFilterList:
    """filter_list coverage (reference: test_layout_helpers.py)."""

    def test_remove_by_index(self):
        from pero_ocr_tpu.layout_engines.helpers import filter_list

        assert filter_list(["a", "b", "c"], [1]) == ["a", "c"]

    def test_negative_index(self):
        from pero_ocr_tpu.layout_engines.helpers import filter_list

        assert filter_list(["a", "b", "c"], [-1]) == ["a", "b"]

    def test_out_of_range_raises(self):
        from pero_ocr_tpu.layout_engines.helpers import filter_list

        with pytest.raises(ValueError):
            filter_list(["a"], [5])

    def test_empty_removals(self):
        from pero_ocr_tpu.layout_engines.helpers import filter_list

        assert filter_list(["a", "b"], []) == ["a", "b"]
