"""Confusion-network tests (modeled on
reference: test/test_decoding/test_confusion_networks.py)."""

import math

import pytest

from pero_ocr_tpu.decoding.bag_of_hypotheses import BagOfHypotheses
from pero_ocr_tpu.decoding.confusion_networks import (
    add_hypothese,
    best_cn_path,
    normalize_cn,
    produce_cn_from_boh,
    sorted_cn_paths,
)


class TestAddHypothese:
    def test_first_hypothesis(self):
        cn = add_hypothese([], "ab", 0.6)
        assert cn == [{"a": 0.6}, {"b": 0.6}]

    def test_matching_symbols_accumulate(self):
        cn = add_hypothese([], "ab", 0.6)
        cn = add_hypothese(cn, "ab", 0.3)
        assert cn[0]["a"] == pytest.approx(0.9)
        assert cn[1]["b"] == pytest.approx(0.9)

    def test_substitution_creates_alternative(self):
        cn = add_hypothese([], "ab", 0.6)
        cn = add_hypothese(cn, "ax", 0.3)
        assert cn[0]["a"] == pytest.approx(0.9)
        assert cn[1]["b"] == pytest.approx(0.6)
        assert cn[1]["x"] == pytest.approx(0.3)

    def test_shorter_hypothesis_adds_epsilon(self):
        cn = add_hypothese([], "ab", 0.6)
        cn = add_hypothese(cn, "a", 0.3)
        assert cn[1] == {"b": 0.6, None: 0.3}

    def test_longer_hypothesis_inserts_slot(self):
        cn = add_hypothese([], "ab", 0.6)
        cn = add_hypothese(cn, "axb", 0.3)
        assert len(cn) == 3
        assert "x" in cn[1]
        assert None in cn[1]


class TestNormalize:
    def test_slots_sum_to_one(self):
        cn = add_hypothese([], "ab", 0.6)
        cn = add_hypothese(cn, "ax", 0.2)
        cn = normalize_cn(cn)
        for slot in cn:
            assert sum(slot.values()) == pytest.approx(1.0)


class TestBestPath:
    def test_best_symbols(self):
        cn = [{"a": 0.9, "b": 0.1}, {None: 0.6, "c": 0.4}]
        assert best_cn_path(cn) == "a"

    def test_string_join(self):
        cn = [{"a": 0.9}, {"b": 0.8, "c": 0.2}]
        assert best_cn_path(cn) == "ab"


class TestSortedPaths:
    def test_enumeration(self):
        cn = [{"a": 0.7, "b": 0.3}, {"c": 0.6, None: 0.4}]
        paths = sorted_cn_paths(cn)
        assert len(paths) == 4
        assert paths[0] == ("ac", pytest.approx(0.42))
        probs = [p for _, p in paths]
        assert probs == sorted(probs, reverse=True)
        assert sum(probs) == pytest.approx(1.0)

    def test_empty(self):
        assert sorted_cn_paths([]) == []


class TestFromBag:
    def test_produce_cn(self):
        bag = BagOfHypotheses()
        bag.add("ab", math.log(0.6), 0.0)
        bag.add("ax", math.log(0.4), 0.0)
        cn = produce_cn_from_boh(bag)
        assert cn[0]["a"] == pytest.approx(1.0)
        assert cn[1]["b"] == pytest.approx(0.6)
        assert cn[1]["x"] == pytest.approx(0.4)
