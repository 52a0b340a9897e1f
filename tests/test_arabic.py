"""Tests for the unicodedata-derived Arabic shaping helper."""

import pytest

from pero_ocr_tpu.core.arabic import ArabicHelper


@pytest.fixture(scope="module")
def helper():
    return ArabicHelper()


class TestDetection:
    def test_arabic_word(self, helper):
        assert helper.is_arabic_word("سلام")
        assert not helper.is_arabic_word("hello")

    def test_arabic_line(self, helper):
        assert helper.is_arabic_line("text with سلام inside")
        assert not helper.is_arabic_line("only latin words")


class TestReverse:
    def test_pure_arabic_is_reversed(self, helper):
        text = "سلام"
        assert helper.string_to_label_form(text) == text[::-1]

    def test_latin_kept_forward(self, helper):
        text = "hello"
        assert helper.string_to_label_form(text) == "hello"

    def test_roundtrip_mixed(self, helper):
        text = "قال 123 ثم ذهب"
        label = helper.string_to_label_form(text)
        # label form -> string must be the identity inverse
        assert helper.label_form_to_string(label) == text

    def test_involution_on_pure_arabic(self, helper):
        text = "مرحبا بالعالم"
        assert helper.label_form_to_string(helper.string_to_label_form(text)) == text


class TestReshape:
    def test_isolated_form(self, helper):
        # Lone 'ب' (BEH) must map to its isolated presentation form U+FE8F.
        out = helper.reshape("ب")
        assert out == "ﺏ"

    def test_connected_forms(self, helper):
        # "بب" -> initial BEH (U+FE91) + final BEH (U+FE90).
        out = helper.reshape("بب")
        assert out == "ﺑﺐ"

    def test_lam_alef_ligature(self, helper):
        # "لا" -> lam-alef isolated ligature U+FEFB.
        out = helper.reshape("لا")
        assert out == "ﻻ"

    def test_visual_roundtrip(self, helper):
        text = "سلام"
        visual = helper.string_to_visual_form(text)
        assert visual != text
        back = helper.visual_form_to_string(visual)
        assert back == text

    def test_visual_roundtrip_with_ligature(self, helper):
        text = "سلام لا"
        back = helper.visual_form_to_string(helper.string_to_visual_form(text))
        assert back == text


class TestLigaturesMapping:
    def test_plain_chars_map_one_to_one(self, helper):
        mapping = helper.ligatures_mapping("ab")
        assert mapping == [[0], [1]]

    def test_ligature_expands(self, helper):
        lam_alef_iso = "ﻻ"
        mapping = helper.ligatures_mapping("a" + lam_alef_iso + "b")
        assert mapping == [[0], [1, 2], [3]]
