"""Tests for the core data model and Page XML / logits round trips.

The reference ships no XML serialization tests (SURVEY.md §4); these
golden-behavior tests close that gap.
"""

import numpy as np
import pytest
import scipy.sparse

from pero_ocr_tpu.core.layout import PageLayout, RegionLayout, TextLine


def make_page():
    layout = PageLayout(id="page1.jpg", page_size=(1000, 800))
    region = RegionLayout(
        "r001",
        np.array([[10, 10], [700, 10], [700, 200], [10, 200]]),
        region_type="paragraph",
    )
    line = TextLine(
        id="r001-l001",
        index=0,
        baseline=np.array([[20, 100], [600, 102]]),
        polygon=np.array([[20, 70], [600, 72], [600, 110], [20, 108]]),
        heights=[30.0, 8.0],
        transcription="Hello world",
        transcription_confidence=0.95,
    )
    region.lines.append(line)
    layout.regions.append(region)
    return layout


class TestPageXML:
    def test_round_trip(self):
        layout = make_page()
        xml = layout.to_pagexml_string()
        assert "PcGts" in xml and "heights_v2" in xml

        restored = PageLayout()
        restored.from_pagexml_string(xml)
        assert restored.id == "page1.jpg"
        assert restored.page_size == (1000, 800)
        assert len(restored.regions) == 1
        region = restored.regions[0]
        assert region.id == "r001"
        assert region.region_type == "paragraph"
        assert len(region.lines) == 1
        line = region.lines[0]
        assert line.id == "r001-l001"
        assert line.transcription == "Hello world"
        assert line.transcription_confidence == pytest.approx(0.95, abs=1e-3)
        np.testing.assert_allclose(line.heights, [30.0, 8.0])
        np.testing.assert_array_equal(line.baseline, [[20, 100], [600, 102]])

    def test_reading_order_round_trip(self):
        layout = make_page()
        r2 = RegionLayout("r002", np.array([[10, 300], [700, 300], [700, 400], [10, 400]]))
        layout.regions.append(r2)
        layout.reading_order = {"r002": 0, "r001": 1}
        xml = layout.to_pagexml_string()

        restored = PageLayout()
        restored.from_pagexml_string(xml)
        assert restored.reading_order == {"r002": 0, "r001": 1}
        restored.sort_regions_by_reading_order()
        assert [r.id for r in restored.regions] == ["r002", "r001"]

    def test_legacy_heights_parsing(self):
        xml = """<?xml version="1.0" encoding="utf-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
<Page imageFilename="x.jpg" imageWidth="100" imageHeight="100">
<TextRegion id="r1"><Coords points="0,0 99,0 99,99 0,99"/>
<TextLine id="l1" custom="heights:[10, 4, 12, 0]">
<Coords points="0,0 99,0 99,20 0,20"/>
<Baseline points="0,15 99,15"/>
</TextLine>
</TextRegion></Page></PcGts>"""
        layout = PageLayout()
        layout.from_pagexml_string(xml)
        line = layout.regions[0].lines[0]
        assert list(line.heights) == [10.0, 12.0]

    def test_missing_baseline_skips_line(self):
        xml = """<?xml version="1.0" encoding="utf-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
<Page imageFilename="x.jpg" imageWidth="100" imageHeight="100">
<TextRegion id="r1"><Coords points="0,0 99,0 99,99 0,99"/>
<TextLine id="l1"><Coords points="0,0 99,0 99,20 0,20"/></TextLine>
</TextRegion></Page></PcGts>"""
        layout = PageLayout()
        layout.from_pagexml_string(xml)
        assert len(layout.regions[0].lines) == 0

    def test_heights_guessed_from_polygon(self):
        xml = """<?xml version="1.0" encoding="utf-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
<Page imageFilename="x.jpg" imageWidth="200" imageHeight="100">
<TextRegion id="r1"><Coords points="0,0 199,0 199,99 0,99"/>
<TextLine id="l1">
<Coords points="10,40 190,40 190,80 10,80"/>
<Baseline points="10,70 190,70"/>
</TextLine>
</TextRegion></Page></PcGts>"""
        layout = PageLayout()
        layout.from_pagexml_string(xml)
        line = layout.regions[0].lines[0]
        assert line.heights is not None
        # Baseline at y=70, polygon spans y 40..80 -> asc ~30, desc ~10.
        assert line.heights[0] == pytest.approx(30, abs=3)
        assert line.heights[1] == pytest.approx(10, abs=3)


class TestLogits:
    def test_dense_logits_fill(self):
        dense = np.array([[0.0, 1.5], [2.5, 0.0]])
        sparse = scipy.sparse.csc_matrix(dense)
        line = TextLine(id="l", logits=sparse)
        out = line.get_dense_logits()
        np.testing.assert_allclose(out, [[-80.0, 1.5], [2.5, -80.0]])

    def test_full_logprobs_normalized(self):
        dense = np.array([[1.0, 2.0, 3.0]])
        line = TextLine(id="l", logits=scipy.sparse.csc_matrix(dense))
        lp = line.get_full_logprobs()
        np.testing.assert_allclose(np.exp(lp).sum(axis=1), 1.0, atol=1e-6)

    def test_save_load_round_trip(self, tmp_path):
        layout = make_page()
        line = layout.regions[0].lines[0]
        logits = np.zeros((7, 5))
        logits[0, 1] = 3.0
        logits[6, 4] = 1.0
        line.logits = scipy.sparse.csc_matrix(logits)
        line.characters = ["a", "b", "c", "d", "​"]
        line.logit_coords = [0, 7]

        path = tmp_path / "logits.pkl"
        layout.save_logits(str(path))

        restored = make_page()
        restored.load_logits(str(path))
        rl = restored.regions[0].lines[0]
        np.testing.assert_allclose(rl.logits.todense(), logits)
        assert rl.characters == line.characters
        assert list(rl.logit_coords) == [0, 7]

    def test_save_missing_logits_raises(self, tmp_path):
        layout = make_page()
        with pytest.raises(ValueError):
            layout.save_logits(str(tmp_path / "x.pkl"))
        # but passes when allowed
        layout.save_logits(str(tmp_path / "x.pkl"), missing_line_logits_ok=True)

    def test_reference_format_compat(self, tmp_path):
        """The pickle payload must be the reference's exact dict layout."""
        import pickle

        layout = make_page()
        line = layout.regions[0].lines[0]
        line.logits = scipy.sparse.csc_matrix(np.eye(3))
        line.characters = ["a", "b", "​"]
        line.logit_coords = [0, 3]
        payload = pickle.loads(layout.save_logits_bytes())
        assert set(payload.keys()) == {"r001-l001", "line_characters", "logit_coords"}
        assert scipy.sparse.issparse(payload["r001-l001"])


class TestRender:
    def test_render_to_image(self):
        layout = make_page()
        img = np.zeros((1000, 800, 3), dtype=np.uint8)
        out = layout.render_to_image(img, render_order=True)
        assert out.any()  # something was drawn


class TestLinesIterator:
    def test_iterates_all_lines(self):
        layout = make_page()
        assert len(list(layout.lines_iterator())) == 1


class TestALTO:
    def _layout_with_logits(self):
        layout = make_page()
        line = layout.regions[0].lines[0]
        # "Hello world": build peaked logits so alignment succeeds.
        chars = list("Helo wrd") + ["​"]
        text = line.transcription  # "Hello world"
        T = len(text) * 3 + 4
        dense = np.full((T, len(chars)), -1.0)
        for i, ch in enumerate(text):
            dense[2 + 3 * i, chars.index(ch)] = 15.0
        for t in range(T):
            if dense[t].max() < 10:
                dense[t, -1] = 12.0
        line.logits = scipy.sparse.csc_matrix(np.where(dense > 0, dense, 0))
        line.characters = chars
        line.logit_coords = [0, T]
        return layout

    def test_alto_export_word_boxes(self):
        layout = self._layout_with_logits()
        alto = layout.to_altoxml_string()
        assert alto.count("<String") == 2  # "Hello" + "world"
        assert 'WC=' in alto
        assert "<SP" in alto
        assert "PrintSpace" in alto

    def test_alto_round_trip(self):
        layout = self._layout_with_logits()
        alto = layout.to_altoxml_string()
        restored = PageLayout()
        restored.from_altoxml_string(alto)
        assert restored.page_size == (1000, 800)
        lines = list(restored.lines_iterator())
        assert len(lines) == 1
        assert lines[0].transcription == "Hello world"

    def test_min_line_confidence_filters(self):
        layout = self._layout_with_logits()
        alto = layout.to_altoxml_string(min_line_confidence=1.1)
        assert "<String" not in alto  # everything filtered


class TestQuality:
    def test_get_quality(self):
        layout = TestALTO()._layout_with_logits()
        q = layout.get_quality()
        assert 0.9 <= q <= 1.0  # peaked logits -> very confident

    def test_get_quality_windowed(self):
        layout = TestALTO()._layout_with_logits()
        q = layout.get_quality(x=0, y=0, width=800, height=1000)
        assert q == -1 or 0 <= q <= 1.0
