"""PAGE XML (de)serialization.

Format-compatible with the reference implementation
(reference: pero_ocr/core/layout.py:250-415): PRImA PAGE 2019-07-15 (and
2013-07-15) schemas, line heights stored in the ``custom`` attribute as
``heights_v2:[asc,desc]`` with backwards-compatible parsing of the legacy
``heights`` encodings, per-line ``index`` attributes, region/line
``TextEquiv``/``Unicode`` transcripts, ``conf`` confidences, and
``ReadingOrder``/``OrderedGroup``/``RegionRefIndexed`` reading order.
"""

from __future__ import annotations

import json
import logging
import re
from datetime import datetime, timezone
from io import BytesIO
from typing import Dict, Optional, Union

import numpy as np
import lxml.etree as ET

from pero_ocr_tpu.core import line_geometry
from pero_ocr_tpu.core.layout import PAGEVersion, RegionLayout, TextLine

logger = logging.getLogger(__name__)

_NS_2019 = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
_NS_2013 = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
_XSI = "http://www.w3.org/2001/XMLSchema-instance"


def element_schema(elem) -> str:
    """Extract the ``{namespace}`` prefix of an element tag."""
    tag = elem.tag
    if tag.startswith("{"):
        return tag[: tag.index("}") + 1]
    return "{None}"


def points_to_string(points: np.ndarray) -> str:
    # One vectorized rint (round-half-even, same as np.round) then
    # plain-int formatting: per-scalar np.round was the hot spot of
    # whole-page XML serialization (8 -> 2 ms/page on a 40-line page).
    pts = np.rint(np.asarray(points, dtype=np.float64)).astype(np.int64)
    return " ".join(f"{x},{y}" for x, y in pts.tolist())


def points_string_to_array(text: str) -> np.ndarray:
    pairs = [t.split(",") for t in text.split(" ") if t]
    return np.asarray(
        [[int(round(float(x))), int(round(float(y)))] for x, y in pairs]
    )


def export_id(id_: str, validate_change_id: bool) -> str:
    return "id_" + id_ if validate_change_id else id_


def _read_coords(coords_element, schema) -> np.ndarray:
    if "points" in coords_element.attrib:
        return points_string_to_array(coords_element.attrib["points"])
    pts = [
        [float(pt.attrib["x"]), float(pt.attrib["y"])]
        for pt in coords_element.findall(schema + "Point")
    ]
    return np.asarray(pts)


def _parse_custom_heights(custom_str: str):
    """Parse heights out of a TextLine ``custom`` attribute.

    Understands the current ``heights_v2:[asc,desc]`` form and the legacy
    numeric forms the reference still accepts
    (reference: pero_ocr/core/layout.py:265-285)."""
    if "heights_v2" in custom_str:
        for word in custom_str.split():
            if "heights_v2" in word:
                return json.loads(word.split(":")[1])
        return None
    if re.findall("heights", custom_str):
        values = np.asarray([float(x) for x in re.findall(r"\d+", custom_str)])
        if values.shape[0] == 4:
            return [float(values[0]), float(values[2])]
        if values.shape[0] == 3:
            return [float(values[1]), float(values[2] - values[0])]
        return values.tolist()
    return None


def _read_reading_order(page_element, schema) -> Dict[str, int]:
    reading_order: Dict[str, int] = {}
    for ro in page_element.iter(schema + "ReadingOrder"):
        for group in ro.iter(schema + "OrderedGroup"):
            for ref in group.iter(schema + "RegionRefIndexed"):
                reading_order[ref.attrib["regionRef"]] = int(ref.attrib["index"])
    return reading_order


def read_pagexml_string(layout, pagexml_string: str) -> None:
    read_pagexml(layout, BytesIO(pagexml_string.encode("utf-8")))


def read_pagexml(layout, file: Union[str, BytesIO]) -> None:
    """Populate ``layout`` (a PageLayout) from a PAGE XML file/stream."""
    tree = ET.parse(file)
    root = tree.getroot()
    schema = element_schema(root)

    page = tree.findall(schema + "Page")[0]
    layout.id = page.attrib["imageFilename"]
    layout.page_size = (
        int(page.attrib["imageHeight"]),
        int(page.attrib["imageWidth"]),
    )
    layout.reading_order = _read_reading_order(page, schema)

    for region_element in tree.iter(schema + "TextRegion"):
        coords_element = region_element.find(schema + "Coords")
        polygon = _read_coords(coords_element, schema)
        region_type = region_element.attrib.get("type")
        region = RegionLayout(region_element.attrib["id"], polygon, region_type)

        transcription_el = region_element.find(schema + "TextEquiv")
        if transcription_el is not None:
            region.transcription = (
                transcription_el.find(schema + "Unicode").text or ""
            )

        for line_index, line_element in enumerate(
            region_element.iter(schema + "TextLine")
        ):
            line = TextLine(id=line_element.attrib["id"])

            custom = line_element.attrib.get("custom")
            if custom:
                line.heights = _parse_custom_heights(custom)

            index_attr = line_element.attrib.get("index")
            if index_attr is not None:
                try:
                    line.index = int(index_attr)
                except ValueError:
                    pass
            if line.index is None:
                line.index = line_index

            baseline_el = line_element.find(schema + "Baseline")
            if baseline_el is None:
                logger.warning(
                    "Baseline missing in TextLine; skipping line %s of page %s",
                    line.id,
                    layout.id,
                )
                continue
            line.baseline = _read_coords(baseline_el, schema)

            coords_el = line_element.find(schema + "Coords")
            if coords_el is not None:
                line.polygon = _read_coords(coords_el, schema)

            if not line.heights and line.polygon is not None:
                line.heights = line_geometry.guess_heights_from_polygon(
                    line.baseline, line.polygon
                )

            transcription_el = line_element.find(schema + "TextEquiv")
            if transcription_el is not None:
                line.transcription = (
                    transcription_el.find(schema + "Unicode").text or ""
                )
                conf = transcription_el.get("conf")
                line.transcription_confidence = (
                    float(conf) if conf is not None else None
                )
            region.lines.append(line)

        layout.regions.append(region)


def _make_root(creator: str, version: PAGEVersion):
    if version == PAGEVersion.PAGE_2019_07_15:
        qname = ET.QName(_XSI, "schemaLocation")
        root = ET.Element(
            "PcGts",
            {qname: _NS_2019 + "/pagecontent.xsd"},
            nsmap={None: _NS_2019, "xsi": _XSI},
        )
        metadata = ET.SubElement(root, "Metadata")
        ET.SubElement(metadata, "Creator").text = creator
        now = datetime.now(timezone.utc).isoformat()
        ET.SubElement(metadata, "Created").text = now
        ET.SubElement(metadata, "LastChange").text = now
        return root
    if version == PAGEVersion.PAGE_2013_07_15:
        root = ET.Element("PcGts")
        root.set("xmlns", _NS_2013)
        return root
    raise ValueError(f"Unknown PAGE Version: '{version}'")


def _write_region(page_element, region: RegionLayout, validate_id: bool):
    region_element = ET.SubElement(page_element, "TextRegion")
    region_element.set("id", export_id(region.id, validate_id))
    if region.region_type is not None:
        region_element.set("type", region.region_type)
    coords = ET.SubElement(region_element, "Coords")
    coords.set("points", points_to_string(region.polygon))
    if region.transcription is not None:
        text_el = ET.SubElement(region_element, "TextEquiv")
        ET.SubElement(text_el, "Unicode").text = region.transcription
    return region_element


def _write_line(region_element, line: TextLine, fallback_index: int, validate_id: bool):
    line_element = ET.SubElement(region_element, "TextLine")
    line_element.set("id", export_id(line.id, validate_id))
    index = line.index if line.index is not None else fallback_index
    line_element.set("index", f"{index:d}")
    if line.heights is not None:
        line_element.set(
            "custom",
            f"heights_v2:[{line.heights[0]:.1f},{line.heights[1]:.1f}]",
        )
    coords = ET.SubElement(line_element, "Coords")
    if line.polygon is not None:
        coords.set("points", points_to_string(line.polygon))
    if line.baseline is not None:
        baseline_el = ET.SubElement(line_element, "Baseline")
        baseline_el.set("points", points_to_string(line.baseline))
    if line.transcription is not None:
        text_el = ET.SubElement(line_element, "TextEquiv")
        if line.transcription_confidence is not None:
            text_el.set("conf", f"{line.transcription_confidence:.3f}")
        ET.SubElement(text_el, "Unicode").text = line.transcription


def _write_reading_order(layout, page_element) -> None:
    reading_order_element = ET.SubElement(page_element, "ReadingOrder")
    group = ET.SubElement(reading_order_element, "OrderedGroup")
    group.set("id", "reading_order")
    for region_id, region_index in layout.reading_order.items():
        ref = ET.SubElement(group, "RegionRefIndexed")
        ref.set("regionRef", region_id)
        ref.set("index", str(region_index))


def write_pagexml_string(
    layout,
    creator: str = "pero_ocr_tpu",
    validate_id: bool = False,
    version: PAGEVersion = PAGEVersion.PAGE_2019_07_15,
) -> str:
    root = _make_root(creator, version)

    page = ET.SubElement(root, "Page")
    page.set("imageFilename", layout.id)
    page.set("imageWidth", str(layout.page_size[1]))
    page.set("imageHeight", str(layout.page_size[0]))

    if layout.reading_order is not None:
        layout.sort_regions_by_reading_order()
        _write_reading_order(layout, page)

    for region in layout.regions:
        region_element = _write_region(page, region, validate_id)
        for i, line in enumerate(region.lines):
            _write_line(region_element, line, i, validate_id)

    return ET.tostring(
        root, pretty_print=True, encoding="utf-8", xml_declaration=True
    ).decode("utf-8")
