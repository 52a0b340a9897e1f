"""ALTO XML (de)serialization with word-level geometry.

Format-compatible with the reference exporter
(reference: pero_ocr/core/layout.py:400-651): ALTO v2 namespace, page
margins/PrintSpace computed from region bounding boxes, per-line
``String`` elements whose boxes come from CTC forced alignment projected
through the line warp field, ``WC`` word confidences, ``SP`` spaces, and
Arabic label-form handling.
"""

from __future__ import annotations

import logging
import re
from datetime import datetime, timezone
from io import BytesIO
from typing import Optional, Tuple, Union

import numpy as np
import lxml.etree as ET

from pero_ocr_tpu.core import line_geometry
from pero_ocr_tpu.core.arabic import ArabicHelper
from pero_ocr_tpu.core.confidence_estimation import get_line_confidence
from pero_ocr_tpu.core.force_alignment import align_text
from pero_ocr_tpu.core.layout import RegionLayout, TextLine
from pero_ocr_tpu.core.pagexml import element_schema

logger = logging.getLogger(__name__)

_ALTO_NS = "http://www.loc.gov/standards/alto/ns-v2#"
_NSMAP = {
    "xlink": "http://www.w3.org/1999/xlink",
    "xsi": "http://www.w3.org/2001/XMLSchema-instance",
}

# Vertical resolution (rows) of the warp field used to project aligned CTC
# frames back to page coordinates for word boxes; same as the reference's
# get_crop_inputs(..., 16) call (reference: pero_ocr/core/layout.py:505-506).
_WORD_GEOMETRY_FIELD_HEIGHT = 16


def polygon_hwvh(polygon) -> Tuple[float, float, float, float]:
    """(height, width, vpos, hpos) of a polygon's bounding box."""
    poly = np.asarray(polygon)
    h = poly[:, 1].max() - poly[:, 1].min()
    w = poly[:, 0].max() - poly[:, 0].min()
    return h, w, poly[:, 1].min(), poly[:, 0].min()


def create_ocr_processing_element(
    id: str = "IdOcr",
    software_creator_str: str = "pero_ocr_tpu project",
    software_name_str: str = "pero_ocr_tpu",
    software_version_str: str = "0.1.0",
    processing_datetime: Optional[str] = None,
):
    ocr_processing = ET.Element("OCRProcessing")
    ocr_processing.set("ID", id)
    step = ET.SubElement(ocr_processing, "ocrProcessingStep")
    dt = ET.SubElement(step, "processingDateTime")
    dt.text = processing_datetime or datetime.now(timezone.utc).isoformat()
    software = ET.SubElement(step, "processingSoftware")
    ET.SubElement(software, "softwareCreator").text = software_creator_str
    ET.SubElement(software, "softwareName").text = software_name_str
    ET.SubElement(software, "softwareVersion").text = software_version_str
    return ocr_processing


def _align_line_words(line: TextLine):
    """Viterbi-align the line transcription to its logits.

    Returns (aligned_letter_frames, logprobs, labels) or raises the same
    exception classes the reference handles for its fallback path."""
    labels = line.get_labels()
    logits = line.get_dense_logits()[line.logit_coords[0] : line.logit_coords[1]]
    logprobs = line.get_full_logprobs()[line.logit_coords[0] : line.logit_coords[1]]
    blank_idx = line.logits.shape[1] - 1
    aligned = align_text(-logprobs, labels, blank_idx)
    return aligned, logits, logprobs, labels


def _uniform_word_fallback(text_line_el, line: TextLine, line_box) -> None:
    """When alignment fails, emit equal-width word boxes with confidence 0
    (reference: pero_ocr/core/layout.py:492-503)."""
    height, width, vpos, hpos = line_box
    line.transcription_confidence = 0
    words = line.transcription.split()
    avg_width = (hpos + width) / max(len(words), 1)
    for w, word in enumerate(words):
        string = ET.SubElement(text_line_el, "String")
        string.set("CONTENT", word)
        string.set("HEIGHT", str(int(height)))
        string.set("WIDTH", str(int(avg_width)))
        string.set("VPOS", str(int(vpos)))
        string.set("HPOS", str(int(hpos + w * avg_width)))


def _word_spans(transcription: str, aligned: np.ndarray):
    """Split aligned letter frames into per-word [start_frame, end_frame]
    spans using the space positions of the transcription."""
    space_idxs = [pos for pos, char in enumerate(transcription) if char == " "]
    bounds = [-1] + space_idxs + [len(aligned)]
    words = []
    for i in range(len(bounds) - 1):
        if bounds[i] != bounds[i + 1] - 1:
            words.append([aligned[bounds[i] + 1], aligned[bounds[i + 1] - 1]])
    return words


def _word_box(field: np.ndarray, span, frames_to_cols: float, line: TextLine):
    """Project a word's frame span through the warp field to page-coordinate
    extents; widen the sampling window until non-empty
    (reference: pero_ocr/core/layout.py:523-538)."""
    extension = 2
    all_x = all_y = np.empty(0)
    while field.size > 0 and extension < 40:
        lo = max(0, int((span[0] - extension) * frames_to_cols))
        hi = int((span[1] + extension) * frames_to_cols)
        all_x = field[:, lo:hi, 0]
        all_y = field[:, lo:hi, 1]
        if all_x.size and all_y.size:
            break
        extension += 1
    if field.size == 0 or all_x.size == 0 or all_y.size == 0:
        baseline = np.asarray(line.baseline)
        all_x = baseline[:, 0]
        all_y = np.concatenate(
            [baseline[:, 1] - line.heights[0], baseline[:, 1] + line.heights[1]]
        )
    return all_x, all_y


def _write_line_words(text_line_el, line: TextLine, arabic_helper) -> None:
    aligned, logits, logprobs, labels = _align_line_words(line)

    field = line_geometry.warp_field(
        line.baseline, line.heights, _WORD_GEOMETRY_FIELD_HEIGHT, poly=2
    )
    words = _word_spans(line.transcription, aligned)
    split_transcription = line.transcription.split()
    frames_to_cols = field.shape[1] / logits.shape[0]

    confidences = get_line_confidence(line, labels, aligned, logprobs)
    line.transcription_confidence = float(np.quantile(confidences, 0.50))

    arabic_line = arabic_helper.is_arabic_line(line.transcription)

    letter_counter = 0
    for w, span in enumerate(words):
        all_x, all_y = _word_box(field, span, frames_to_cols, line)

        if line.transcription_confidence == 1:
            word_confidence = 1.0
        elif confidences.size:
            word_confidence = float(
                np.quantile(
                    confidences[
                        letter_counter : letter_counter + len(split_transcription[w])
                    ],
                    0.50,
                )
            )
        else:
            word_confidence = None

        string = ET.SubElement(text_line_el, "String")
        content = split_transcription[w]
        if arabic_line:
            content = arabic_helper.label_form_to_string(content)
        string.set("CONTENT", content)
        string.set("HEIGHT", str(int(np.max(all_y) - np.min(all_y))))
        string.set("WIDTH", str(int(np.max(all_x) - np.min(all_x))))
        string.set("VPOS", str(int(np.min(all_y))))
        string.set("HPOS", str(int(np.min(all_x))))
        if word_confidence is not None:
            string.set("WC", str(round(word_confidence, 2)))

        if w != len(split_transcription) - 1:
            space = ET.SubElement(text_line_el, "SP")
            space.set("WIDTH", str(4))
            space.set("VPOS", str(int(np.min(all_y))))
            space.set("HPOS", str(int(np.max(all_x))))
        letter_counter += len(split_transcription[w]) + 1


def write_altoxml_string(
    layout,
    ocr_processing_element=None,
    page_uuid: Optional[str] = None,
    min_line_confidence: float = 0,
) -> str:
    arabic_helper = ArabicHelper()
    root = ET.Element("alto", nsmap=_NSMAP)
    root.set("xmlns", _ALTO_NS)

    description = ET.SubElement(root, "Description")
    ET.SubElement(description, "MeasurementUnit").text = "pixel"
    source_info = ET.SubElement(description, "sourceImageInformation")
    ET.SubElement(source_info, "fileName").text = layout.id
    description.append(
        ocr_processing_element
        if ocr_processing_element is not None
        else create_ocr_processing_element()
    )

    alto_layout = ET.SubElement(root, "Layout")
    page = ET.SubElement(alto_layout, "Page")
    if page_uuid is not None:
        page.set("ID", "id_" + page_uuid)
    else:
        page.set(
            "ID",
            "id_" + re.sub('[!"#$%&\'()*+,/:;<=>?@[\\]^`{|}~ ]', "_", str(layout.id)),
        )
    page.set("PHYSICAL_IMG_NR", "1")
    page.set("HEIGHT", str(layout.page_size[0]))
    page.set("WIDTH", str(layout.page_size[1]))

    top_margin = ET.SubElement(page, "TopMargin")
    left_margin = ET.SubElement(page, "LeftMargin")
    right_margin = ET.SubElement(page, "RightMargin")
    bottom_margin = ET.SubElement(page, "BottomMargin")
    print_space = ET.SubElement(page, "PrintSpace")

    ps_height, ps_width = 0, 0
    ps_vpos, ps_hpos = layout.page_size[0], layout.page_size[1]

    for region in layout.regions:
        text_block = ET.SubElement(print_space, "TextBlock")
        text_block.set("ID", f"block_{region.id}")

        blk_h, blk_w, blk_v, blk_hp = polygon_hwvh(region.polygon)
        text_block.set("HEIGHT", str(int(blk_h)))
        text_block.set("WIDTH", str(int(blk_w)))
        text_block.set("VPOS", str(int(blk_v)))
        text_block.set("HPOS", str(int(blk_hp)))

        ps_height = max(ps_vpos + ps_height, blk_v + blk_h)
        ps_width = max(ps_hpos + ps_width, blk_hp + blk_w)
        ps_vpos = min(ps_vpos, blk_v)
        ps_hpos = min(ps_hpos, blk_hp)
        ps_height -= ps_vpos
        ps_width -= ps_hpos

        for line in region.lines:
            if not line.transcription or line.transcription.strip() == "":
                continue
            text_line = ET.SubElement(text_block, "TextLine")
            baseline_y = int(np.average(np.asarray(line.baseline)[:, 1]))
            text_line.set("BASELINE", str(baseline_y))

            line_box = polygon_hwvh(line.polygon)
            ln_h, ln_w, ln_v, ln_hp = line_box
            text_line.set("VPOS", str(int(ln_v)))
            text_line.set("HPOS", str(int(ln_hp)))
            text_line.set("HEIGHT", str(int(ln_h)))
            text_line.set("WIDTH", str(int(ln_w)))

            try:
                _write_line_words(text_line, line, arabic_helper)
            except (ValueError, IndexError, TypeError, AttributeError) as e:
                logger.warning(
                    "ALTO export: unable to align line %s (%s); "
                    "falling back to uniform word boxes.",
                    line.id,
                    e,
                )
                _uniform_word_fallback(text_line, line, line_box)

            if (
                line.transcription_confidence is not None
                and line.transcription_confidence < min_line_confidence
            ):
                text_block.remove(text_line)

    top_margin.set("HEIGHT", str(int(ps_vpos)))
    top_margin.set("WIDTH", str(int(layout.page_size[1])))
    top_margin.set("VPOS", "0")
    top_margin.set("HPOS", "0")

    left_margin.set("HEIGHT", str(int(layout.page_size[0])))
    left_margin.set("WIDTH", str(int(ps_hpos)))
    left_margin.set("VPOS", "0")
    left_margin.set("HPOS", "0")

    right_margin.set("HEIGHT", str(int(layout.page_size[0])))
    right_margin.set("WIDTH", str(int(layout.page_size[1] - (ps_hpos + ps_width))))
    right_margin.set("VPOS", "0")
    right_margin.set("HPOS", str(int(ps_hpos + ps_width)))

    bottom_margin.set("HEIGHT", str(int(layout.page_size[0] - (ps_vpos + ps_height))))
    bottom_margin.set("WIDTH", str(int(layout.page_size[1])))
    bottom_margin.set("VPOS", str(int(ps_vpos + ps_height)))
    bottom_margin.set("HPOS", "0")

    print_space.set("HEIGHT", str(int(ps_height)))
    print_space.set("WIDTH", str(int(ps_width)))
    print_space.set("VPOS", str(int(ps_vpos)))
    print_space.set("HPOS", str(int(ps_hpos)))

    return ET.tostring(
        root, pretty_print=True, encoding="utf-8", xml_declaration=True
    ).decode("utf-8")


def read_altoxml_string(layout, altoxml_string: str) -> None:
    read_altoxml(layout, BytesIO(altoxml_string.encode("utf-8")))


def read_altoxml(layout, file: Union[str, BytesIO]) -> None:
    """Populate a PageLayout from an ALTO file: rectangular region/line
    geometry, words joined into line transcriptions
    (reference: pero_ocr/core/layout.py:602-651)."""
    tree = ET.parse(file)
    root = tree.getroot()
    schema = element_schema(root)

    alto_layout = root.findall(schema + "Layout")[0]
    page = alto_layout.findall(schema + "Page")[0]

    layout.id = page.attrib["ID"][3:]
    layout.page_size = (int(page.attrib["HEIGHT"]), int(page.attrib["WIDTH"]))

    print_space = page.findall(schema + "PrintSpace")[0]
    for block in print_space.iter(schema + "TextBlock"):
        x0 = int(block.get("HPOS"))
        y0 = int(block.get("VPOS"))
        x1 = x0 + int(block.get("WIDTH"))
        y1 = y0 + int(block.get("HEIGHT"))
        region = RegionLayout(
            block.attrib["ID"], np.asarray([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]).tolist()
        )
        for line_el in block.iter(schema + "TextLine"):
            lx0 = int(line_el.attrib["HPOS"])
            ly0 = int(line_el.attrib["VPOS"])
            lw = int(line_el.attrib["WIDTH"])
            lh = int(line_el.attrib["HEIGHT"])
            baseline_y = int(line_el.attrib["BASELINE"])
            line = TextLine(
                baseline=np.asarray(
                    [[lx0, baseline_y], [lx0 + lw, baseline_y]]
                ),
                heights=np.asarray([lh + ly0 - baseline_y, baseline_y - ly0]),
                polygon=np.asarray(
                    [[lx0, ly0], [lx0 + lw, ly0], [lx0 + lw, ly0 + lh], [lx0, ly0 + lh]]
                ),
            )
            words = [s.get("CONTENT") for s in line_el.iter(schema + "String")]
            line.transcription = " ".join(words)
            region.lines.append(line)
        layout.regions.append(region)
