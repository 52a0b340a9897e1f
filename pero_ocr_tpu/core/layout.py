"""Document layout data model.

The central, host-side data structures of the framework: ``TextLine``,
``RegionLayout`` and ``PageLayout``.  These are plain containers; XML and
logits serialization live in :mod:`pero_ocr_tpu.core.pagexml`,
:mod:`pero_ocr_tpu.core.altoxml` and :mod:`pero_ocr_tpu.core.logits_io`
and are re-exported here as methods for API compatibility with the
reference framework (reference: pero_ocr/core/layout.py:41-847).

Design notes (TPU build): the data model is intentionally free of any
device/JAX dependency — the TPU pipeline produces batched arrays and the
orchestration layer scatters them into these records.  Logits are stored
sparsely (scipy CSC) in the exact on-disk format of the reference
(reference: pero_ocr/core/layout.py:666-735) so existing tooling can read
our outputs and vice versa.
"""

from __future__ import annotations

import logging
from enum import Enum
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np
import scipy.sparse

Num = Union[int, float]

logger = logging.getLogger(__name__)

# Dense value substituted for pruned (zero) entries when densifying sparse
# logits; matches the reference's fill constant
# (reference: pero_ocr/core/layout.py:65-68).
ZERO_LOGIT_VALUE = -80


def element_schema(elem):
    """Re-export (reference: pero_ocr/core/layout.py:877-882)."""
    from pero_ocr_tpu.core.pagexml import element_schema as _impl

    return _impl(elem)


def points_string_to_array(coords: str):
    """Re-export (reference: pero_ocr/core/layout.py:885-889)."""
    from pero_ocr_tpu.core.pagexml import points_string_to_array as _impl

    return _impl(coords)


def create_ocr_processing_element(*args, **kwargs):
    """Re-export (reference: pero_ocr/core/layout.py:915-936)."""
    from pero_ocr_tpu.core.altoxml import create_ocr_processing_element as _impl

    return _impl(*args, **kwargs)


def draw_lines(img, lines, color=(255, 0, 0), circles=(False, False, False),
               close=False, thickness=2):
    """Re-export shim (reference: pero_ocr/core/layout.py:850-874)."""
    from pero_ocr_tpu.core.render import draw_polyline

    for line in lines:
        draw_polyline(img, line, color, close=close, thickness=thickness,
                      endpoint_circles=circles[0] or circles[2])
    return img


class PAGEVersion(Enum):
    PAGE_2019_07_15 = 1
    PAGE_2013_07_15 = 2


def log_softmax_np(logits: np.ndarray) -> np.ndarray:
    """Numerically stable log-softmax over the last axis (host numpy)."""
    norm = np.logaddexp.reduce(logits, axis=-1, keepdims=True)
    return logits - norm


class TextLine:
    """A single text line: geometry, transcription and recognition outputs.

    Mirrors the reference record (reference: pero_ocr/core/layout.py:41-72):

    - ``baseline``: (N, 2) polyline of x,y page coordinates.
    - ``polygon``: (M, 2) closed outline of the line.
    - ``heights``: ``[ascender_px, descender_px]`` above/below the baseline.
    - ``logits``: sparse (T, C) CTC logit matrix (scipy CSC) or dense array.
    - ``characters``: the recognizer charset (last entry = CTC blank).
    - ``logit_coords``: ``[start, stop)`` frame span that corresponds to the
      unpadded line content.
    """

    __slots__ = (
        "id",
        "index",
        "baseline",
        "polygon",
        "heights",
        "transcription",
        "logits",
        "crop",
        "characters",
        "logit_coords",
        "transcription_confidence",
        "category",
    )

    def __init__(
        self,
        id: Optional[str] = None,
        baseline: Optional[np.ndarray] = None,
        polygon: Optional[np.ndarray] = None,
        heights: Optional[Sequence[Num]] = None,
        transcription: Optional[str] = None,
        logits: Optional[Union[scipy.sparse.csc_matrix, np.ndarray]] = None,
        crop: Optional[np.ndarray] = None,
        characters: Optional[List[str]] = None,
        logit_coords: Optional[Sequence[Optional[int]]] = None,
        transcription_confidence: Optional[Num] = None,
        index: Optional[int] = None,
        category: Optional[str] = None,
    ):
        self.id = id
        self.index = index
        self.baseline = baseline
        self.polygon = polygon
        self.heights = heights
        self.transcription = transcription
        self.logits = logits
        self.crop = crop
        self.characters = characters
        self.logit_coords = logit_coords
        self.transcription_confidence = transcription_confidence
        self.category = category

    def get_dense_logits(self, zero_logit_value: int = ZERO_LOGIT_VALUE) -> np.ndarray:
        """Densify sparse logits, filling pruned entries with a large negative
        value (reference: pero_ocr/core/layout.py:65-68)."""
        if scipy.sparse.issparse(self.logits):
            dense = np.asarray(self.logits.todense())
        else:
            dense = np.array(self.logits)
        dense[dense == 0] = zero_logit_value
        return dense

    def get_full_logprobs(self, zero_logit_value: int = ZERO_LOGIT_VALUE) -> np.ndarray:
        """Dense per-frame log-probabilities
        (reference: pero_ocr/core/layout.py:70-72)."""
        return log_softmax_np(self.get_dense_logits(zero_logit_value))

    def get_labels(self) -> np.ndarray:
        """Map the transcription onto charset label ids; characters outside
        the charset (and the blank) map to label 0
        (reference: pero_ocr/core/layout.py:474-487)."""
        char_to_idx = {c: i for i, c in enumerate(self.characters)}
        blank_idx = self.logits.shape[1] - 1
        labels = []
        for ch in self.transcription:
            idx = char_to_idx.get(ch, 0)
            labels.append(idx if idx < blank_idx else 0)
        return np.asarray(labels, dtype=np.int64)


class RegionLayout:
    """A page region (paragraph/block) with an outline polygon and its lines
    (reference: pero_ocr/core/layout.py:75-100)."""

    __slots__ = ("id", "polygon", "region_type", "lines", "transcription")

    def __init__(
        self,
        id: str,
        polygon: np.ndarray,
        region_type: Optional[str] = None,
    ):
        self.id = id
        self.polygon = polygon
        self.region_type = region_type
        self.lines: List[TextLine] = []
        self.transcription: Optional[str] = None

    def bbox(self) -> Tuple[float, float, float, float]:
        """(x_min, y_min, x_max, y_max) of the region polygon."""
        poly = np.asarray(self.polygon)
        return (
            float(poly[:, 0].min()),
            float(poly[:, 1].min()),
            float(poly[:, 0].max()),
            float(poly[:, 1].max()),
        )


class PageLayout:
    """Page container: regions, reading order and all (de)serialization
    (reference: pero_ocr/core/layout.py:234-847)."""

    def __init__(
        self,
        id: Optional[str] = None,
        page_size: Tuple[int, int] = (0, 0),
        file: Optional[str] = None,
    ):
        self.id = id
        self.page_size = page_size  # (height, width)
        self.regions: List[RegionLayout] = []
        self.reading_order = None

        if file is not None:
            self.from_pagexml(file)
        if self.reading_order is not None and len(self.regions) > 0:
            self.sort_regions_by_reading_order()

    # ------------------------------------------------------------------
    # Iteration & ordering
    # ------------------------------------------------------------------
    def lines_iterator(self) -> Iterator[TextLine]:
        for region in self.regions:
            yield from region.lines

    def sort_regions_by_reading_order(self) -> None:
        order = self.reading_order or {}
        self.regions.sort(key=lambda r: order.get(r.id, float("inf")))

    # ------------------------------------------------------------------
    # Page XML
    # ------------------------------------------------------------------
    def from_pagexml_string(self, pagexml_string: str) -> None:
        from pero_ocr_tpu.core import pagexml

        pagexml.read_pagexml_string(self, pagexml_string)

    def from_pagexml(self, file) -> None:
        from pero_ocr_tpu.core import pagexml

        pagexml.read_pagexml(self, file)

    def to_pagexml_string(
        self,
        creator: str = "pero_ocr_tpu",
        validate_id: bool = False,
        version: PAGEVersion = PAGEVersion.PAGE_2019_07_15,
    ) -> str:
        from pero_ocr_tpu.core import pagexml

        return pagexml.write_pagexml_string(
            self, creator=creator, validate_id=validate_id, version=version
        )

    def to_pagexml(
        self,
        file_name: str,
        creator: str = "pero_ocr_tpu",
        validate_id: bool = False,
        version: PAGEVersion = PAGEVersion.PAGE_2019_07_15,
    ) -> None:
        xml_string = self.to_pagexml_string(
            creator=creator, validate_id=validate_id, version=version
        )
        with open(file_name, "w", encoding="utf-8") as f:
            f.write(xml_string)

    # ------------------------------------------------------------------
    # ALTO XML
    # ------------------------------------------------------------------
    def to_altoxml_string(
        self,
        ocr_processing_element=None,
        page_uuid: Optional[str] = None,
        min_line_confidence: float = 0,
    ) -> str:
        from pero_ocr_tpu.core import altoxml

        return altoxml.write_altoxml_string(
            self,
            ocr_processing_element=ocr_processing_element,
            page_uuid=page_uuid,
            min_line_confidence=min_line_confidence,
        )

    def to_altoxml(
        self,
        file_name: str,
        ocr_processing_element=None,
        page_uuid: Optional[str] = None,
    ) -> None:
        alto_string = self.to_altoxml_string(
            ocr_processing_element=ocr_processing_element, page_uuid=page_uuid
        )
        with open(file_name, "w", encoding="utf-8") as f:
            f.write(alto_string)

    def from_altoxml_string(self, altoxml_string: str) -> None:
        from pero_ocr_tpu.core import altoxml

        altoxml.read_altoxml_string(self, altoxml_string)

    def from_altoxml(self, file) -> None:
        from pero_ocr_tpu.core import altoxml

        altoxml.read_altoxml(self, file)

    # ------------------------------------------------------------------
    # Logits pickle
    # ------------------------------------------------------------------
    def save_logits(self, file_name: str, missing_line_logits_ok: bool = False) -> None:
        from pero_ocr_tpu.core import logits_io

        logits_io.save_logits(self, file_name, missing_line_logits_ok)

    def save_logits_bytes(self, missing_line_logits_ok: bool = False) -> bytes:
        from pero_ocr_tpu.core import logits_io

        return logits_io.save_logits_bytes(self, missing_line_logits_ok)

    def load_logits(self, file) -> None:
        from pero_ocr_tpu.core import logits_io

        logits_io.load_logits(self, file)

    # ------------------------------------------------------------------
    # Rendering & quality
    # ------------------------------------------------------------------
    def render_to_image(
        self,
        image: np.ndarray,
        thickness: int = 2,
        circles: bool = True,
        render_order: bool = False,
    ) -> np.ndarray:
        from pero_ocr_tpu.core import render

        return render.render_layout(
            self, image, thickness=thickness, circles=circles, render_order=render_order
        )

    def get_quality(
        self,
        x: Optional[int] = None,
        y: Optional[int] = None,
        width: Optional[int] = None,
        height: Optional[int] = None,
        power: int = 6,
    ) -> float:
        from pero_ocr_tpu.core import quality

        return quality.page_quality(
            self, x=x, y=y, width=width, height=height, power=power
        )
