"""Import-path compatibility alias: the reference exposes its pipeline as
``pero_ocr.document_ocr`` — users switching can keep the same module
layout (``pero_ocr_tpu.document_ocr.page_parser.PageParser``)."""

from pero_ocr_tpu.document import page_parser, pdf  # noqa: F401
from pero_ocr_tpu.document.page_parser import PageParser  # noqa: F401
