from pero_ocr_tpu.document.page_parser import PageParser  # noqa: F401
