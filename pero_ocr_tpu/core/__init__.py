from pero_ocr_tpu.core.layout import PageLayout, RegionLayout, TextLine  # noqa: F401
