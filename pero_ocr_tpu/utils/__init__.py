from pero_ocr_tpu.utils.paths import compose_path  # noqa: F401
