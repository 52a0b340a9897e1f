"""pero_ocr_tpu — a TPU-native document OCR framework.

A ground-up reimplementation of the capabilities of pero-ocr
(reference: /root/reference) designed for TPU hardware:

- All neural compute (layout detection, line recognition, LM decoding,
  forced alignment) runs as jitted XLA graphs with bucketed static shapes.
- Line geometry normalization (dewarping) is a batched gather/resample
  performed on device (Pallas kernel / XLA gather), not per-line host loops.
- Scale-out happens through ``jax.sharding.Mesh`` + ``pjit`` over a pages /
  lines data axis, not process pools.
- The host keeps only image decode, XML serialization and small-N polygon
  bookkeeping (optionally accelerated by the native C++ runtime library).

Public API mirrors the reference framework: ``PageParser``, ``PageLayout``,
``RegionLayout``, ``TextLine`` and the ``parse-folder`` CLI semantics.
"""

__version__ = "0.1.0"

from pero_ocr_tpu.core.layout import PageLayout, RegionLayout, TextLine  # noqa: F401
