"""Numerically-stable numpy softmax
(API-compatible with reference: pero_ocr/ocr_engine/softmax.py:4-46)."""

from __future__ import annotations

import numpy as np


def softmax(x: np.ndarray, axis=None) -> np.ndarray:
    """Softmax along `axis`; when axis is None, picks the only non-singleton
    axis of 1-D/2-D inputs (the reference's autodetect behavior), else the
    last axis."""
    x = np.asarray(x, dtype=np.float64)
    if axis is None:
        non_singleton = [i for i, s in enumerate(x.shape) if s > 1]
        axis = non_singleton[-1] if non_singleton else -1
    shifted = x - x.max(axis=axis, keepdims=True)
    e = np.exp(shifted)
    return e / e.sum(axis=axis, keepdims=True)
