"""Numerically-stable numpy softmax
(API-compatible with reference: pero_ocr/ocr_engine/softmax.py:4-46)."""

from __future__ import annotations

import numpy as np


def softmax(x: np.ndarray, axis=None) -> np.ndarray:
    """Softmax along `axis`; when axis is None, picks the FIRST
    non-singleton axis (the reference's autodetect rule,
    softmax.py:23-25)."""
    x = np.asarray(x, dtype=np.float64)
    if axis is None:
        non_singleton = [i for i, s in enumerate(x.shape) if s > 1]
        axis = non_singleton[0] if non_singleton else -1
    shifted = x - x.max(axis=axis, keepdims=True)
    e = np.exp(shifted)
    return e / e.sum(axis=axis, keepdims=True)
