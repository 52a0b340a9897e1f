"""Greedy CTC collapse with per-character mean max-probabilities
(reference: pero_ocr/char_confidences.py:4-26)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def greedy_filtration(line_probs: np.ndarray, chars) -> Tuple[str, List[float]]:
    """Collapse per-frame probabilities into (text, per-char mean max-prob).

    `line_probs` is (T, C) probabilities with blank as the last class."""
    blank = line_probs.shape[1] - 1
    best = np.argmax(line_probs, axis=1)
    best_prob = np.max(line_probs, axis=1)

    text = ""
    probs: List[List[float]] = []
    last_char = None
    for sym, prob in zip(best, best_prob):
        if sym != blank:
            if last_char != chars[sym]:
                text += chars[sym]
                probs.append([prob])
                last_char = chars[sym]
            elif probs:
                probs[-1].append(prob)
        else:
            last_char = None

    return text, [float(np.mean(p)) for p in probs]
