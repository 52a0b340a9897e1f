"""Character/line confidence estimation from aligned CTC logits
(reference: pero_ocr/core/confidence_estimation.py:8-110).

The margin-style line confidence subtracts, per character, the best
competing symbol probability in a window around the aligned frame from
the probability of the aligned label.  Vectorized over the line.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from pero_ocr_tpu.core.force_alignment import align_text


def normalize_logits(logits: np.ndarray) -> np.ndarray:
    norm = np.logaddexp.reduce(logits, axis=1)[:, np.newaxis]
    return logits - norm


def squeeze(sequence: Sequence[int]) -> List[int]:
    """Collapse consecutive repeats."""
    out: List[int] = []
    last = None
    for c in sequence:
        if c != last:
            out.append(c)
            last = c
    return out


def get_letter_confidence(
    logits: np.ndarray, alignment: Sequence[int], blank_ind: int
) -> List[float]:
    """Max per-letter aligned log-prob for each non-blank run in the
    alignment (reference: pero_ocr/core/confidence_estimation.py:8-29)."""
    log_probs = normalize_logits(logits)
    per_frame = log_probs[np.arange(log_probs.shape[0]), alignment]

    confidences = []
    run_symbol = None
    run_best = None
    for value, symbol in zip(per_frame, alignment):
        if symbol != run_symbol:
            if run_symbol is not None and run_symbol != blank_ind:
                confidences.append(run_best)
            run_symbol = symbol
            run_best = value
        else:
            run_best = max(run_best, value)
    if run_symbol is not None and run_symbol != blank_ind:
        confidences.append(run_best)
    return confidences


def get_line_confidence(
    line,
    labels: np.ndarray,
    aligned_letters: Optional[np.ndarray] = None,
    log_probs: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-character margin confidence
    (reference: pero_ocr/core/confidence_estimation.py:73-104)."""
    # One output frame per label means an autoregressive (transformer) model
    # produced the logits; confidence is simply the label probability.
    if line.logits.shape[0] == len(labels):
        return get_line_confidence_transformer(line, labels)

    if log_probs is None:
        log_probs = line.get_full_logprobs()
    if aligned_letters is None:
        aligned_letters = align_text(-log_probs, labels, log_probs.shape[1] - 1)

    alignment = np.concatenate([aligned_letters, [1000]])
    probs = np.exp(log_probs)

    confidences = np.zeros(len(labels))
    last_border = 0
    for i, label in enumerate(labels):
        label_prob = probs[alignment[i], label]
        next_border = (alignment[i] + 1 + alignment[i + 1]) // 2
        window = np.copy(probs[last_border:next_border])
        window[:, label] = 0
        if i > 0:
            window[:, labels[i - 1]] = 0
        if i + 1 < len(labels):
            window[:, labels[i + 1]] = 0
        other_prob = window[:, :-1].max() if window.size else 0.0
        confidences[i] = max(0.0, label_prob - other_prob)
        last_border = next_border
    return confidences


def get_line_confidence_transformer(line, labels: np.ndarray) -> np.ndarray:
    probs = np.exp(line.get_full_logprobs())
    return probs[np.arange(len(labels)), labels]
