"""Tests for character/line confidence estimation."""

import numpy as np
import pytest
import scipy.sparse

from pero_ocr_tpu.core.confidence_estimation import (
    get_letter_confidence,
    get_line_confidence,
    normalize_logits,
    squeeze,
)
from pero_ocr_tpu.core.layout import TextLine


class TestHelpers:
    def test_squeeze(self):
        assert squeeze([1, 1, 2, 2, 2, 0, 1]) == [1, 2, 0, 1]

    def test_normalize(self):
        logits = np.array([[1.0, 2.0, 3.0]])
        normed = normalize_logits(logits)
        assert np.exp(normed).sum() == pytest.approx(1.0, abs=1e-6)


class TestLetterConfidence:
    def test_basic(self):
        # 3 symbols + blank (index 2); alignment: [0, 2, 1] = a, blank, b
        logits = np.array(
            [
                [5.0, 0.0, 0.0],
                [0.0, 0.0, 5.0],
                [0.0, 5.0, 0.0],
            ]
        )
        confs = get_letter_confidence(logits, [0, 2, 1], blank_ind=2)
        assert len(confs) == 2  # two non-blank letters
        assert all(c < 0 for c in confs)  # log-probs


class TestLineConfidence:
    def _make_line(self, dense_logits, characters):
        line = TextLine(
            id="l1",
            logits=scipy.sparse.csc_matrix(dense_logits),
            characters=characters,
            logit_coords=[0, dense_logits.shape[0]],
        )
        return line

    def test_confident_line(self):
        # Clean "ab" with strong peaks -> confidences near 1.
        big = 20.0
        dense = np.full((4, 3), -1.0)
        dense[0, 0] = big   # a
        dense[1, 2] = big   # blank
        dense[2, 1] = big   # b
        dense[3, 2] = big   # blank
        line = self._make_line(dense, ["a", "b", "​"])
        line.transcription = "ab"
        confs = get_line_confidence(line, np.array([0, 1]))
        assert confs.shape == (2,)
        assert np.all(confs > 0.9)

    def test_ambiguous_line_low_confidence(self):
        # Equal logits everywhere -> tiny margins.
        dense = np.zeros((4, 3))
        line = self._make_line(dense, ["a", "b", "​"])
        line.transcription = "ab"
        confs = get_line_confidence(line, np.array([0, 1]))
        assert np.all(confs < 0.5)

    def test_transformer_path(self):
        # Same number of frames as labels -> transformer confidence path.
        dense = np.array([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
        line = self._make_line(dense, ["a", "b", "​"])
        line.transcription = "ab"
        confs = get_line_confidence(line, np.array([0, 1]))
        probs = np.exp(line.get_full_logprobs())
        np.testing.assert_allclose(confs, [probs[0, 0], probs[1, 1]])
