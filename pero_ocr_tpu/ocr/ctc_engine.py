"""CTC line-OCR engine (the main printed/handwritten recognizer path).

Equivalent of the reference's TorchScript CTC engine
(reference: pero_ocr/ocr_engine/pytorch_ocr_engine.py:36-74): appends the
U+200B blank to the charset, normalizes images to [0, 1], supports
writer embeddings (``embed_id``/"mean"), and greedy-decodes CTC — but the
argmax + collapse runs ON DEVICE inside the same jitted program as the
forward pass (:func:`pero_ocr_tpu.ops.ctc.greedy_ctc_labels`); the host
only joins the final label ids into strings.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.models.recognizer import CTCRecognizer, RecognizerSpec
from pero_ocr_tpu.ocr.line_ocr_engine import BaseEngineLineOCR
from pero_ocr_tpu.ops import ctc
from pero_ocr_tpu.utils.checkpoint import load_or_init

BLANK_CHAR = "​"


class CTCEngineLineOCR(BaseEngineLineOCR):
    def __init__(self, json_def: str, device=None, batch_size: int = 32):
        super().__init__(json_def, batch_size=batch_size, model_type="ctc")

        # U+200B is the blank's surface form (reference:
        # pytorch_ocr_engine.py:46 appends it to the charset).
        self.characters = tuple(self.characters) + (BLANK_CHAR,)

        self.spec = RecognizerSpec.from_json_dict(
            self.config, num_classes=len(self.characters)
        )
        self.net_subsampling = self.spec.subsampling
        self.model = CTCRecognizer(self.spec)

        def init_fn():
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, self.line_px_height, 128, 3), jnp.float32)
            if self.spec.embed_num:
                return self.model.init(rng, dummy, jnp.zeros((1,), jnp.int32))
            return self.model.init(rng, dummy)

        self.variables = load_or_init(self.checkpoint, init_fn, name="CTC OCR")

        if self.spec.embed_num:
            if self.embed_id == "mean" or self.embed_id is None:
                # The extra (last) embedding row stands in for the mean /
                # unknown writer (reference: pytorch_ocr_engine.py:64-66).
                self._embed_id_value = self.spec.embed_num
            else:
                self._embed_id_value = int(self.embed_id)
        else:
            self._embed_id_value = None

        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, batch: jnp.ndarray, widths: jnp.ndarray):
        images = batch.astype(jnp.float32) / 255.0
        if self._embed_id_value is not None:
            embed_ids = jnp.full((batch.shape[0],), self._embed_id_value, jnp.int32)
            logits = self.model.apply(self.variables, images, embed_ids)
        else:
            logits = self.model.apply(self.variables, images)
        valid_frames = jnp.full(
            (batch.shape[0],), logits.shape[1], jnp.int32
        )
        labels, lengths = ctc.greedy_ctc_labels(logits, valid_frames)
        return logits, labels, lengths

    def run_ocr(
        self, batch_data: np.ndarray, widths: np.ndarray
    ) -> Tuple[List[str], List[np.ndarray]]:
        logits, labels, lengths = self._forward(
            jnp.asarray(batch_data), jnp.asarray(widths)
        )
        logits = np.asarray(logits)
        transcriptions = ctc.labels_to_strings(
            np.asarray(labels), np.asarray(lengths), list(self.characters)
        )
        return transcriptions, [logits[i] for i in range(len(batch_data))]
