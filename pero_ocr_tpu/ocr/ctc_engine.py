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

import flax.serialization
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

        from pero_ocr_tpu.utils.ts_adapters import (
            TSRecognizerModel, is_torchscript_file,
        )

        if self.checkpoint and is_torchscript_file(self.checkpoint):
            # The reference's distribution format: an opaque TorchScript
            # archive (pytorch_ocr_engine.py:52-57) converted straight
            # from its serialized graph to a jittable JAX function
            # (utils/ts_graph.py); the adapter probes subsampling and
            # class count and mimics the native RecognizerSpec.
            self.model = TSRecognizerModel.load(
                self.checkpoint, line_height=self.line_px_height,
                embed_num=self.config.get("embed_num", 0) or 0,
            )
            self.spec = self.model.spec
            if self.spec.num_classes != len(self.characters):
                raise ValueError(
                    f"TorchScript recognizer has {self.spec.num_classes} "
                    f"output classes but the OCR JSON charset (+blank) "
                    f"has {len(self.characters)}"
                )
            self.net_subsampling = self.spec.subsampling
            self.variables = self.model.variables
        else:
            self.spec = RecognizerSpec.from_json_dict(
                self.config, num_classes=len(self.characters)
            )
            self.net_subsampling = self.spec.subsampling
            self.model = CTCRecognizer(self.spec)

            def init_fn():
                rng = jax.random.PRNGKey(0)
                dummy = jnp.zeros(
                    (1, self.line_px_height, 128, 3), jnp.float32
                )
                if self.spec.embed_num:
                    return self.model.init(
                        rng, dummy, jnp.zeros((1,), jnp.int32)
                    )
                return self.model.init(
                    rng, dummy
                )

            self.variables = load_or_init(
                self.checkpoint, init_fn, name="CTC OCR"
            )

        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, batch: jnp.ndarray, embed_id: jnp.ndarray):
        images = batch.astype(jnp.float32) / 255.0
        if self.spec.embed_num:
            # embed_id is a traced argument so sweeping ids (select_embed_id)
            # reuses the compiled program.
            embed_ids = jnp.full((batch.shape[0],), embed_id, jnp.int32)
            logits = self.model.apply(self.variables, images, embed_ids)
        else:
            logits = self.model.apply(self.variables, images)
        valid_frames = jnp.full(
            (batch.shape[0],), logits.shape[1], jnp.int32
        )
        labels, lengths = ctc.greedy_ctc_labels(logits, valid_frames)
        return logits, labels, lengths

    def current_embed_id(self) -> int:
        """Resolve the active writer-embedding id (supports runtime
        reassignment of ``self.embed_id``, e.g. the embed-id sweep)."""
        if not self.spec.embed_num:
            return 0
        if self.embed_id == "mean" or self.embed_id is None:
            return self.spec.embed_num
        return int(self.embed_id)

    def embedding_table(self) -> np.ndarray:
        """The writer-embedding matrix (for k-means representative
        selection, reference: user_scripts/select_embed_id.py:114-129)."""

        def find_embed(tree):
            if isinstance(tree, dict):
                for key, value in tree.items():
                    if key == "embedding":
                        return np.asarray(value)
                    found = find_embed(value)
                    if found is not None:
                        return found
            return None

        table = find_embed(
            flax.serialization.to_state_dict(self.variables)
        )
        if table is None:
            # Converted TorchScript models keep torch naming: a 2-D
            # parameter on an attribute path containing "embed".
            for key, value in self.variables.items():
                arr = np.asarray(value)
                if "embed" in key.lower() and arr.ndim == 2:
                    table = arr
                    break
        if table is None:
            raise ValueError("Model has no embedding table")
        return table

    def run_ocr(
        self, batch_data: np.ndarray, widths: np.ndarray
    ) -> Tuple[List[str], List[np.ndarray]]:
        logits, labels, lengths = self._forward(
            jnp.asarray(batch_data),
            jnp.asarray(self.current_embed_id(), jnp.int32),
        )
        logits = np.asarray(logits)
        transcriptions = ctc.labels_to_strings(
            np.asarray(labels), np.asarray(lengths), list(self.characters)
        )
        return transcriptions, [logits[i] for i in range(len(batch_data))]
