"""Autoregressive transformer line-OCR engine.

Equivalent of the reference's transformer engine
(reference: pero_ocr/ocr_engine/transformer_ocr_engine.py:13-110), with
the greedy AR loop compiled as a single ``lax.scan``
(:func:`pero_ocr_tpu.models.transformer.greedy_decode`) instead of a
Python ``while`` loop with one device round trip per token.  The decode
length cap is width/4 as in the reference (:78-81).

Per-step logits over the charset are returned per OUTPUT CHARACTER (the
transformer produces one frame per char; logit_coords span = transcript
length, reference: line_ocr_engine.py:160-166 transformer branch).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.models.transformer import (
    TransformerOCR,
    TransformerSpec,
    beam_decode,
    greedy_decode,
)
from pero_ocr_tpu.ocr.line_ocr_engine import BaseEngineLineOCR
from pero_ocr_tpu.utils.checkpoint import load_or_init


class TransformerEngineLineOCR(BaseEngineLineOCR):
    """Runs either the native pre-LN TPU transformer (flax checkpoints)
    or, when the OCR JSON is a REFERENCE config (``net_name`` string +
    torch ``.pt`` state dict), the converted reference model through the
    post-LN flax mirror (:mod:`pero_ocr_tpu.models.transformer_ref`),
    matching the torch forward numerically."""

    def __init__(self, json_def: str, device=None, batch_size: int = 16):
        super().__init__(json_def, batch_size=batch_size, model_type="transformer")

        # Optional AR beam search (BEYOND the reference — its engine
        # only decodes greedily): top-level "beam_size" in the OCR JSON
        # switches the native model's decode to
        # models.transformer.beam_decode (joint-logprob maximization
        # with per-step KV-cache reordering).
        self.beam_size = int(self.config.get("beam_size", 1))
        self._ref_mode = "net_name" in self.config
        if self._ref_mode:
            if self.beam_size > 1:
                import logging

                logging.getLogger(__name__).warning(
                    "beam_size > 1 is supported for the native "
                    "transformer only; converted reference checkpoints "
                    "decode greedily (like the reference engine)."
                )
                self.beam_size = 1
            self._init_ref_model()
        else:
            self.spec = TransformerSpec.from_json_dict(
                self.config, num_classes=len(self.characters)
            )
            self.net_subsampling = self.spec.subsampling
            self.model = TransformerOCR(self.spec)

            def init_fn():
                rng = jax.random.PRNGKey(0)
                dummy = jnp.zeros(
                    (1, self.line_px_height, 128, 3), jnp.float32
                )
                targets = jnp.zeros((1, 4), jnp.int32)
                return self.model.init(rng, dummy, targets)

            self.variables = load_or_init(
                self.checkpoint, init_fn, name="transformer OCR"
            )

        self._decode = functools.lru_cache(maxsize=8)(self._make_decode_fn)

    def _init_ref_model(self):
        """Reference-style engine: charset + [U+200B, ''] specials with a
        shared sentence-boundary BOS/EOS (reference:
        transformer_ocr_engine.py:13-30); weights convert from the torch
        state dict at construction."""
        import json as _json

        from pero_ocr_tpu.models.transformer_ref import (
            RefTransformerOCR,
            RefTransformerSpec,
        )

        net_cfg = self.config["net_name"]
        if isinstance(net_cfg, str):
            net_cfg = _json.loads(net_cfg)
        self.characters = tuple(self.characters) + ("\u200b", "")
        self.spec = RefTransformerSpec.from_net_config(
            net_cfg, num_symbols=len(self.characters),
            in_height=self.line_px_height,
        )
        self.net_subsampling = self.spec.subsampling[1]
        self.model = RefTransformerOCR(self.spec)

        import torch

        state_dict = torch.load(self.checkpoint, map_location="cpu")
        from pero_ocr_tpu.utils.convert_torch import convert_torch_transformer

        self.variables = jax.tree_util.tree_map(
            jnp.asarray,
            convert_torch_transformer(
                state_dict, heads=self.spec.heads,
                encoder_layers=self.spec.encoder_layers,
                decoder_layers=self.spec.decoder_layers,
            ),
        )

    def _make_decode_fn(self, max_len: int):
        """One compiled decode program per (bucketed) max decode length."""
        if self._ref_mode:
            from pero_ocr_tpu.models.transformer_ref import greedy_decode_ref

            @jax.jit
            def run_ref(batch):
                images = batch.astype(jnp.float32) / 255.0
                # greedy_decode_ref returns per-step logits from the
                # cached scan directly; no teacher-forced second pass.
                return greedy_decode_ref(
                    self.model, self.variables, images, max_len
                )

            return run_ref

        @jax.jit
        def run(batch):
            images = batch.astype(jnp.float32) / 255.0
            if self.beam_size > 1:
                tokens, lengths, _ = beam_decode(
                    self.model, self.variables, images, max_len,
                    k=self.beam_size,
                )
            else:
                tokens, lengths, _ = greedy_decode(
                    self.model, self.variables, images, max_len
                )
            # Per-step logits for confidence: re-run teacher-forced with the
            # decoded tokens (one pass, fully batched).
            sp = self.spec
            bos = jnp.full((tokens.shape[0], 1), sp.bos_id, jnp.int32)
            prefixed = jnp.concatenate([bos, tokens[:, :-1]], axis=1)
            memory = self.model.apply(
                self.variables, images, method=TransformerOCR.encode
            )
            logits = self.model.apply(
                self.variables, memory, prefixed,
                method=TransformerOCR.decode_train,
            )
            return tokens, lengths, logits

        return run

    def run_ocr(
        self, batch_data: np.ndarray, widths: np.ndarray
    ) -> Tuple[List[str], List[np.ndarray]]:
        # Runaway cap: width / 4 tokens (reference:
        # transformer_ocr_engine.py:78-81), bounded by the spec maximum.
        spec_cap = (
            self.spec.max_seq_len - 1 if self._ref_mode
            else self.spec.max_decode_len
        )
        max_len = int(min(batch_data.shape[2] // 4, spec_cap))
        max_len = max(max_len, 8)
        tokens, lengths, logits = self._decode(max_len)(jnp.asarray(batch_data))
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        logits = np.asarray(logits)  # (B, max_len, vocab)

        transcriptions: List[str] = []
        out_logits: List[np.ndarray] = []
        n_emit = (
            len(self.characters) - 2 if self._ref_mode
            else len(self.characters)
        )
        for i in range(len(batch_data)):
            n = int(lengths[i])
            ids = tokens[i, :n]
            # Ref mode: drop the U+200B/ignore specials from the text
            # (reference: transformer_ocr_engine.py:94-105).
            text = "".join(
                self.characters[t] for t in ids if t < n_emit
            )
            transcriptions.append(text)
            # Keep only charset columns so downstream logits consumers see
            # (chars + implicit blank-free) scores; pad col for specials.
            out_logits.append(logits[i, :n, : len(self.characters) + 1])
        return transcriptions, out_logits
