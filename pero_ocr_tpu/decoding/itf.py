"""Decoder/LM construction from the pipeline config, plus batch decode
helpers (reference: pero_ocr/decoding/decoding_itf.py:20-137).

The LM here is the framework's JAX char-LSTM
(:mod:`pero_ocr_tpu.models.charlm`); configs point ``LM`` at a msgpack
checkpoint saved with :func:`pero_ocr_tpu.utils.checkpoint.save_variables`
with a sidecar JSON spec (``<LM path> + '.json'``) carrying
``vocab_size``/``embed_dim``/``hidden_dim``/``num_layers``.
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from typing import List, Optional

import numpy as np

from pero_ocr_tpu.decoding.decoders import (
    BLANK_SYMBOL,
    CTCPrefixLogRawNumpyDecoder,
    GreedyDecoder,
)
from pero_ocr_tpu.decoding.lm_wrapper import JAXLMWrapper
from pero_ocr_tpu.utils.paths import compose_path

ZERO_LOGITS = -80.0

logger = logging.getLogger(__name__)


def get_ocr_charset(fn: str) -> List[str]:
    with open(fn, encoding="utf8") as f:
        return json.load(f)["characters"]


def _is_torch_lm_file(path: str) -> bool:
    """Torch artifacts are zip archives (torch>=1.6 pickles, TorchScript)
    or legacy pickle streams (0x80 protocol byte); flax msgpack
    checkpoints are neither."""
    import zipfile

    if zipfile.is_zipfile(path):
        return True
    with open(path, "rb") as f:
        return f.read(1) == b"\x80"


def construct_lm(path: str, decoder_symbols, config_path: str = ""):
    """Load a `[DECODER] LM` checkpoint + sidecar spec into a JAXLMWrapper.

    Accepts either a native CharLM msgpack checkpoint or a torch LM file
    (state dict / pickled module / TorchScript), matching the reference's
    contract where the LM config key names a torch file loaded directly
    (reference: pero_ocr/decoding/decoding_itf.py:27-46).  Torch files
    are auto-converted at load through the same gate mapping as
    scripts/convert_torch_lm.py."""
    import jax
    import jax.numpy as jnp

    from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec
    from pero_ocr_tpu.utils.checkpoint import load_variables

    full_path = compose_path(path, config_path)
    spec_path = full_path + ".json"
    if os.path.exists(spec_path):
        with open(spec_path, encoding="utf8") as f:
            spec_dict = json.load(f)
    else:
        spec_dict = None

    if os.path.exists(full_path) and _is_torch_lm_file(full_path):
        from pero_ocr_tpu.utils.convert_torch import load_torch_lm_file

        logger.info("Converting torch LM %s at load.", full_path)
        variables, derived_spec = load_torch_lm_file(full_path)
        if spec_dict:
            derived_spec.update(
                {k: v for k, v in spec_dict.items() if k == "vocab"}
            )
        spec_dict = derived_spec
        spec = CharLMSpec(
            vocab_size=spec_dict["vocab_size"],
            embed_dim=spec_dict["embed_dim"],
            hidden_dim=spec_dict["hidden_dim"],
            num_layers=spec_dict["num_layers"],
            cell_type=spec_dict["cell_type"],
        )
        model = CharLM(spec)
        return JAXLMWrapper(
            model, variables, decoder_symbols,
            vocab_map=spec_dict.get("vocab"),
        )

    if spec_dict is None:
        logger.warning(
            "LM spec sidecar %s not found; using defaults sized to the "
            "decoder charset.", spec_path,
        )
        spec_dict = {}

    spec = CharLMSpec(
        vocab_size=spec_dict.get("vocab_size", len(decoder_symbols) + 1),
        embed_dim=spec_dict.get("embed_dim", 64),
        hidden_dim=spec_dict.get("hidden_dim", 512),
        num_layers=spec_dict.get("num_layers", 2),
        cell_type=spec_dict.get("cell_type", "lstm"),
    )
    model = CharLM(spec)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32)
    )
    if os.path.exists(full_path):
        variables = load_variables(full_path, template)
    else:
        from pero_ocr_tpu.utils.checkpoint import strict_loading_enabled

        if strict_loading_enabled():
            raise FileNotFoundError(
                f"LM checkpoint {full_path} not found. Fix the [DECODER] "
                "LM path, or pass --allow-random-weights."
            )
        logger.warning(
            "LM checkpoint %s not found; using RANDOM weights.", full_path
        )
        variables = template

    vocab_map = spec_dict.get("vocab")  # optional {char: lm_id}
    return JAXLMWrapper(model, variables, decoder_symbols, vocab_map=vocab_map)


def lm_factory(config, decoder_symbols, config_path: str = ""):
    if "LM" not in config:
        return None
    return construct_lm(config["LM"], decoder_symbols, config_path=config_path)


def decoder_factory(
    config, characters, device=None, allow_no_decoder: bool = True,
    config_path: str = "",
):
    full_characters = list(characters) + [BLANK_SYMBOL]
    decoder_type = config["TYPE"]

    if decoder_type == "FAST-LOG-RAW":
        k = config.getint("BEAM_SIZE")
        lm_scale = config.getfloat("LM_SCALE")
        if lm_scale is None:
            raise ValueError("Missing LM_SCALE key in the config")
        insertion_bonus = config.getfloat("INSERTION_BONUS", fallback=0.0)
        lm = lm_factory(config, full_characters[:-1], config_path=config_path)
        logger.info(
            "Constructing CTCPrefixLogRawNumpyDecoder(k=%d, "
            "insertion_bonus=%s, lm=%s)", k, insertion_bonus, lm,
        )
        return CTCPrefixLogRawNumpyDecoder(
            full_characters, k, lm, lm_scale, insertion_bonus=insertion_bonus
        )
    if decoder_type == "TPU-BEAM":
        # Vectorized on-TPU beam search: whole pages decode in one scan
        # (this framework's replacement for the per-line host decoder).
        from pero_ocr_tpu.decoding.tpu_decoder import TPUBeamSearchDecoder

        k = config.getint("BEAM_SIZE", fallback=8)
        lm_scale = config.getfloat("LM_SCALE", fallback=1.0)
        insertion_bonus = config.getfloat("INSERTION_BONUS", fallback=0.0)
        max_len = config.getint("MAX_LEN", fallback=256)
        # Stored-logits decodes through a slow host link are
        # upload-bound; TRANSPORT_DTYPE = float16 halves those bytes
        # (maths stay f32 on device).
        transport_dtype = np.dtype(
            config.get("TRANSPORT_DTYPE", fallback="float32")
        ).type
        wrapper = lm_factory(config, full_characters[:-1], config_path=config_path)
        lm = None
        vocab_map = None
        if wrapper is not None:
            lm = (wrapper._model, wrapper._variables)
            # Converted brnolm LMs may order their vocabulary differently;
            # the decoder applies the permutation in-graph
            # (reference contract: pero_ocr/decoding/lm_wrapper.py:66-68).
            vocab_map = wrapper._map
        return TPUBeamSearchDecoder(
            full_characters, k=k, lm=lm, lm_scale=lm_scale,
            insertion_bonus=insertion_bonus, max_len=max_len,
            vocab_map=vocab_map, transport_dtype=transport_dtype,
        )
    if decoder_type == "GREEDY":
        return GreedyDecoder(full_characters)
    raise ValueError(f"Unknown decoder type: '{decoder_type}'")


def prepare_dense_logits(logits) -> np.ndarray:
    """Sparse CSC logits -> dense normalized log-probs
    (reference: decoding_itf.py:75-80)."""
    dense = np.asarray(logits.todense(), dtype=np.float64)
    dense[dense == 0] = ZERO_LOGITS
    norm = np.logaddexp.reduce(dense, axis=-1, keepdims=True)
    return dense - norm


def decode_paragraph(logits, decoder, time_logger) -> dict:
    out = {}
    for label, sparse in logits.items():
        dense = prepare_dense_logits(sparse)
        time_logger.log_line_start()
        out[label] = decoder(dense).best_hyp()
        time_logger.log_line_end(len(dense))
    return out


def decode_page(page_logits, decoder, time_logging: bool = False):
    time_logger = TimeLogger(loud=time_logging)
    out = [
        decode_paragraph(paragraph, decoder, time_logger)
        for paragraph in page_logits
    ]
    time_logger.print_final_stats()
    return out


class TimeLogger:
    """Per-line decode timing (reference: decoding_itf.py:107-137)."""

    def __init__(self, loud: bool = True):
        self._loud = loud
        self._total_nb_frames = 0
        self._nb_lines = 0
        self._total_decoding_time = 0.0
        self._creation_time = time.time()
        self._line_start = None

    def log_line_start(self):
        self._line_start = time.time()

    def log_line_end(self, nb_frames: int):
        duration = time.time() - self._line_start
        self._total_decoding_time += duration
        self._total_nb_frames += nb_frames
        self._nb_lines += 1
        if self._loud:
            logger.info(
                "decoding took %.3f. Line length %3d frames -> %5.2f ms/frame",
                duration, nb_frames, 1000.0 * duration / max(nb_frames, 1),
            )

    def print_final_stats(self):
        duration = time.time() - self._creation_time
        if self._loud and self._nb_lines:
            logger.info(
                "%.3fs (%.3fs decoding) = %.3fs/line = %.2fms/frame",
                duration, self._total_decoding_time,
                duration / self._nb_lines,
                1000.0 * duration / max(self._total_nb_frames, 1),
            )
