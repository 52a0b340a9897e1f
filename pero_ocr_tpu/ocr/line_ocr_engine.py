"""Base line-OCR engine: config, bucketed batching, logits bookkeeping.

Capability-equivalent to the reference's batch scheduler
(reference: pero_ocr/ocr_engine/line_ocr_engine.py:18-211) with a
TPU-first batching policy:

- The reference packs dynamic batches under ``480 * batch_size`` total
  pixels with per-batch max widths — every batch is a new shape, which
  would force an XLA recompile per batch.  Here line widths are rounded
  up into a fixed ladder of width buckets and batch sizes are padded to
  a power of two, so the number of compiled programs is bounded by
  ``len(width_buckets) * log2(max_batch)`` for the whole run.
- Long-line chunking with 25% overlap and CER-minimizing overlap merge
  (reference: line_ocr_engine.py:95-119, :180-211) is preserved for the
  transformer engine.

The JSON config schema matches the reference
(line_ocr_engine.py:18-55): ``characters``, ``line_px_height``,
``line_vertical_scale``, ``checkpoint``, ``embed_num``, ``embed_id``,
``max_line_width``; our engines add ``net_spec`` (architecture dict)
where the reference stores an opaque ``net_name``.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import sparse

from pero_ocr_tpu.ocr.softmax import softmax
from pero_ocr_tpu.sequence_alignment import levenshtein_distance

logger = logging.getLogger(__name__)

LINE_PADDING_PX = 32
DEFAULT_WIDTH_BUCKETS = (192, 384, 768, 1280, 1792, 2304, 3072, 4096)
SPARSE_PROB_THRESHOLD = 1e-4


class BaseEngineLineOCR:
    def __init__(
        self,
        json_def: str,
        batch_size: int = 32,
        model_type: str = "ctc",
        width_buckets: Sequence[int] = DEFAULT_WIDTH_BUCKETS,
    ):
        with open(json_def, "r", encoding="utf8") as f:
            self.config = json.load(f)

        self.line_px_height = self.config["line_px_height"]
        self.line_vertical_scale = self.config.get("line_vertical_scale", 1)

        checkpoint = self.config.get("checkpoint")
        if checkpoint and not os.path.isabs(checkpoint):
            checkpoint = os.path.realpath(
                os.path.join(os.path.dirname(json_def), checkpoint)
            )
        self.checkpoint = checkpoint

        self.characters = tuple(self.config["characters"])
        self.net_spec = self.config.get("net_spec", {})

        self.embed_num = (
            int(self.config["embed_num"]) if "embed_num" in self.config else None
        )
        embed_id = self.config.get("embed_id")
        if embed_id is not None and embed_id != "mean":
            embed_id = int(embed_id)
        self.embed_id = embed_id

        self.max_line_width = int(self.config.get("max_line_width", 1e9))

        self.model_type = model_type
        self.batch_size = batch_size
        self.line_padding_px = LINE_PADDING_PX
        self.width_buckets = tuple(sorted(width_buckets))
        self.max_input_horizontal_pixels = self.width_buckets[-1]

        # Subclasses set this (horizontal frame stride of the net).
        self.net_subsampling = 4

    # ------------------------------------------------------------------
    # Batching policy
    # ------------------------------------------------------------------
    def _bucket_for_width(self, width: int) -> int:
        padded = width + 2 * self.line_padding_px
        for b in self.width_buckets:
            if padded <= b:
                return b
        return self.width_buckets[-1]

    @staticmethod
    def _pad_batch_count(n: int, cap: int) -> int:
        p = 1
        while p < n:
            p *= 2
        return min(p, cap)

    def _chunk_line(self, image: np.ndarray) -> List[np.ndarray]:
        """Split an over-wide line into overlapping chunks
        (reference: line_ocr_engine.py:95-119)."""
        if image.shape[1] <= self.max_line_width:
            return [image]
        overlap = self.max_line_width // 4
        stride = self.max_line_width - overlap
        parts = []
        start = 0
        while start + self.max_line_width < image.shape[1]:
            parts.append(image[:, start : start + self.max_line_width])
            start += stride
        parts.append(image[:, start : start + self.max_line_width])
        return parts

    # ------------------------------------------------------------------
    def process_lines(
        self,
        lines: Sequence[np.ndarray],
        sparse_logits: bool = True,
        tight_crop_logits: bool = False,
        no_logits: bool = False,
    ) -> Tuple[List[str], List, List]:
        """Run OCR over cropped line images (H, W, 3) uint8.

        Returns (transcriptions, logits, logit_coords) in input order."""
        for line in lines:
            if line.shape[0] != self.line_px_height:
                raise ValueError(
                    f"Line height needs to be {self.line_px_height} for this "
                    f"ocr network and is {line.shape[0]} instead."
                )
            if line.shape[2] != 3:
                raise ValueError(
                    f"Line crops need three color channels, got {line.shape[2]}."
                )

        n = len(lines)
        all_transcriptions: List[Optional[str]] = [None] * n
        all_logits: List = [None] * n
        all_logit_coords: List = [None] * n

        # Chunk over-wide lines (transformer path); record spans.
        units: List[np.ndarray] = []
        unit_owner: List[int] = []
        spans: Dict[int, int] = {}
        for i, image in enumerate(lines):
            parts = (
                self._chunk_line(image)
                if self.model_type == "transformer"
                else [image]
            )
            spans[i] = len(parts)
            for p in parts:
                units.append(p)
                unit_owner.append(i)

        # Group unit indices into width buckets.
        groups: Dict[int, List[int]] = {}
        for u, img in enumerate(units):
            groups.setdefault(self._bucket_for_width(img.shape[1]), []).append(u)

        unit_transcriptions: List[Optional[str]] = [None] * len(units)
        unit_logits: List = [None] * len(units)

        for bucket_width, unit_ids in sorted(groups.items()):
            for start in range(0, len(unit_ids), self.batch_size):
                chunk = unit_ids[start : start + self.batch_size]
                padded_n = self._pad_batch_count(len(chunk), self.batch_size)

                batch = np.zeros(
                    (padded_n, self.line_px_height, bucket_width, 3), np.uint8
                )
                widths = np.zeros(padded_n, np.int32)
                for j, u in enumerate(chunk):
                    img = units[u]
                    w = min(img.shape[1], bucket_width - 2 * self.line_padding_px)
                    if w < img.shape[1]:
                        logger.warning(
                            "Line too long for OCR engine. Cropping from "
                            "%d px down to %d.", img.shape[1], w,
                        )
                    batch[j, :, self.line_padding_px : self.line_padding_px + w] = (
                        img[:, :w]
                    )
                    widths[j] = w

                out_transcriptions, out_logits = self.run_ocr(batch, widths)

                for j, u in enumerate(chunk):
                    unit_transcriptions[u] = out_transcriptions[j]
                    unit_logits[u] = out_logits[j]

        # Merge chunked lines; compute logit coords; sparsify.
        u = 0
        for i in range(n):
            span = spans[i]
            if span == 1:
                transcription = unit_transcriptions[u]
                line_logits = unit_logits[u]
            else:
                transcription, line_logits = merge_transcriptions_and_logits(
                    unit_transcriptions[u : u + span], unit_logits[u : u + span]
                )
            u += span

            all_transcriptions[i] = transcription
            if no_logits:
                continue

            if tight_crop_logits:
                line_logits = line_logits[
                    self.line_padding_px // self.net_subsampling : (
                        self.line_padding_px + lines[i].shape[1]
                    )
                    // self.net_subsampling
                ]
                all_logit_coords[i] = [None, None]
            elif self.model_type == "ctc":
                all_logit_coords[i] = [
                    self.line_padding_px // self.net_subsampling,
                    (self.line_padding_px + lines[i].shape[1])
                    // self.net_subsampling,
                ]
            else:  # transformer: one frame per output char
                all_logit_coords[i] = [0, len(transcription)]

            if sparse_logits:
                probs = softmax(line_logits, axis=1)
                line_logits = np.where(
                    probs < SPARSE_PROB_THRESHOLD, 0.0, line_logits
                )
                line_logits = sparse.csc_matrix(line_logits)
            all_logits[i] = line_logits

        return all_transcriptions, all_logits, all_logit_coords

    # Subclass contract: (batch uint8 (B, H, W, 3), widths (B,)) ->
    # (list of B transcriptions, list of B (T, C) logits arrays).
    def run_ocr(self, batch_data: np.ndarray, widths: np.ndarray):
        raise NotImplementedError


def merge_transcriptions_and_logits(transcription_parts, logits_parts):
    """Stitch overlapping chunk transcriptions by the CER-minimizing
    overlap (reference: line_ocr_engine.py:180-193)."""
    shrunk = [
        logits[: len(t)] for t, logits in zip(transcription_parts, logits_parts)
    ]
    result_transcription = transcription_parts[0]
    result_logits = shrunk[0]
    for transcription, logits in zip(transcription_parts[1:], shrunk[1:]):
        overlap = find_best_overlap(result_transcription, transcription)
        # Split the overlap: drop ceil(overlap/2) from the left chunk and
        # floor(overlap/2) from the right — identical to the reference's
        # `[:-overlap // 2]` for overlap > 0 (unary minus binds first, so
        # that slice stop is -ceil(overlap/2); line_ocr_engine.py:190-191).
        # DELIBERATE DIVERGENCE at overlap == 0: the reference's `[:-0//2]`
        # == `[:0]` wipes the whole accumulated transcription when chunks
        # share nothing; here the left chunk is kept.  Proven differentially
        # in tests/test_reference_oracle.py::TestChunkMergeOracle.
        keep = len(result_transcription) - (overlap - overlap // 2)
        result_transcription = (
            result_transcription[:keep] + transcription[overlap // 2 :]
        )
        result_logits = np.concatenate(
            [result_logits[:keep], logits[overlap // 2 :]], axis=0
        )
    return result_transcription, result_logits


def find_best_overlap(text1: str, text2: str) -> int:
    """Overlap length minimizing CER between text1's suffix and text2's
    prefix (reference: line_ocr_engine.py:196-211)."""
    max_overlap = min(len(text1), len(text2))
    best_cer = 1.0
    best_overlap = 0
    for i in range(1, max_overlap + 1):
        s1 = text1[-i:]
        s2 = text2[:i]
        cer = levenshtein_distance(list(s1), list(s2)) / len(s1)
        if cer < best_cer:
            best_cer = cer
            best_overlap = i
    return best_overlap
