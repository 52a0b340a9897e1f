"""Device-resident page pipeline with cross-page overlap.

The serving architecture for page throughput (SURVEY.md §7 step 9):

- **Stage A** (one jitted dispatch): uint8 page canvas -> ParseNet maps
  -> fused post-processing.  Only the small artifacts the host needs
  come back: baseline/connection masks (uint8) and a half-precision
  heights map — NOT the full float maps.
- **Host**: connected components -> baselines -> warp fields (vectorized
  numpy; tiny next to device work).
- **Stage B** (one jitted dispatch): uint8 page + padded warp fields ->
  batched bilinear crop -> CTC recognizer -> greedy labels.  Only the
  packed label ids come back.

Pages are processed with software pipelining: stage A of page N+1 is
dispatched (JAX dispatch is async) before the host geometry of page N,
so the device never waits for the host and transfers overlap compute.

On a multi-chip mesh the page batch axis shards over ``dp``; on one chip
this degenerates to the double-buffered single-stream below.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.core import line_geometry
from pero_ocr_tpu.layout_engines.cnn_engine import _postprocess_maps
from pero_ocr_tpu.ops import ctc as ctc_ops
from pero_ocr_tpu.ops import warp as warp_ops


@dataclasses.dataclass
class PageResult:
    page_index: int
    baselines: List[np.ndarray]
    heights: List[List[float]]
    labels: Optional[np.ndarray]      # (N, T) packed label ids, -1 padded
    label_lengths: Optional[np.ndarray]
    crops_width: Optional[np.ndarray]


class TPUPagePipeline:
    """Two-dispatch-per-page pipeline over a single device stream."""

    def __init__(
        self,
        parsenet_model,
        parsenet_variables,
        recognizer_model,
        recognizer_variables,
        downsample: int = 4,
        detection_threshold: float = 0.2,
        line_end_weight: float = 1.0,
        crop_height: int = 32,
        crop_bucket: int = 1024,
        max_lines: int = 64,
    ):
        self.downsample = downsample
        self.detection_threshold = detection_threshold
        self.line_end_weight = line_end_weight
        self.crop_height = crop_height
        self.crop_bucket = crop_bucket
        self.max_lines = max_lines

        pn_apply = parsenet_model.apply
        rec_apply = recognizer_model.apply

        @jax.jit
        def stage_a(canvas_u8):
            """canvas_u8: (H', W', 3) uint8 downsampled page."""
            images = canvas_u8[None].astype(jnp.float32) / 255.0
            maps = pn_apply(parsenet_variables, images)[0]
            baselines_mask, connected, heights_map, separator = _postprocess_maps(
                maps, detection_threshold, line_end_weight
            )
            return (
                baselines_mask.astype(jnp.uint8),
                connected.astype(jnp.uint8),
                heights_map.astype(jnp.float16),
                separator.astype(jnp.float16),
            )

        crop_h = crop_height
        bucket = crop_bucket

        @jax.jit
        def stage_b(page_u8, baselines, heights):
            """page_u8: (H, W, 3) uint8; baselines: (N, P, 2) f32;
            heights: (N, 2) f32.  Fields are built IN-GRAPH so only the
            tiny geometry tensors cross the host link."""
            fields = warp_ops.build_fields_device(
                baselines, heights, crop_h, bucket
            )
            crops = warp_ops.warp_lines_xla(
                page_u8.astype(jnp.float32), fields
            )
            logits = rec_apply(recognizer_variables, crops / 255.0)
            valid = jnp.full((crops.shape[0],), logits.shape[1], jnp.int32)
            labels, lengths = ctc_ops.greedy_ctc_labels(logits, valid)
            return labels, lengths

        self._stage_a = stage_a
        self._stage_b = stage_b

    # ------------------------------------------------------------------
    def _canvas(self, page: np.ndarray) -> np.ndarray:
        import cv2

        ds = self.downsample
        small = cv2.resize(
            page, (0, 0), fx=1 / ds, fy=1 / ds, interpolation=cv2.INTER_AREA
        )
        h = int(np.ceil(small.shape[0] / 64) * 64)
        w = int(np.ceil(small.shape[1] / 64) * 64)
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas[: small.shape[0], : small.shape[1]] = small
        return canvas

    def _lines_from_masks(
        self, baselines_mask, connected, heights_map
    ) -> Tuple[List[np.ndarray], List[List[float]]]:
        """Host part of the layout parse (same logic as
        LayoutEngine.parse, cnn_engine.py)."""
        from pero_ocr_tpu.ops.morphology import connected_components

        ds = self.downsample
        labels_img, num = connected_components(connected)
        labels_img = labels_img * baselines_mask

        b_list, h_list = [], []
        ys, xs = np.nonzero(labels_img > 0)
        comp = labels_img[ys, xs]
        order = np.argsort(comp, kind="stable")
        ys, xs, comp = ys[order], xs[order], comp[order]
        bounds = np.searchsorted(comp, np.arange(1, num + 2))
        for c in range(num):
            lo, hi = bounds[c], bounds[c + 1]
            if hi - lo <= 5:
                continue
            cx, cy = xs[lo:hi], ys[lo:hi]
            ux, first = np.unique(cx, return_index=True)
            pos = np.stack([ux, cy[first]], 1).astype(float)
            target = max(min(10, pos.shape[0] // 10), 2)
            sel = np.linspace(0, pos.shape[0] - 1, target).astype(int)
            pos = pos[sel]
            pos[0, 0] -= 2
            pos[-1, 0] += 2
            hp = np.maximum(heights_map[cy, cx].astype(np.float32), 0)
            b_list.append(ds * pos)
            h_list.append(
                [ds * float(np.percentile(hp[:, 0], 50)),
                 ds * float(np.percentile(hp[:, 1], 50))]
            )
        return b_list, h_list

    BASELINE_POINTS = 16

    def _geometry(self, b_list, h_list):
        """Resample baselines to a fixed point count and pad the line axis
        to max_lines: (max_lines, P, 2) + (max_lines, 2) + widths."""
        n = min(len(b_list), self.max_lines)
        if n == 0:
            return None, None, None
        baselines = np.zeros(
            (self.max_lines, self.BASELINE_POINTS, 2), np.float32
        )
        heights = np.ones((self.max_lines, 2), np.float32)
        widths = np.zeros(self.max_lines, np.int32)
        for i in range(n):
            resampled = line_geometry.resample_baseline(
                np.asarray(b_list[i], float), self.BASELINE_POINTS
            )
            baselines[i] = resampled
            heights[i] = h_list[i]
            arc = np.hypot(*np.diff(resampled, axis=0).T).sum()
            scale = self.crop_height / max(h_list[i][0] + h_list[i][1], 1e-6)
            widths[i] = min(int(arc * scale), self.crop_bucket)
        return baselines, heights, widths[:n]

    # ------------------------------------------------------------------
    def run(
        self,
        pages: Iterable[np.ndarray],
        lines_override: Optional[Callable[[np.ndarray], Tuple[list, list]]] = None,
    ) -> Iterator[PageResult]:
        """Process a stream of pages with one-page lookahead overlap.

        ``lines_override(page) -> (baselines, heights)`` replaces the
        CNN line detection (used by benchmarks / classical-layout
        configs); stage A still runs to include its cost."""
        pages = list(pages)
        n = len(pages)
        if n == 0:
            return

        # Dispatch stage A for page 0.
        device_pages = [None] * n
        stage_a_out = [None] * n

        def dispatch_a(i):
            device_pages[i] = jnp.asarray(pages[i])
            stage_a_out[i] = self._stage_a(jnp.asarray(self._canvas(pages[i])))

        dispatch_a(0)
        for i in range(n):
            if i + 1 < n:
                dispatch_a(i + 1)  # overlaps with host work below

            masks = jax.tree_util.tree_map(np.asarray, stage_a_out[i])
            baselines_mask, connected, heights_map, _ = masks

            if lines_override is not None:
                b_list, h_list = lines_override(pages[i])
            else:
                b_list, h_list = self._lines_from_masks(
                    baselines_mask, connected, heights_map
                )

            baselines, heights, widths = self._geometry(b_list, h_list)
            if baselines is None:
                yield PageResult(i, b_list, h_list, None, None, None)
                stage_a_out[i] = device_pages[i] = None
                continue

            labels, lengths = self._stage_b(
                device_pages[i], jnp.asarray(baselines), jnp.asarray(heights)
            )
            yield PageResult(
                i, b_list, h_list,
                np.asarray(labels), np.asarray(lengths), widths,
            )
            stage_a_out[i] = device_pages[i] = None
