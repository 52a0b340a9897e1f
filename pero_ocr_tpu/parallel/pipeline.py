"""Device-resident page pipeline with cross-page overlap.

The serving architecture for page throughput (SURVEY.md §7 step 9).
Per batch of pages, ONE grayscale upload feeds everything (optionally
packed two 4-bit pixels per byte — ``transport_bits=4`` — since the
host link, not the chip, bounds end-to-end throughput):

- **Stage A** (one jitted dispatch): device area-downsample -> ParseNet
  maps -> fused post-processing.  Only tiny artifacts return to the
  host: 2-bit-packed baseline/connection masks (4 px/byte) and a
  half-resolution quarter-pixel-quantized heights map (~0.2MB/page).
- **Host**: connected components -> baselines (vectorized numpy; tiny
  next to device work; geometry uploads are ~KB).
- **Stage B** (two chained device programs, data resident): structured
  gather-free crop warp -> CTC recognizer -> greedy labels.  Only packed
  label ids come back.

Batches overlap: the NEXT batch's upload + stage-A dispatch run on a
worker thread while this thread post-processes the current batch.

On a multi-chip mesh the page batch axis shards over ``dp``; on one chip
this degenerates to the pipelined single-stream below.
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
        line_slot: int = 32,
        max_lines: Optional[int] = None,
        height_scale: float = 1.0,
        mesh=None,
        transport_bits: int = 8,
    ):
        """``mesh``: optional jax.sharding.Mesh with a 'dp' axis — page
        batches shard across it (page_batch must be a multiple of the dp
        size); stage programs are jitted with batch-over-dp input
        shardings and GSPMD partitions the compute.

        ``line_slot``: the line axis of each stage-B dispatch is padded to
        a multiple of this, sized to the densest page in the batch — NO
        line cap (the reference has none either,
        reference: pero_ocr/ocr_engine/line_ocr_engine.py:79-127); each
        distinct multiple compiles one extra stage-B program.
        ``max_lines``: optional explicit hard cap (None = unlimited).

        ``transport_bits``: 8 uploads raw grayscale pages; 4 packs two
        rounded 4-bit pixels per byte on the host and reconstructs on
        device (x16 quantization, error <= 8 gray levels) — halves the
        host-link bytes, which bound end-to-end page throughput."""
        if transport_bits not in (4, 8):
            raise ValueError("transport_bits must be 4 or 8")
        self.transport_bits = transport_bits
        self.mesh = mesh
        self.height_scale = height_scale  # LINE_CROPPER LINE_SCALE semantics
        self.downsample = downsample
        self.detection_threshold = detection_threshold
        self.line_end_weight = line_end_weight
        self.crop_height = crop_height
        self.crop_bucket = crop_bucket
        self.max_lines = max_lines
        self.line_slot = line_slot if max_lines is None else min(line_slot, max_lines)

        pn_apply = parsenet_model.apply
        rec_apply = recognizer_model.apply

        ds = downsample

        @jax.jit
        def stage_a(pages_u8):
            """pages_u8: (PB, H, W) uint8 GRAYSCALE full pages — the SAME
            upload stage B consumes (the host link runs ~25MB/s, so pages
            travel once, single-channel; the device area-downsamples for
            ParseNet and broadcasts to the models' 3-channel input).

            Downloads are minimized: both masks bit-pack 4 px/byte and
            heights quantize to half-res uint8 quarter-pixels — ~0.2MB per
            page instead of the 5.7MB raw float maps."""
            x = pages_u8.astype(jnp.float32)[..., None]  # (PB, H, W, 1)
            small = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, ds, ds, 1), (1, ds, ds, 1), "VALID"
            ) / (ds * ds)
            # Pad to multiples of 64 for the U-Net.
            h64 = int(np.ceil(small.shape[1] / 64) * 64)
            w64 = int(np.ceil(small.shape[2] / 64) * 64)
            small = jnp.pad(
                small,
                ((0, 0), (0, h64 - small.shape[1]), (0, w64 - small.shape[2]),
                 (0, 0)),
            )
            images = jnp.broadcast_to(
                small / 255.0, small.shape[:3] + (3,)
            )
            maps = pn_apply(parsenet_variables, images)

            def post(m):
                return _postprocess_maps(m, detection_threshold, line_end_weight)

            baselines_mask, connected, heights_map, _ = jax.vmap(post)(maps)
            two_bit = (
                baselines_mask.astype(jnp.uint8)
                + 2 * connected.astype(jnp.uint8)
            )
            # Bit-pack 4 pixels per byte (2 bits each): W must be %4.
            pb_, hh_, ww_ = two_bit.shape
            packed = two_bit.reshape(pb_, hh_, ww_ // 4, 4)
            packed = (
                packed[..., 0]
                + (packed[..., 1] << 2)
                + (packed[..., 2] << 4)
                + (packed[..., 3] << 6)
            )
            # Heights at half resolution (the maps are smooth), quarter-px
            # quantized uint8.
            heights_half = jax.lax.reduce_window(
                heights_map, 0.0, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
            heights_q = jnp.clip(
                jnp.round(heights_half * 4.0), 0, 255
            ).astype(jnp.uint8)
            return packed, heights_q

        crop_h = crop_height
        bucket = crop_bucket

        @jax.jit
        def stage_b_warp(pages_u8, baselines, heights):
            """pages_u8: (PB, H, W, 3) uint8; baselines: (PB, N, P, 2);
            heights: (PB, N, 2) -> (PB*N, Hc, Wb, 3) crops.  Uses the
            structured (gather-free) warp — 2x the XLA gather's rate on
            v5e; only tiny geometry tensors cross the host link."""
            from pero_ocr_tpu.ops.warp_structured import warp_lines_structured

            pb, n = baselines.shape[:2]
            pages3 = jnp.broadcast_to(
                pages_u8[..., None], pages_u8.shape + (3,)
            )
            crops = jax.vmap(
                lambda page, bl, h: warp_lines_structured(
                    page, bl, h, crop_h, bucket
                )
            )(pages3, baselines, heights)
            return crops.reshape((pb * n,) + crops.shape[2:])

        def stage_b_recognize(crops, pb: int):
            """Crops stay device-resident between the two programs.  (Kept
            as a SEPARATE program from the warp: fused into one, XLA
            re-executes the page gather inside the recognizer's conv
            windows — a measured ~10x stage blowup on v5e.)"""
            logits = rec_apply(recognizer_variables, crops / 255.0)
            valid = jnp.full((crops.shape[0],), logits.shape[1], jnp.int32)
            labels, lengths = ctc_ops.greedy_ctc_labels(logits, valid)
            n = crops.shape[0] // pb
            return labels.reshape(pb, n, -1), lengths.reshape(pb, n)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P("dp"))
            stage_a = jax.jit(
                stage_a.__wrapped__, in_shardings=(batch_sh,)
            )
            stage_b_warp = jax.jit(
                stage_b_warp.__wrapped__,
                in_shardings=(batch_sh, batch_sh, batch_sh),
            )

        self._stage_a = stage_a
        self._stage_b_warp = stage_b_warp
        self._stage_b_recognize = jax.jit(
            stage_b_recognize, static_argnums=(1,)
        )

        def stage_b(pages_u8, baselines, heights):
            crops = stage_b_warp(pages_u8, baselines, heights)
            return self._stage_b_recognize(crops, baselines.shape[0])

        self._stage_b = stage_b

        @jax.jit
        def unpack4(packed_u8):
            """(PB, H, W/2) packed nibbles -> (PB, H, W) uint8 pages.
            q*17 maps 0..15 back onto 0..255 exactly at the endpoints."""
            hi = (packed_u8 >> 4) * jnp.uint8(17)
            lo = (packed_u8 & 0xF) * jnp.uint8(17)
            pb, h, w2 = packed_u8.shape
            return jnp.stack([hi, lo], axis=-1).reshape(pb, h, w2 * 2)

        self._unpack4 = unpack4

    # ------------------------------------------------------------------
    @staticmethod
    def _pack4(grays: np.ndarray) -> np.ndarray:
        """(PB, H, W) uint8 -> (PB, H, W/2) rounded 4-bit pairs.  Odd
        widths get one replicated edge column first (a one-pixel-wide
        page-border artifact; baseline coordinates are unaffected)."""
        if grays.shape[2] % 2:
            grays = np.concatenate([grays, grays[:, :, -1:]], axis=2)
        # round(v / 17): bins center on the decoder's q*17 grid, so the
        # roundtrip error is at most ceil(17/2) = 9 gray levels.
        q = ((grays.astype(np.uint16) + 8) // 17).astype(np.uint8)
        return (q[:, :, 0::2] << 4) | q[:, :, 1::2]

    @staticmethod
    def _gray(page: np.ndarray) -> np.ndarray:
        """Single-channel uint8 view of a page (pages travel grayscale over
        the host link; the device broadcasts channels)."""
        import cv2

        if page.ndim == 2:
            return page
        return cv2.cvtColor(page, cv2.COLOR_BGR2GRAY)

    def _canvas(self, page: np.ndarray) -> np.ndarray:
        import cv2

        ds = self.downsample
        small = cv2.resize(
            page, (0, 0), fx=1 / ds, fy=1 / ds, interpolation=cv2.INTER_AREA
        )
        h = int(np.ceil(small.shape[0] / 64) * 64)
        w = int(np.ceil(small.shape[1] / 64) * 64)
        canvas = np.zeros((h, w), np.uint8)
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

    def _geometry(self, b_list, h_list, n_slot: int):
        """Resample baselines to a fixed point count and pad the line axis
        to the batch's slot count: (n_slot, P, 2) + (n_slot, 2) + widths."""
        n = len(b_list)
        if n == 0:
            return None, None, None
        baselines = np.zeros(
            (n_slot, self.BASELINE_POINTS, 2), np.float32
        )
        heights = np.ones((n_slot, 2), np.float32)
        widths = np.zeros(n_slot, np.int32)
        for i in range(n):
            resampled = line_geometry.resample_baseline(
                np.asarray(b_list[i], float), self.BASELINE_POINTS
            )
            baselines[i] = resampled
            heights[i] = np.asarray(h_list[i]) * self.height_scale
            arc = np.hypot(*np.diff(resampled, axis=0).T).sum()
            scale = self.crop_height / max(h_list[i][0] + h_list[i][1], 1e-6)
            widths[i] = min(int(arc * scale), self.crop_bucket)
        return baselines, heights, widths[:n]

    # ------------------------------------------------------------------
    def run(
        self,
        pages: Iterable[np.ndarray],
        lines_override: Optional[Callable[[np.ndarray], Tuple[list, list]]] = None,
        page_batch: int = 4,
    ) -> Iterator[PageResult]:
        """Process a stream of pages with one-batch lookahead overlap.

        Pages are grouped `page_batch` at a time into single stage-A /
        stage-B dispatches — program switches and transfers amortize over
        the batch (the tunnel charges ~70ms per program alternation).
        All pages within one `run` call must share a shape.

        ``lines_override(page) -> (baselines, heights)`` replaces the
        CNN line detection (used by benchmarks / classical-layout
        configs); stage A still runs to include its cost."""
        pages = list(pages)
        n = len(pages)
        if n == 0:
            return

        from concurrent.futures import ThreadPoolExecutor

        from pero_ocr_tpu.utils.timing import stage_timer

        batches = [
            list(range(s, min(s + page_batch, n)))
            for s in range(0, n, page_batch)
        ]

        device_pages: dict = {}
        stage_a_out: dict = {}

        def dispatch_a(batch_idx):
            ids = batches[batch_idx]
            # Pad the final batch by repeating its last page so every
            # dispatch reuses the same compiled shape.
            padded = ids + [ids[-1]] * (page_batch - len(ids))
            grays = np.stack([self._gray(pages[i]) for i in padded])
            if self.transport_bits == 4:
                stack = self._unpack4(jnp.asarray(self._pack4(grays)))
            else:
                stack = jnp.asarray(grays)
            device_pages[batch_idx] = stack
            stage_a_out[batch_idx] = self._stage_a(stack)

        # Uploads block on the host link, so the NEXT batch's upload +
        # stage-A dispatch run on a worker thread while this thread syncs
        # and post-processes the current batch.
        uploader = ThreadPoolExecutor(max_workers=1)
        pending = uploader.submit(dispatch_a, 0)
        for batch_idx, ids in enumerate(batches):
            with stage_timer("pipeline/upload+dispatch_a"):
                pending.result()
            if batch_idx + 1 < len(batches):
                pending = uploader.submit(dispatch_a, batch_idx + 1)

            with stage_timer("pipeline/stage_a_sync"):
                packed, heights_q = jax.tree_util.tree_map(
                    np.asarray, stage_a_out[batch_idx]
                )
            # Unpack 4x 2-bit pixels per byte; upsample heights 2x back.
            two_bit = np.stack(
                [(packed >> (2 * i)) & 3 for i in range(4)], axis=-1
            ).reshape(packed.shape[0], packed.shape[1], packed.shape[2] * 4)
            baselines_masks = two_bit & 1
            connecteds = (two_bit >> 1) & 1
            heights_maps = (
                heights_q.astype(np.float32) / 4.0
            ).repeat(2, axis=1).repeat(2, axis=2)

            with stage_timer("pipeline/host_geometry"):
                page_lines = []
                for slot, i in enumerate(ids):
                    if lines_override is not None:
                        b_list, h_list = lines_override(pages[i])
                    else:
                        b_list, h_list = self._lines_from_masks(
                            baselines_masks[slot], connecteds[slot],
                            heights_maps[slot],
                        )
                    if self.max_lines is not None:
                        b_list = b_list[: self.max_lines]
                        h_list = h_list[: self.max_lines]
                    page_lines.append((b_list, h_list))
                # Pad the line axis to the densest page in the batch,
                # rounded up to a line_slot multiple (bounds distinct
                # stage-B compile shapes; no line is ever dropped).
                max_n = max(len(b) for b, _ in page_lines)
                n_slot = max(
                    self.line_slot,
                    int(np.ceil(max_n / self.line_slot)) * self.line_slot,
                )
                page_geoms = [
                    (b_list, h_list)
                    + self._geometry(b_list, h_list, n_slot)
                    for b_list, h_list in page_lines
                ]

            any_lines = any(g[2] is not None for g in page_geoms)
            if not any_lines:
                for i, g in zip(ids, page_geoms):
                    yield PageResult(i, g[0], g[1], None, None, None)
                device_pages.pop(batch_idx, None)
                stage_a_out.pop(batch_idx, None)
                continue

            with stage_timer("pipeline/stage_b"):
                zeros_b = np.zeros(
                    (n_slot, self.BASELINE_POINTS, 2), np.float32
                )
                ones_h = np.ones((n_slot, 2), np.float32)
                bl = np.stack(
                    [
                        g[2] if g[2] is not None else zeros_b
                        for g in page_geoms
                    ]
                    + [zeros_b] * (page_batch - len(ids))
                )
                hh = np.stack(
                    [
                        g[3] if g[3] is not None else ones_h
                        for g in page_geoms
                    ]
                    + [ones_h] * (page_batch - len(ids))
                )
                labels, lengths = self._stage_b(
                    device_pages[batch_idx], jnp.asarray(bl), jnp.asarray(hh)
                )
                labels = np.asarray(labels)
                lengths = np.asarray(lengths)

            for slot, (i, g) in enumerate(zip(ids, page_geoms)):
                if g[2] is None:
                    yield PageResult(i, g[0], g[1], None, None, None)
                else:
                    yield PageResult(
                        i, g[0], g[1], labels[slot], lengths[slot], g[4]
                    )
            device_pages.pop(batch_idx, None)
            stage_a_out.pop(batch_idx, None)
