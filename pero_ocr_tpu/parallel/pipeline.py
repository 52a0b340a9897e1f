"""Device-resident page pipeline with cross-page overlap.

The serving architecture for page throughput (SURVEY.md §7 step 9).
Two transport modes, selected by the deployment's binding constraint:

``transport="page"`` (device-warp; best when the host link is fast):
per batch of pages, ONE grayscale upload feeds everything (optionally
packed two 4-bit pixels per byte — ``transport_bits=4``):

- **Stage A** (one jitted dispatch): device area-downsample -> ParseNet
  maps -> fused post-processing.  Only tiny artifacts return to the
  host: the 1-bit-packed baseline mask (8 px/byte; the connection
  dilation is replayed host-side) and pooled quarter-pixel-quantized
  heights/separator maps whose pool factor doubles on large canvases
  (~0.1MB/page flat across the adaptation ladder).
- **Host**: connected components -> baselines (one native C++ pass
  over the packed bits; tiny next to device work; geometry uploads
  are ~KB).
- **Stage B** (two chained device programs, data resident): structured
  gather-free crop warp -> CTC recognizer -> greedy labels.  Only packed
  label ids come back.

``transport="crops"`` (host-warp; best when the host link is slow):
full pages never travel.  Stage A consumes a HOST-downsampled 1/4-res
page; the host warps line crops itself (cv2.remap over the measured
warp field — ~2.5ms for 40 lines, vs ~30ms to push the full page
through a 25MB/s link) and uploads only the packed crops for the
recognizer.  By default (``trim_crops=True``) the crops travel
WIDTH-TRIMMED: every line's valid columns concatenate into one
width-major strip ``(W, Hc)`` (bit-packed along the height axis) plus
per-line int32 offsets/widths, and the device rebuilds the bucketed
crop tensor with a vmapped ``dynamic_slice`` — no ``n_slot x
crop_bucket`` zero padding ever crosses the link.  The strip width
quantizes to a coarse ladder to bound compiles.  ``trim_crops=False``
keeps the dense zero-padded buffer (zero padding partially compresses
in transport — ~142MB/s vs ~55MB/s entropy-dense — but the trimmed
strip still ships strictly fewer bytes).

Batches overlap several ways: the NEXT batch's image prep runs on a
worker thread; in crop transport the host geometry parse + warp of
batch i run on a second worker overlapped with batch i+1's whole
upload/dispatch/sync (crops trail their page batch by 2 dispatches);
in page transport, stage-B label fetches trail one batch behind.

On a multi-chip mesh the page batch axis shards over ``dp``; on one chip
this degenerates to the pipelined single-stream below.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.core import line_geometry
from pero_ocr_tpu.layout_engines.cnn_engine import _postprocess_maps
from pero_ocr_tpu.ops import ctc as ctc_ops
from pero_ocr_tpu.ops import warp as warp_ops
from pero_ocr_tpu.utils.timing import stage_timer


@dataclasses.dataclass
class PageResult:
    page_index: int
    baselines: List[np.ndarray]
    heights: List[List[float]]
    labels: Optional[np.ndarray]      # (N, T) packed label ids, -1 padded
    label_lengths: Optional[np.ndarray]
    crops_width: Optional[np.ndarray]
    clusters: Optional[List[int]] = None   # paragraph id per line
    confidences: Optional[np.ndarray] = None  # (N,) worst-run prob per line
    # Optional top-k sparse logits (want_logits=True): (N, T, K) float16
    # values + (N, T, K) uint16 class indices — the device-side
    # equivalent of the reference's p<1e-4 sparsification
    # (reference: pero_ocr/ocr_engine/line_ocr_engine.py:168-172).
    logits_vals: Optional[np.ndarray] = None
    logits_idx: Optional[np.ndarray] = None
    # Textline outline polygons (one per line), built once in the host
    # worker where paragraph clustering already needs them — consumers
    # (fast_pipeline PageLayout assembly) reuse instead of recomputing.
    # None when clustering is off (classical overrides).
    textlines: Optional[List[np.ndarray]] = None


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
        transport: str = "page",
        cluster_paragraphs: bool = True,
        paragraph_line_threshold: float = 0.3,
        trim_crops: bool = True,
        dither_2bit: bool = False,
        want_logits: bool = False,
        logits_topk: int = 8,
        adaptive_downsample: bool = False,
        override_inflight: int = 2,
        canvas_bits: Optional[int] = None,
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

        ``transport_bits``: 8 uploads raw grayscale pixels; 4 packs two
        rounded 4-bit pixels per byte on the host and reconstructs on
        device (x16 quantization, error <= 8 gray levels) — halves the
        host-link bytes, which bound end-to-end page throughput; 2 (crop
        transport only, for high-contrast print) packs four 2-bit pixels
        per byte for the CROPS while the layout page stays 4-bit.

        ``canvas_bits`` (crop transport only): packing for the 1/ds
        LAYOUT canvas independent of the crops — None follows
        transport_bits (4-bit canvas when transport_bits <= 4, raw at
        8); 2 halves the canvas upload for high-contrast print at a
        DETECTION-input quantization (gate it like the crop bits:
        the toy-detector parity test in tests/test_pipeline.py is
        necessary, not sufficient, for real models).

        ``transport``: "page" ships whole pages and warps crops on
        device; "crops" ships a host-downsampled 1/4-res page for layout
        plus host-warped line crops (~3x fewer link bytes; see module
        docstring).

        ``trim_crops`` (crops transport only): concatenate valid crop
        columns into one width-major strip instead of the dense
        zero-padded buffer (see module docstring).

        ``dither_2bit``: Bayer-dither the 2-bit crop quantizer.  OFF by
        default: plain rounding keeps the constant background bytes the
        transport compresses (~94MB/s vs ~48MB/s entropy-dense on the
        measured tunnel), so the dithered variant uploads SLOWER than
        4-bit despite half the raw size; reserve dithering for direct
        (uncompressed) links.

        ``want_logits``: additionally download per-line TOP-K sparse
        logits ((T, K) float16 values + uint16 class ids per line) so
        the caller can materialize the reference's sparse logits pickle
        and run forced alignment / ALTO export at fast-path throughput.
        CTC recognizers only (AR transformers cannot produce CTC
        logits, same preflight as the reference:
        user_scripts/parse_folder.py:274-280).  Costs ~4*K bytes per
        frame of download; keep it off on pure-throughput runs.

        ``adaptive_downsample``: the reference's two-pass resolution
        adaptation (torch_parsenet.py:60-93) inside the batched loop:
        when the detected median line height leaves the 9-15px map-pixel
        band, the batch's stage A re-dispatches at the corrected scale
        (quantized to an integer ladder so compiled shapes stay bounded)
        and the corrected scale STICKS for subsequent batches (the
        reference's last_downsample)."""
        if transport not in ("page", "crops"):
            raise ValueError("transport must be 'page' or 'crops'")
        if transport_bits not in ((2, 4, 8) if transport == "crops" else (4, 8)):
            raise ValueError(
                f"transport_bits={transport_bits} invalid for "
                f"transport='{transport}' (2-bit is crops-only)"
            )
        self.transport = transport
        self.transport_bits = transport_bits
        if canvas_bits is not None:
            if transport != "crops":
                raise ValueError("canvas_bits requires transport='crops'")
            if canvas_bits not in (8, 4, 2):
                raise ValueError(f"canvas_bits={canvas_bits} invalid")
        self.canvas_bits = (
            canvas_bits if canvas_bits is not None
            else (4 if transport_bits in (2, 4) else 8)
        )
        self.trim_crops = trim_crops and transport == "crops"
        self.dither_2bit = dither_2bit
        self.mesh = mesh
        self.height_scale = height_scale  # LINE_CROPPER LINE_SCALE semantics
        self.downsample = downsample
        self.adaptive_downsample = adaptive_downsample
        # Reference's sticky last_downsample (torch_parsenet.py:28-35).
        self._last_ds = downsample
        self.detection_threshold = detection_threshold
        self.line_end_weight = line_end_weight
        self.crop_height = crop_height
        self.crop_bucket = crop_bucket
        self.max_lines = max_lines
        self.line_slot = line_slot if max_lines is None else min(line_slot, max_lines)
        # Depth of the dispatched-but-unfetched window in the
        # lines-override loop (_run_crops_override): label fetches trail
        # their dispatch by this many batches so a fetch's link round
        # trip queues behind later batches' uploads.
        self.override_inflight = max(1, int(override_inflight))
        # CNN-path crop lag (_run_crops): batch i's crops ride dispatch
        # i+lag, overlapping the host CC parse + warp with the link.
        # Each unit of lag costs one flush dispatch round per stream;
        # 2 hides a full batch cycle of host work, 1 suffices when the
        # native warp/CC kernels carry the host side.
        self.crop_lag = 2
        self.cluster_paragraphs = cluster_paragraphs
        if cluster_paragraphs:
            from pero_ocr_tpu.layout_engines.cnn_engine import (
                ParagraphClusterer,
            )

            self._clusterer = ParagraphClusterer(paragraph_line_threshold)

        # parsenet_model may be None for recognize-only pipelines (the
        # re-OCR path over config-provided geometry: run(...,
        # skip_stage_a=True)); the stage-A closures are defined either
        # way but only dispatched when a layout stage exists.
        pn_apply = parsenet_model.apply if parsenet_model is not None else None
        # Super-resolving detector heads (ParseNet.out_upsample > 1)
        # emit maps at U x the canvas resolution.  Every scale in this
        # pipeline (`downsample`, `_last_ds`, the adaptation ladder, CC
        # coordinates, separator/heights maps) is the MAP scale; only
        # the canvas itself is built U x coarser — so the honest loop's
        # ds-2 steady state uploads a 1/(2U)-res canvas (1/U^2 the
        # bytes) while the band semantics stay the reference's.
        self.map_upsample = int(
            getattr(parsenet_model, "out_upsample", 1) or 1
        )
        map_up = self.map_upsample
        rec_apply = recognizer_model.apply
        # Transformer recognizers (AR decode) are detected by their
        # decode_train entry point; CTC models run forward + greedy
        # collapse.  Both decode fully ON DEVICE inside stage B.
        is_transformer = hasattr(recognizer_model, "decode_train")
        # Converted REFERENCE transformer checkpoints (the post-LN torch
        # mirror, models/transformer_ref.py) are detected by their spec's
        # boundary_id and run their own scan-based greedy decode in
        # stage B (reference engine semantics:
        # pero_ocr/ocr_engine/transformer_ocr_engine.py:49-89).
        spec_obj = getattr(recognizer_model, "spec", None)
        is_ref_transformer = is_transformer and hasattr(
            spec_obj, "boundary_id"
        )
        if want_logits and is_transformer:
            raise ValueError(
                "want_logits requires a CTC recognizer (AR transformer "
                "outputs are incompatible with CTC logits, reference: "
                "user_scripts/parse_folder.py:274-280)"
            )
        self.want_logits = want_logits
        if is_ref_transformer:
            _num_classes = spec_obj.num_symbols
            # Padded steps emit the boundary id; the ignore id is the
            # largest the argmax can produce.
            recognizer_max_label = _num_classes - 1
        else:
            _num_classes = getattr(spec_obj, "num_classes", 256)
            # Largest label id stage B can emit (the native transformer
            # pads with the EOS id = num_classes + 1).
            recognizer_max_label = (
                _num_classes + 1 if is_transformer else _num_classes - 1
            )
        topk = min(logits_topk, _num_classes)

        ds = downsample
        canvas_bits_resolved = self.canvas_bits

        def maps_and_pack(small):
            """small: (PB, h64, w64, 1) float gray in [0, 255] at 1/ds
            resolution -> packed masks + quantized heights + separator.

            Downloads are minimized: the baseline mask bit-packs 8 px
            per byte (the `connected` dilation is NOT shipped — the
            host replays the exact (5,3) max filter with cv2.dilate,
            see _unpack_stage_a), heights quantize to uint8
            quarter-pixels, the separator travels 4-bit 2 px/byte.

            Heights/separator pooling doubles on large canvases (the
            adaptive downsample's ds<=2 second-pass shapes): the maps'
            FULL-RES granularity stays what the default ds-4 shape
            ships (16 px heights, 8 px separator), so the per-page
            download budget is ~flat across the ladder instead of
            growing 4x at ds 2 (the honest loop's steady state on
            bench pages is wire-bound there)."""
            images = jnp.broadcast_to(
                small / 255.0, small.shape[:3] + (3,)
            )
            maps = pn_apply(parsenet_variables, images)

            def post(m):
                return _postprocess_maps(
                    m, detection_threshold, line_end_weight,
                    connected=False,
                )

            baselines_mask, _, heights_map, separator = (
                jax.vmap(post)(maps)
            )
            pb_, hh_, ww_ = baselines_mask.shape
            bits = baselines_mask.astype(jnp.uint8).reshape(
                pb_, hh_, ww_ // 8, 8
            )
            packed = (
                bits[..., 0]
                | (bits[..., 1] << 1)
                | (bits[..., 2] << 2)
                | (bits[..., 3] << 3)
                | (bits[..., 4] << 4)
                | (bits[..., 5] << 5)
                | (bits[..., 6] << 6)
                | (bits[..., 7] << 7)
            )
            hf = 8 if hh_ > 640 else 4
            sf = hf // 2
            heights_qp = jax.lax.reduce_window(
                heights_map, 0.0, jax.lax.max, (1, hf, hf, 1),
                (1, hf, hf, 1), "VALID",
            )
            heights_q = jnp.clip(
                jnp.round(heights_qp * 4.0), 0, 255
            ).astype(jnp.uint8)
            sep_pool = jax.lax.reduce_window(
                separator, 0.0, jax.lax.max, (1, sf, sf), (1, sf, sf),
                "VALID",
            )
            sep_nib = jnp.clip(
                jnp.round(sep_pool * 15.0), 0, 15
            ).astype(jnp.uint8)
            sep_q = (sep_nib[:, :, 0::2] << 4) | sep_nib[:, :, 1::2]
            return packed, heights_q, sep_q

        @partial(jax.jit, static_argnums=(1,))
        def stage_a(pages_u8, ds_run=ds):
            """pages_u8: (PB, H, W) uint8 GRAYSCALE full pages — the SAME
            upload stage B consumes (pages travel once, single-channel;
            the device area-downsamples for ParseNet and broadcasts to
            the models' 3-channel input).  ``ds_run`` is static: the
            adaptive second pass re-dispatches the SAME uploaded pages at
            a corrected integer scale (one compile per ladder entry).
            ``ds_run`` is the MAP scale; the canvas downsamples by
            ds_run * map_up (SR heads read a coarser canvas)."""
            dc = ds_run * map_up
            x = pages_u8.astype(jnp.float32)[..., None]  # (PB, H, W, 1)
            small = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, dc, dc, 1),
                (1, dc, dc, 1), "VALID"
            ) / (dc * dc)
            # Pad to multiples of 64 for the U-Net.
            h64 = int(np.ceil(small.shape[1] / 64) * 64)
            w64 = int(np.ceil(small.shape[2] / 64) * 64)
            small = jnp.pad(
                small,
                ((0, 0), (0, h64 - small.shape[1]), (0, w64 - small.shape[2]),
                 (0, 0)),
            )
            return maps_and_pack(small)

        @jax.jit
        def stage_a_small(small_u8):
            """Crop-transport stage A: small_u8 is the (PB, h64, w64)
            uint8 1/ds-res page the HOST already downsampled (cv2
            INTER_AREA) — the full page never crosses the link."""
            return maps_and_pack(small_u8.astype(jnp.float32)[..., None])

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

        @jax.jit
        def stage_b_warp_gather(pages_u8, baselines, heights):
            """Exact-warp fallback (XLA gather, cv2.remap semantics) for
            batches with lines the structured path would distort — strong
            tilt beyond its MAX_SHIFT roll budget or spans beyond its
            block budget (ops/warp_structured.structured_warp_supported;
            the host picks the program per batch)."""
            from pero_ocr_tpu.ops import warp as warp_ops

            pb, n = baselines.shape[:2]
            pages3 = jnp.broadcast_to(
                pages_u8[..., None], pages_u8.shape + (3,)
            )

            def one(page, bl, h):
                fields = warp_ops.build_fields_device(
                    bl, h, crop_h, bucket
                )
                return warp_ops.warp_lines_xla(page, fields)

            crops = jax.vmap(one)(pages3, baselines, heights)
            return crops.reshape((pb * n,) + crops.shape[2:])

        def stage_b_recognize(crops, pb: int, widths=None):
            """Crops stay device-resident between the two programs.  (Kept
            as a SEPARATE program from the warp: fused into one, XLA
            re-executes the page gather inside the recognizer's conv
            windows — a measured ~10x stage blowup on v5e.)

            CTC: forward + on-device greedy collapse.  Transformer: the
            whole greedy AR decode runs as one lax.scan with KV caching
            (models/transformer.greedy_decode) — the fast path is no
            longer CTC-only.

            ``widths`` ((N,) int32 crop pixel widths, optional): CTC
            decode/confidence run over each line's VALID frames only
            (the reference's logit_coords semantics,
            reference: pero_ocr/ocr_engine/line_ocr_engine.py:149-166),
            so outputs are invariant to the crop tensor's zero tail —
            i.e. to the rebuild-width ladder and the crop bucket.

            Returns (labels, lengths, confs, logit_vals, logit_idx);
            the last two are None unless want_logits (see __init__)."""
            n = crops.shape[0] // pb
            if is_ref_transformer:
                from pero_ocr_tpu.models.transformer_ref import (
                    greedy_decode_ref,
                )

                dec_len = max(8, min(
                    crop_bucket // 4, spec_obj.max_seq_len - 1
                ))
                tokens, lengths, logits = greedy_decode_ref(
                    recognizer_model, recognizer_variables,
                    crops / 255.0, dec_len,
                )
                # Min chosen-token probability over emitted steps — the
                # same confidence the native transformer path ships.
                probs = jax.nn.softmax(logits, axis=-1)
                chosen = jnp.take_along_axis(
                    probs, tokens[..., None], axis=-1
                )[..., 0]
                emitted = (
                    jnp.arange(dec_len)[None, :] < lengths[:, None]
                )
                confs = jnp.where(emitted, chosen, 1.0).min(axis=1)
                return (tokens.reshape(pb, n, -1), lengths.reshape(pb, n),
                        confs.reshape(pb, n), None, None)
            if is_transformer:
                from pero_ocr_tpu.models.transformer import greedy_decode

                dec_len = max(8, min(
                    crop_bucket // 4,
                    recognizer_model.spec.max_decode_len,
                ))
                tokens, lengths, confs = greedy_decode(
                    recognizer_model, recognizer_variables,
                    crops / 255.0, dec_len,
                )
                return (tokens.reshape(pb, n, -1), lengths.reshape(pb, n),
                        confs.reshape(pb, n), None, None)
            logits = rec_apply(recognizer_variables, crops / 255.0)
            if widths is None:
                valid = jnp.full(
                    (crops.shape[0],), logits.shape[1], jnp.int32
                )
            else:
                sub = max(1, crops.shape[2] // logits.shape[1])
                # Deliberate ceil (reference logit_coords floors,
                # line_ocr_engine.py:162-164): a line whose width is not
                # a multiple of the subsampling still has real pixels in
                # its last partial frame, and dropping it truncates
                # trailing characters.  The reference never masks frames
                # at all (it pads crops and decodes the full logit
                # length); ceil is the tightest mask that keeps every
                # frame the reference would have decoded from real ink.
                valid = jnp.clip(
                    (widths + sub - 1) // sub, 0, logits.shape[1]
                ).astype(jnp.int32)
            labels, lengths = ctc_ops.greedy_ctc_labels(logits, valid)
            # One float per line replaces the logits download for the
            # reference's confidence observability (get_prob semantics).
            confs = ctc_ops.greedy_worst_run_confidence(logits, valid)
            lvals = lidx = None
            if want_logits:
                # Device-side sparsification: the K largest logits per
                # frame cover everything the reference's p<1e-4 prune
                # keeps in its csc pickle (line_ocr_engine.py:168-172);
                # float16 + uint16 quarters the download bytes.
                vals, idx = jax.lax.top_k(logits, topk)
                t = logits.shape[1]
                lvals = vals.astype(jnp.float16).reshape(pb, n, t, topk)
                lidx = idx.astype(jnp.uint16).reshape(pb, n, t, topk)
            return (labels.reshape(pb, n, -1), lengths.reshape(pb, n),
                    confs.reshape(pb, n), lvals, lidx)

        def unpack4_expr(packed_u8):
            """(..., H, W/2) nibble pairs -> (..., H, W) uint8 (inline
            expression shared by the jitted programs)."""
            hi = (packed_u8 >> 4) * jnp.uint8(17)
            lo = (packed_u8 & 0xF) * jnp.uint8(17)
            return jnp.stack([hi, lo], axis=-1).reshape(
                packed_u8.shape[:-1] + (packed_u8.shape[-1] * 2,)
            )

        def unpack2_expr(packed_u8):
            """(..., H, W/4) 2-bit quads -> (..., H, W) uint8; q*85 maps
            0..3 onto 0..255 exactly at the endpoints."""
            quads = [
                ((packed_u8 >> (2 * i)) & 0x3) * jnp.uint8(85)
                for i in range(4)
            ]
            return jnp.stack(quads, axis=-1).reshape(
                packed_u8.shape[:-1] + (packed_u8.shape[-1] * 4,)
            )

        def stage_b_crops(crops_u8, widths, pb: int):
            """Crop-transport stage B: crops_u8 is (PB*N, Hc, Wb) uint8
            grayscale host-warped crops — or (PB*N, Hc, Wb/2) nibble
            pairs when transport_bits=4, (PB*N, Hc, Wb/4) 2-bit quads
            when transport_bits=2 — the device unpacks, broadcasts
            channels, and recognizes each line's valid frames (``widths``
            (PB*N,) int32 crop pixel widths)."""
            if transport_bits == 4:
                crops_u8 = unpack4_expr(crops_u8)
            elif transport_bits == 2:
                crops_u8 = unpack2_expr(crops_u8)
            crops3 = jnp.broadcast_to(
                crops_u8[..., None].astype(jnp.float32),
                crops_u8.shape + (3,),
            )
            # (labels, lengths, confs, logit_vals, logit_idx)
            return stage_b_recognize(crops3, pb, widths)

        def stage_b_strip(strip_u8, offsets, widths, pb: int, rw: int):
            """Width-trimmed crop transport: strip_u8 is the (Wb, Hc)
            width-major strip of concatenated valid crop columns — or
            (Wb, Hc/2) / (Wb, Hc/4) bit-packed along the HEIGHT axis at
            transport_bits 4 / 2 — plus per-line column offsets and
            widths (both (PB*n_slot,) int32).  The device unpacks,
            rebuilds the bucketed crop tensor with one vmapped
            dynamic_slice per line (coarse contiguous blocks, not an
            elementwise gather), masks past-width columns to the same
            zero padding the dense path ships, and recognizes.

            ``rw`` (static) is the REBUILD width — the _rebuild_width
            ladder entry covering the batch's widest crop.  Narrower
            batches rebuild (and recognize) narrower tensors instead of
            always chewing the full crop_bucket of zero tail (measured
            ~4 ms per 8-page bench batch at rw 768 vs 1024)."""
            if transport_bits == 4:
                strip_u8 = unpack4_expr(strip_u8)
            elif transport_bits == 2:
                strip_u8 = unpack2_expr(strip_u8)
            strip = jnp.pad(strip_u8, ((0, rw), (0, 0)))
            gathered = jax.vmap(
                lambda o: jax.lax.dynamic_slice(
                    strip, (o, 0), (rw, crop_h)
                )
            )(offsets)  # (N, rw, Hc)
            col = jnp.arange(rw, dtype=jnp.int32)[None, :, None]
            gathered = jnp.where(
                col < widths[:, None, None], gathered, jnp.uint8(0)
            )
            crops = gathered.transpose(0, 2, 1)  # (N, Hc, rw)
            crops3 = jnp.broadcast_to(
                crops[..., None].astype(jnp.float32), crops.shape + (3,)
            )
            return stage_b_recognize(crops3, pb, widths)

        def stage_b_strip_only(strip_u8, offsets, widths, pb: int, rw: int):
            """Recognize-only program for the re-OCR path (run(...,
            skip_stage_a=True)): the strip is the ONLY upload — no layout
            canvas crosses the link at all."""
            labels, lengths, confs, lvals, lidx = stage_b_strip(
                strip_u8, offsets, widths, pb, rw
            )
            if recognizer_max_label <= 254:
                labels = labels.astype(jnp.uint8)
            return labels, lengths, confs, lvals, lidx

        def combined_strip(small_u8, strip_u8, offsets, widths, pb: int,
                           rw: int):
            """Strip-transport sibling of combined_crops: ONE program
            per batch fusing stage A of batch i with recognition of
            batch i-LAG's trimmed strip."""
            if canvas_bits_resolved == 4:
                small_u8 = unpack4_expr(small_u8)
            elif canvas_bits_resolved == 2:
                small_u8 = unpack2_expr(small_u8)
            packed, heights_q, sep_q = maps_and_pack(
                small_u8.astype(jnp.float32)[..., None]
            )
            labels, lengths, confs, lvals, lidx = stage_b_strip(
                strip_u8, offsets, widths, pb, rw
            )
            if recognizer_max_label <= 254:
                labels = labels.astype(jnp.uint8)
            return packed, heights_q, sep_q, labels, lengths, confs, lvals, lidx

        def combined_crops(small_u8, crops_u8, widths, pb: int):
            """ONE program per batch for the crop transport: stage A of
            batch i (small pages -> packed masks) fused with recognition
            of batch i-1's host-warped crops.  The tunnel then sees a
            single repeated program — no program alternation charge and
            exactly one forced sync per batch (the dominant costs once
            link bytes are minimized; see scripts/microbench_tunnel.py).

            small_u8: (PB, h64, w64) uint8 1/ds pages, or (PB, h64,
            w64/2) nibble-packed when transport_bits<=4 (the layout page
            never drops below 4-bit; only crops do at 2)."""
            if canvas_bits_resolved == 4:
                small_u8 = unpack4_expr(small_u8)
            elif canvas_bits_resolved == 2:
                small_u8 = unpack2_expr(small_u8)
            packed, heights_q, sep_q = maps_and_pack(
                small_u8.astype(jnp.float32)[..., None]
            )
            labels, lengths, confs, lvals, lidx = stage_b_crops(
                crops_u8, widths, pb
            )
            # Label ids fit a byte for small-enough charsets (CTC pad -1
            # -> 255; transformer pads with its EOS id): quarters the
            # label download.
            if recognizer_max_label <= 254:
                labels = labels.astype(jnp.uint8)
            return packed, heights_q, sep_q, labels, lengths, confs, lvals, lidx

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P("dp"))
            stage_a = jax.jit(
                stage_a.__wrapped__, static_argnums=(1,),
                in_shardings=(batch_sh,),
            )
            stage_a_small = jax.jit(
                stage_a_small.__wrapped__, in_shardings=(batch_sh,)
            )
            stage_b_warp = jax.jit(
                stage_b_warp.__wrapped__,
                in_shardings=(batch_sh, batch_sh, batch_sh),
            )
            stage_b_warp_gather = jax.jit(
                stage_b_warp_gather.__wrapped__,
                in_shardings=(batch_sh, batch_sh, batch_sh),
            )
            self._stage_b_crops = jax.jit(
                stage_b_crops, static_argnums=(2,),
                in_shardings=(batch_sh, batch_sh),
            )
            self._combined_crops = jax.jit(
                combined_crops, static_argnums=(3,),
                in_shardings=(batch_sh, batch_sh, batch_sh),
            )
            # Strip transport under the mesh: the strip replicates (its
            # columns belong to lines of different pages); the per-line
            # offset/width vectors shard over dp so the rebuilt crop
            # tensor comes out dp-sharded for the recognizer.
            line_sh = NamedSharding(mesh, P("dp"))
            self._combined_strip = jax.jit(
                combined_strip, static_argnums=(4, 5),
                in_shardings=(
                    batch_sh, NamedSharding(mesh, P()), line_sh, line_sh,
                ),
            )
            self._stage_b_strip = jax.jit(
                stage_b_strip_only, static_argnums=(3, 4),
                in_shardings=(
                    NamedSharding(mesh, P()), line_sh, line_sh,
                ),
            )
        else:
            self._stage_b_crops = jax.jit(
                stage_b_crops, static_argnums=(2,)
            )
            self._combined_crops = jax.jit(
                combined_crops, static_argnums=(3,)
            )
            self._combined_strip = jax.jit(
                combined_strip, static_argnums=(4, 5)
            )
            self._stage_b_strip = jax.jit(
                stage_b_strip_only, static_argnums=(3, 4)
            )

        self._stage_a = stage_a
        self._stage_a_small = stage_a_small
        self._stage_b_warp = stage_b_warp
        self._stage_b_warp_gather = stage_b_warp_gather
        self._stage_b_recognize = jax.jit(
            stage_b_recognize, static_argnums=(1,)
        )

        def stage_b(pages_u8, baselines, heights, structured_ok=True):
            warp = (
                self._stage_b_warp if structured_ok
                else self._stage_b_warp_gather
            )
            crops = warp(pages_u8, baselines, heights)
            return self._stage_b_recognize(crops, baselines.shape[0])

        self._has_confidence = True

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

        @jax.jit
        def unpack2(packed_u8):
            """(PB, H, W/4) 2-bit quads -> (PB, H, W) uint8 (q*85)."""
            pb, h, w4 = packed_u8.shape
            qs = [
                ((packed_u8 >> (2 * i)) & 3) * jnp.uint8(85)
                for i in range(4)
            ]
            return jnp.stack(qs, axis=-1).reshape(pb, h, w4 * 4)

        self._unpack2 = unpack2

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

    # Zero-mean 2x2 Bayer offsets in gray levels for one 85-wide
    # quantization step: ordered dithering keeps the LOCAL MEAN intensity
    # of anti-aliased glyph edges through the 4-level quantizer (what the
    # recognizer's first conv actually integrates), where plain rounding
    # posterizes edges and shifts them by up to half a step.  Dithering
    # is OPT-IN (dither_2bit): it entropy-fills the constant background
    # the transport otherwise compresses, and measured SLOWER than 4-bit
    # on the tunnel despite half the raw bytes.
    _BAYER2 = np.array([[-32, 11], [32, -11]], np.int16)

    @classmethod
    def _pack2(cls, grays: np.ndarray, dither: bool = False) -> np.ndarray:
        """(N, H, W) uint8 -> (N, H, W/4) 2-bit quads (W must be a
        multiple of 4; crop buckets are).  Decode is q*85.  Plain
        rounding by default; ``dither`` applies the Bayer offsets."""
        if dither:
            h, w = grays.shape[1], grays.shape[2]
            offs = cls._BAYER2[
                np.ix_(np.arange(h) & 1, np.arange(w) & 1)
            ]
        else:
            offs = 0
        q = np.clip(
            (grays.astype(np.int16) + 42 + offs) // 85, 0, 3
        ).astype(np.uint8)
        return (
            q[:, :, 0::4]
            | (q[:, :, 1::4] << 2)
            | (q[:, :, 2::4] << 4)
            | (q[:, :, 3::4] << 6)
        )

    @staticmethod
    def _gray(page: np.ndarray) -> np.ndarray:
        """Single-channel uint8 view of a page (pages travel grayscale over
        the host link; the device broadcasts channels)."""
        import cv2

        if page.ndim == 2:
            return page
        return cv2.cvtColor(page, cv2.COLOR_BGR2GRAY)

    def _canvas(self, page: np.ndarray, ds: Optional[int] = None) -> np.ndarray:
        """1/(ds * map_upsample)-res layout canvas for MAP scale ``ds``
        (identical scales when the detector has no SR head)."""
        import cv2

        ds = self.downsample if ds is None else ds
        dc = ds * self.map_upsample
        small = cv2.resize(
            page, (0, 0), fx=1 / dc, fy=1 / dc, interpolation=cv2.INTER_AREA
        )
        h = int(np.ceil(small.shape[0] / 64) * 64)
        w = int(np.ceil(small.shape[1] / 64) * 64)
        canvas = np.zeros((h, w), np.uint8)
        canvas[: small.shape[0], : small.shape[1]] = small
        return canvas

    def _prep_canvas_batch(self, pages, ids, page_batch):
        """Host image work for one crop-transport batch: grayscale +
        1/ds canvas + optional nibble packing, at the sticky adaptive
        scale.  Factored out of :meth:`_run_crops` so :meth:`prime` can
        run the FIRST batch's prep before the loop starts."""
        padded = ids + [ids[-1]] * (page_batch - len(ids))
        grays = self._stack_grays(self._gray(pages[i]) for i in padded)
        ds0 = self._last_ds if self.adaptive_downsample else self.downsample
        small = np.stack([self._canvas(g, ds0) for g in grays])
        return grays, self._pack_canvas(small), ds0

    def prime(self, pages, page_batch: int = 8) -> None:
        """Start batch-0 host prep in a background thread BEFORE
        :meth:`run` is called with the same leading pages.

        In a cold loop, batch 0's grayscale/resize/pack is the one host
        stage nothing overlaps (every later batch preps under the
        previous batch's wire wait).  Callers that know the first pages
        early — the CLI while it is still decoding the REST of the
        image list, a server between requests — prime here and run()
        picks the future up instead of prepping serially.  Only the
        crops transport uses it (the bench/CLI default); other
        transports ignore the primed state.  The primed canvas is built
        at the CURRENT sticky adaptive scale; if adaptation moves
        between prime and run, the second-pass correction handles it
        exactly as it does for any first pass."""
        from concurrent.futures import ThreadPoolExecutor

        if self.transport != "crops":
            return
        first = list(pages[: min(page_batch, len(pages))])
        if not first:
            return
        pool = ThreadPoolExecutor(max_workers=1)
        fut = pool.submit(
            self._prep_canvas_batch, first, list(range(len(first))),
            page_batch,
        )
        pool.shutdown(wait=False)
        self._primed = (first, page_batch, fut)

    def _take_primed(self, pages, page_batch):
        """Return the primed batch-0 prep future if it matches run()'s
        leading pages (by object identity) and batch size; else None."""
        primed = getattr(self, "_primed", None)
        if primed is None:
            return None
        self._primed = None
        first, pb, fut = primed
        n = min(page_batch, len(pages))
        if pb != page_batch or len(first) != n:
            return None
        if any(a is not b for a, b in zip(first, pages[:n])):
            return None
        return fut

    # ------------------------------------------------------------------
    # Adaptive-resolution second pass (reference semantics:
    # torch_parsenet.py:28-35, :60-93 — median detected line height
    # steered into the [9, 15] map-pixel processing band, optimal 12,
    # correction sticky across batches).  The reference adapts with a
    # continuous downsample; here the scale quantizes to an integer
    # ladder so each entry compiles at most one extra program shape.
    ADAPT_MIN_H = 9.0
    ADAPT_MAX_H = 15.0
    ADAPT_OPT_H = 12.0
    ADAPT_PIXEL_THRESHOLD = 100
    ADAPT_DS_LADDER = (1, 2, 3, 4, 6, 8)

    def _adapt_target_ds(self, masks, ds_used: int) -> Optional[int]:
        """Corrected sticky downsample for a batch, or None to keep the
        current scale.  Median is over the whole batch (the reference
        adapts per page; pages within a batch share a dispatch here)."""
        if isinstance(masks, TPUPagePipeline._StageAArtifacts):
            masks = masks.unpacked
        baselines_masks, _, heights_maps, _ = masks
        sel = baselines_masks > 0
        if sel.sum() <= self.ADAPT_PIXEL_THRESHOLD:
            return None
        # heights_maps hold FULL-map-resolution ascender heights in map
        # pixels (channel 0), like the reference's out_map[:, :, 0].
        med = float(np.median(heights_maps[sel][:, 0]))
        return self._adapt_decide(med, ds_used)

    def _adapt_decide(self, med: float, ds_used: int) -> Optional[int]:
        if self.ADAPT_MIN_H <= med <= self.ADAPT_MAX_H:
            return None
        target = ds_used * med / self.ADAPT_OPT_H
        ladder = np.asarray(self.ADAPT_DS_LADDER, float)
        corrected = int(
            ladder[np.argmin(np.abs(ladder - np.clip(target, 1, 8)))]
        )
        self._last_ds = corrected
        ratio = corrected / ds_used
        if 0.8 < ratio < 1.2:
            return None  # close enough; keep this batch's first pass
        return corrected

    # Max deviation (px) of interior baseline points from the chord below
    # which a line counts as straight and takes the affine fast path.
    STRAIGHT_TOL_PX = 0.75

    def _line_affine(self, bl, hh):
        """(2x3 inverse-map matrix, width) for a straight baseline, or
        None for a curved one.  Output column j sits at arc position
        j/scale along the chord, row r at linspace(-asc, desc) along
        the normal — mathematically identical to the measured warp
        field on a straight line."""
        bl = np.asarray(bl, float)
        asc, desc = np.asarray(hh, float) * self.height_scale
        chord = bl[-1] - bl[0]
        clen = float(np.hypot(chord[0], chord[1]))
        hc = self.crop_height
        scale = hc / max(asc + desc, 1e-6)
        if len(bl) > 2 and clen > 1e-6:
            u = chord / clen
            rel = bl - bl[0]
            dev = float(
                np.abs(rel[:, 0] * u[1] - rel[:, 1] * u[0]).max()
            )
        else:
            dev = 0.0
        if dev > self.STRAIGHT_TOL_PX or clen <= 1e-6:
            return None
        w = max(min(int(clen * scale), self.crop_bucket), 1)
        u = chord / clen
        nvec = np.array([-u[1], u[0]])
        dv = (asc + desc) / max(hc - 1, 1)
        p0 = bl[0] + nvec * (-asc)
        m = np.array([
            [u[0] / scale, nvec[0] * dv, p0[0]],
            [u[1] / scale, nvec[1] * dv, p0[1]],
        ])
        return m, w

    def _curved_crop(self, gray: np.ndarray, bl, hh) -> np.ndarray:
        """Measured warp field + cv2.remap for curved baselines (same
        warp math as the stage-by-stage cropper, reference:
        pero_ocr/core/crop_engine.py:54-99)."""
        import cv2

        field = line_geometry.warp_field(
            np.asarray(bl, float),
            np.asarray(hh, float) * self.height_scale, self.crop_height,
        )
        w = min(field.shape[1], self.crop_bucket)
        return cv2.remap(
            gray, field[:, :w, 0], field[:, :w, 1],
            cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
        )

    @staticmethod
    def _native_warp_available() -> bool:
        from pero_ocr_tpu.utils import native as native_lib

        lib = native_lib.get_library()
        return lib is not None and hasattr(lib, "warp_affine_lines_u8")

    def _host_crop_line(self, gray: np.ndarray, bl, hh) -> np.ndarray:
        """Warp ONE line to its (crop_height, w) strip.

        Straight baselines (the vast majority on print pages) take a
        single inverse-affine warp — the native C++ kernel when built
        (native/perotpu.cpp), else ``cv2.warpAffine`` (~60us/line vs
        ~700us for the cubic warp-field build).  Curved lines fall back
        to the measured warp field + ``cv2.remap``."""
        import cv2

        aff = self._line_affine(bl, hh)
        if aff is None:
            return self._curved_crop(gray, bl, hh)
        m, w = aff
        hc = self.crop_height
        if self._native_warp_available():
            from pero_ocr_tpu.utils import native as native_lib

            out = np.zeros((hc, w), np.uint8)
            if native_lib.native_warp_affine_lines(
                gray, m[None], np.asarray([w], np.int32), hc, out,
                np.zeros(1, np.int64), 1, w,
            ):
                return out
        return cv2.warpAffine(
            gray, m, (w, hc),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_CONSTANT,
        )

    def _warp_straight_batch(
        self, gray, entries, out, offsets_elem, stride_col, stride_row
    ):
        """Warp one page's straight lines into a caller-owned buffer:
        ONE native call when the library is built (the page is mapped
        once; VERDICT r2 next-round #9), else per-line cv2 + copy.
        ``entries``: list of (affine matrix, width); ``offsets_elem``:
        element offset of each line's (0, 0) output pixel."""
        if not entries:
            return
        from pero_ocr_tpu.utils import native as native_lib

        mats = np.stack([m for m, _ in entries])
        widths = np.asarray([w for _, w in entries], np.int32)
        if self._native_warp_available() and native_lib.native_warp_affine_lines(
            gray, mats, widths, self.crop_height, out,
            np.asarray(offsets_elem, np.int64), stride_col, stride_row,
        ):
            return
        import cv2

        hc = self.crop_height
        flat = out.reshape(-1)
        for (m, w), off in zip(entries, offsets_elem):
            crop = cv2.warpAffine(
                gray, m, (w, hc),
                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                borderMode=cv2.BORDER_CONSTANT,
            )
            # Strided view over the same addressing the kernel uses.
            view = np.lib.stride_tricks.as_strided(
                flat[off:], shape=(hc, w),
                strides=(stride_row, stride_col),
            )
            view[:] = crop

    def _host_crops(
        self, gray: np.ndarray, b_list, h_list, n_slot: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Dense crop-transport buffer: per-line warps zero-padded into
        (n_slot, Hc, crop_bucket) (the trim_crops=False layout).
        Straight lines batch into one native warp call per page."""
        hc, bucket = self.crop_height, self.crop_bucket
        crops = np.zeros((n_slot, hc, bucket), np.uint8)
        widths = np.zeros(n_slot, np.int32)
        straight, offs = [], []
        for i, (bl, hh) in enumerate(zip(b_list, h_list)):
            aff = self._line_affine(bl, hh)
            if aff is None:
                crop = self._curved_crop(gray, bl, hh)
                w = crop.shape[1]
                crops[i, :, :w] = crop
            else:
                m, w = aff
                straight.append((m, w))
                offs.append(i * hc * bucket)
            widths[i] = w
        self._warp_straight_batch(
            gray, straight, crops, offs, stride_col=1, stride_row=bucket
        )
        return crops, widths

    # Floor (in columns) of the width-trimmed strip's pow2 shape ladder;
    # pow2 quantization bounds distinct compiled shapes to the log of the
    # width range, and the padding columns are zeros the transport
    # compresses.
    STRIP_MIN_COLS = 1024

    def _rebuild_step(self) -> int:
        """Ladder quantum for strip rebuild widths (quarters of
        crop_bucket, floor 256 — at most 4 compiled stage-B variants
        per (pb, n_slot) shape)."""
        return max(256, self.crop_bucket // 4)

    def _rebuild_width(self, widths) -> int:
        """Static strip rebuild width for one batch: the smallest
        ladder entry covering the batch's widest crop.  Exact
        semantics — every shipped column is preserved; narrower
        batches just stop the recognizer from chewing crop_bucket's
        all-zero tail (measured ~4 ms per 8-page bench batch at the
        bench shape, max width 730 -> rw 768 instead of 1024)."""
        step = self._rebuild_step()
        mx = int(widths.max()) if getattr(widths, "size", 0) else 0
        return int(min(self.crop_bucket, max(step, -(-mx // step) * step)))

    def _strip_cols(self, total: int) -> int:
        floor = max(self.STRIP_MIN_COLS, 2 * self.crop_bucket)
        return max(floor, 1 << int(np.ceil(np.log2(max(total, 1)))))

    def _pack_strip(self, strip: np.ndarray) -> np.ndarray:
        """Bit-pack the (W, Hc) strip along the HEIGHT axis (so column
        offsets stay byte-independent of transport_bits)."""
        if self.transport_bits == 4:
            return self._pack4(strip[None])[0]
        if self.transport_bits == 2:
            return self._pack2(strip[None], self.dither_2bit)[0]
        return strip

    def _build_strip(self, grays, page_lines, n_slot: int, page_batch: int):
        """Width-trimmed crop payload for one batch: concatenate every
        line's valid crop columns into one width-major (W, Hc) strip
        (pow2-bucketed W, bit-packed along Hc) plus per-line int32
        offsets/widths.  Straight lines warp DIRECTLY into the strip —
        one native call per page with the page mapped once (the 1-core
        host's hot loop; VERDICT r2 next-round #9).  Returns
        ((strip, offsets, widths) | None, per-page width arrays)."""
        hc = self.crop_height
        n_total = page_batch * n_slot
        offsets = np.zeros(n_total, np.int32)
        widths = np.zeros(n_total, np.int32)
        straight = {}    # slot -> ([(m, w)], [flat index])
        curved = []      # (flat index, (Hc, w) crop)
        total = 0
        widths_all = []
        for slot, (b_list, h_list, *_) in enumerate(page_lines):
            if not b_list:
                widths_all.append(None)
                continue
            for i, (bl, hh) in enumerate(zip(b_list, h_list)):
                j = slot * n_slot + i
                aff = self._line_affine(bl, hh)
                if aff is None:
                    crop = self._curved_crop(grays[slot], bl, hh)
                    w = crop.shape[1]
                    curved.append((j, crop))
                else:
                    m, w = aff
                    straight.setdefault(slot, ([], []))[0].append(aff)
                    straight[slot][1].append(j)
                offsets[j] = total
                widths[j] = w
                total += w
            widths_all.append(
                widths[slot * n_slot : slot * n_slot + len(b_list)].copy()
            )
        if total == 0:
            return None, widths_all
        strip = np.zeros((self._strip_cols(total), hc), np.uint8)
        for slot, (entries, idxs) in straight.items():
            self._warp_straight_batch(
                grays[slot], entries, strip,
                [offsets[j] * hc for j in idxs],
                stride_col=hc, stride_row=1,
            )
        for j, crop in curved:
            strip[offsets[j] : offsets[j] + widths[j]] = crop.T
        return (self._pack_strip(strip), offsets, widths), widths_all

    def _lines_from_masks(
        self, baselines_mask, connected, heights_map, ds: Optional[int] = None
    ) -> Tuple[List[np.ndarray], List[List[float]]]:
        """Host part of the layout parse (same logic as
        LayoutEngine.parse, cnn_engine.py).  ``ds`` is the scale the
        masks were produced at (the adaptive pass can change it per
        batch)."""
        from pero_ocr_tpu.ops.morphology import connected_components

        ds = self.downsample if ds is None else ds
        labels_img, num = connected_components(connected)
        labels_img = labels_img * baselines_mask

        b_list, h_list = [], []
        if num > 0:
            # One C++ pass over the label image replaces the
            # per-component python loop (unique-x/linspace/percentile —
            # ~10ms per 4-page batch of the single host core).
            from pero_ocr_tpu.utils import native as native_lib

            out = native_lib.native_cc_baselines(
                labels_img, heights_map, num
            )
            if out is not None:
                pts, npts, hts, valid = out
                for c in range(num):
                    if not valid[c]:
                        continue
                    b_list.append(ds * pts[c, : npts[c]].copy())
                    h_list.append(
                        [ds * float(hts[c, 0]), ds * float(hts[c, 1])]
                    )
                return b_list, h_list
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
        lines_override=None,
        page_batch: int = 4,
        skip_stage_a: bool = False,
    ) -> Iterator[PageResult]:
        """Process a stream of pages with one-batch lookahead overlap.

        Pages are grouped `page_batch` at a time into single stage-A /
        stage-B dispatches — program switches and transfers amortize over
        the batch (the tunnel charges ~70ms per program alternation).
        All pages within one `run` call must share a shape.

        ``lines_override`` replaces the CNN line detection (classical-
        layout configs, XML re-OCR, benchmarks): either a callable
        ``page -> (baselines, heights)`` or a sequence aligned with
        ``pages`` of ``(baselines, heights)`` pairs.  Stage A still runs
        to include its cost — unless ``skip_stage_a=True`` (crops
        transport + override only), the re-OCR mode where no layout
        stage exists: the line crops become the ONLY upload and the
        recognize-only program dispatches (reference analog: input-XML
        resume with RUN_LAYOUT_PARSER off,
        user_scripts/parse_folder.py:165-168)."""
        pages = list(pages)
        if not pages:
            return
        if lines_override is not None and not callable(lines_override):
            seq = list(lines_override)
            if len(seq) != len(pages):
                raise ValueError(
                    f"lines_override sequence length {len(seq)} != "
                    f"number of pages {len(pages)}"
                )
            # _batch_lines resolves sequence overrides by absolute page
            # index (repeated page objects stay unambiguous).
            def lines_override(page, _seq=seq):  # pragma: no cover
                raise RuntimeError("sequence override is index-resolved")

            lines_override._by_index = seq
        if skip_stage_a and (
            self.transport != "crops" or lines_override is None
        ):
            raise ValueError(
                "skip_stage_a requires transport='crops' and a "
                "lines_override (there is no other line source)"
            )
        if self.transport == "crops":
            if lines_override is not None:
                # Config-provided geometry: stage A's masks are never
                # consumed, which unlocks a loop with no mask download,
                # no crop lag, and no flush dispatches (see
                # _run_crops_override).
                yield from self._run_crops_override(
                    pages, lines_override, page_batch, skip_stage_a
                )
            else:
                yield from self._run_crops(pages, lines_override, page_batch)
        else:
            yield from self._run_page(pages, lines_override, page_batch)

    # ------------------------------------------------------------------
    # Weather-independent instrumentation (crops transport).  The tunnel
    # this chip sits behind swings ~3x in throughput run to run, so an
    # end-to-end pages/s capture alone cannot distinguish a regression
    # from bad link weather.  These two probes factor the loop:
    #   measure_device_ms      — pure device compute per batch, measured
    #                            with K chained dispatches per forced
    #                            fetch ((t_K - t_1)/(K-1), the CLAUDE.md
    #                            protocol; a single dispatch+fetch would
    #                            measure the ~26ms RTT instead);
    #   measure_transport_floor — the link time to move exactly this
    #                            pipeline's per-batch bytes through a
    #                            trivial device program (no model
    #                            compute).  End-to-end throughput ~= the
    #                            floor means the link is saturated and
    #                            device compute is fully hidden.
    def _one_batch_payload(self, pages, lines_override, page_batch,
                           ds=None):
        """Build batch 0's REAL device payloads (small pages + crop
        payload) exactly as _run_crops ships them.  ``ds`` pins the
        canvas scale (honest-loop probes pass the sticky adapted
        downsample; None = the configured first-pass scale)."""
        if self.transport != "crops":
            raise ValueError("instrumentation requires transport='crops'")
        ids = list(range(min(page_batch, len(pages))))
        padded = ids + [ids[-1]] * (page_batch - len(ids))
        grays = self._stack_grays(self._gray(pages[i]) for i in padded)
        small = np.stack([self._canvas(g, ds) for g in grays])
        small = self._pack_canvas(small)
        small_dev = jnp.asarray(small)
        if lines_override is None:
            # stage_a_small consumes the UNPACKED canvas (the combined
            # programs unpack inside; the standalone one does not).
            sd = self._unpack_canvas_dev(small_dev)
            masks = self._unpack_stage_a(
                *[np.asarray(o) for o in self._stage_a_small(sd)]
            )
        else:
            masks = None
        page_lines, max_n, n_slot = self._batch_lines(
            pages, ids, lines_override, masks, ds
        )
        if self.trim_crops:
            payload, _ = self._build_strip(
                grays, page_lines, n_slot, page_batch
            )
            if payload is None:
                payload = (
                    np.zeros(
                        (self._strip_cols(0), self.crop_height
                         // {8: 1, 4: 2, 2: 4}[self.transport_bits]),
                        np.uint8,
                    ),
                    np.zeros(page_batch * self.line_slot, np.int32),
                    np.zeros(page_batch * self.line_slot, np.int32),
                )
        else:
            crop_stack = np.zeros(
                (page_batch, n_slot, self.crop_height, self.crop_bucket),
                np.uint8,
            )
            widths_flat = np.zeros(page_batch * n_slot, np.int32)
            for slot, (b_list, h_list, *_) in enumerate(page_lines):
                if b_list:
                    crop_stack[slot], w = self._host_crops(
                        grays[slot], b_list, h_list, n_slot
                    )
                    widths_flat[
                        slot * n_slot : slot * n_slot + len(b_list)
                    ] = w[: len(b_list)]
            flat = crop_stack.reshape(
                page_batch * n_slot, self.crop_height, self.crop_bucket
            )
            if self.transport_bits == 4:
                flat = self._pack4(flat)
            elif self.transport_bits == 2:
                flat = self._pack2(flat, self.dither_2bit)
            payload = (flat, widths_flat)
        return small, payload

    def _combined_dispatch_once(self, small_dev, payload_dev, page_batch,
                                rw=None):
        if self.trim_crops:
            strip_dev, offs_dev, wid_dev = payload_dev
            if rw is None:
                rw = self._rebuild_width(np.asarray(wid_dev))
            return self._combined_strip(
                small_dev, strip_dev, offs_dev, wid_dev, page_batch, rw
            )
        return self._combined_crops(
            small_dev, payload_dev[0], payload_dev[1], page_batch
        )

    def measure_device_ms(
        self, pages, lines_override=None, page_batch: int = 4,
        k: int = 8, reps: int = 3, ds=None,
    ) -> float:
        """Device compute of the combined per-batch program in ms/batch,
        link-weather independent: payloads upload ONCE, then K chained
        dispatches share a single forced fetch; (t_K - t_1)/(K - 1)
        cancels both the RTT and the upload.  Dispatches on this chip
        execute in order on one stream, so the chain needs no explicit
        data dependency."""
        import time

        small, payload = self._one_batch_payload(
            pages, lines_override, page_batch, ds
        )
        small_dev = jnp.asarray(small)
        payload_dev = tuple(jnp.asarray(p) for p in payload)

        def chain(kk):
            t0 = time.perf_counter()
            for _ in range(kk):
                outs = self._combined_dispatch_once(
                    small_dev, payload_dev, page_batch
                )
            np.asarray(outs[3])  # labels: force completion of the chain
            return time.perf_counter() - t0

        chain(1)  # compile + warm
        best = None
        for _ in range(reps):
            t1 = chain(1)
            tk = chain(k)
            per = (tk - t1) / (k - 1)
            best = per if best is None else min(best, per)
        return best * 1000.0

    def measure_transport_floor(
        self, pages, lines_override=None, page_batch: int = 4,
        reps: int = 6, mask_downloads: bool = True, ds=None,
    ) -> float:
        """Pages/s ceiling set by the link alone: move exactly this
        pipeline's per-batch bytes (real payloads up, arrays with the
        combined program's output shapes down) through a trivial device
        program and time upload+dispatch+fetch.  No model compute — if
        end-to-end throughput matches this, the tunnel is saturated.

        ``mask_downloads=False`` models the lines-override loop
        (_run_crops_override), which never fetches stage A's three mask
        outputs — only labels/lengths/confidences come down."""
        import time

        small, payload = self._one_batch_payload(
            pages, lines_override, page_batch, ds
        )
        # Real output shapes/dtypes from one true combined dispatch.
        outs = self._combined_dispatch_once(
            jnp.asarray(small), tuple(jnp.asarray(p) for p in payload),
            page_batch,
        )
        if not mask_downloads:
            outs = outs[3:]
        shapes = [
            (o.shape, o.dtype) for o in outs if o is not None
        ]

        @jax.jit
        def move(small_u8, *crop_payload):
            # Touch every uploaded byte (cheap reduction), then emit the
            # exact download footprint.
            s = small_u8.astype(jnp.int32).sum()
            for p in crop_payload:
                s = s + p.astype(jnp.int32).sum()
            return tuple(
                jnp.full(sh, s.astype(jnp.int32) & 0, dt)
                + jnp.zeros((), dt)
                for sh, dt in shapes
            )

        def once():
            outs = move(jnp.asarray(small),
                        *[jnp.asarray(p) for p in payload])
            for o in outs:
                np.asarray(o)

        once()  # compile + warm
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return page_batch / best

    # Must match _postprocess_maps' vertical_connection_range (the
    # device no longer ships the dilated mask; see maps_and_pack).
    VERTICAL_CONNECTION_RANGE = 5

    class _StageAArtifacts:
        """Lazy view over one batch's fetched stage-A transport
        (packed 1-bit masks + pooled heights/sep).  The native CC path
        consumes the PACKED arrays directly (cc_lines_packed: ~1.2 ms
        per ds-2 page vs ~18 for unpack + cv2.dilate + scipy.label +
        extraction); full unpacking happens only on the fallback."""

        __slots__ = ("packed", "heights_q", "sep_q", "_pipe",
                     "_unpacked", "_sep_pooled")

        def __init__(self, packed, heights_q, sep_q, pipe):
            self.packed = packed
            self.heights_q = heights_q
            self.sep_q = sep_q
            self._pipe = pipe
            self._unpacked = None
            self._sep_pooled = None

        @property
        def unpacked(self):
            if self._unpacked is None:
                self._unpacked = self._pipe._unpack_stage_a(
                    self.packed, self.heights_q, self.sep_q
                )
            return self._unpacked

        @property
        def sep_pooled(self):
            """(floats at POOLED res, pool factor): the clustering
            penalties index this directly (separator_penalties_f32
            pool arg) — byte-exact vs sampling the repeat-upsampled
            map, without the 36MB/batch materialization."""
            if self._sep_pooled is None:
                sep_nib = np.stack(
                    [self.sep_q >> 4, self.sep_q & 0xF], axis=-1
                ).reshape(self.sep_q.shape[0], self.sep_q.shape[1],
                          self.sep_q.shape[2] * 2)
                pooled = sep_nib.astype(np.float32) / 15.0
                self._sep_pooled = (
                    pooled, self.packed.shape[1] // pooled.shape[1]
                )
            return self._sep_pooled

    def _lines_from_packed(self, packed_page, heights_q_page, ds):
        """Native fast path of :meth:`_lines_from_masks` operating on
        the PACKED transport of one page.  Returns (b_list, h_list,
        n_px, hist0) or None when the native kernel is unavailable."""
        from pero_ocr_tpu.utils import native as native_lib

        ds = self.downsample if ds is None else ds
        out = native_lib.native_cc_lines_packed(
            packed_page, heights_q_page,
            packed_page.shape[0] // heights_q_page.shape[0],
        )
        if out is None:
            return None
        pts, npts, hts, n, n_px, hist0 = out
        b_list, h_list = [], []
        for c in range(n):
            b_list.append(ds * pts[c, : npts[c]].copy())
            h_list.append([ds * float(hts[c, 0]), ds * float(hts[c, 1])])
        return b_list, h_list, n_px, hist0

    def _adapt_artifacts(self, arts, ds_used: int) -> Optional[int]:
        """Adaptation decision straight from the packed transport: the
        native kernel's per-page histograms aggregate to the exact
        batch median :meth:`_adapt_target_ds` computes from the
        unpacked maps.  Falls back to unpacking when native is out."""
        from pero_ocr_tpu.utils import native as native_lib

        total = 0
        hist = np.zeros(256, np.int64)
        for slot in range(arts.packed.shape[0]):
            out = native_lib.native_cc_lines_packed(
                arts.packed[slot], arts.heights_q[slot],
                arts.packed.shape[1] // arts.heights_q.shape[1],
            )
            if out is None:
                return self._adapt_target_ds(arts.unpacked, ds_used)
            total += out[4]
            hist += out[5]
        return self._adapt_from_stats(total, hist, ds_used)

    def _adapt_from_stats(self, total_px: int, hist0, ds_used: int):
        """The :meth:`_adapt_target_ds` band decision from the native
        kernel's batch-aggregated statistics: exact numpy-median of the
        channel-0 height map over set bits (values are q/4, constant
        within each pool cell, so the histogram of q is lossless)."""
        if total_px <= self.ADAPT_PIXEL_THRESHOLD:
            return None
        cum = np.cumsum(hist0)
        n = int(cum[-1])
        mid_hi = int(np.searchsorted(cum, n // 2 + 1))
        if n % 2 == 1:
            med_q = float(mid_hi)
        else:
            mid_lo = int(np.searchsorted(cum, n // 2))
            med_q = 0.5 * (mid_lo + mid_hi)
        return self._adapt_decide(med_q / 4.0, ds_used)

    def _pack_canvas(self, small: np.ndarray) -> np.ndarray:
        """Pack the 1/ds layout canvas at canvas_bits (crop transport;
        plain rounding at 2 — the canvas is detection input, dithering
        would entropy-fill the background the transport compresses)."""
        if self.canvas_bits == 4:
            return self._pack4(small)
        if self.canvas_bits == 2:
            return self._pack2(small)
        return small

    def _unpack_canvas_dev(self, small_dev):
        """Device-side inverse of _pack_canvas (for the standalone
        stage-A program, which consumes the UNPACKED canvas)."""
        if self.canvas_bits == 4:
            return self._unpack4(small_dev)
        if self.canvas_bits == 2:
            return self._unpack2(small_dev)
        return small_dev

    @staticmethod
    def _stack_grays(grays) -> np.ndarray:
        """Stack per-page grayscale images, zero-padding each to the
        batch's max dims rounded up to 64 (real folders mix page
        sizes; the reference processes per page and never notices,
        page_parser.py:457-531).  Baseline coordinates live in each
        page's own frame, so padding beyond a page's bounds changes
        neither the geometry nor the crops (off-page warp samples were
        already zeros); the 64-rounding keeps the compiled canvas
        shapes bucketed."""
        grays = list(grays)
        if len({g.shape for g in grays}) == 1:
            return np.stack(grays)
        h = int(np.ceil(max(g.shape[0] for g in grays) / 64) * 64)
        w = int(np.ceil(max(g.shape[1] for g in grays) / 64) * 64)
        out = np.zeros((len(grays), h, w), np.uint8)
        for i, g in enumerate(grays):
            out[i, : g.shape[0], : g.shape[1]] = g
        return out

    def _unpack_stage_a(self, packed, heights_q, sep_q):
        """Host side of the stage-A artifact transport: 8x 1-bit
        baseline pixels per byte -> mask, with the `connected` (5,3)
        dilation replayed here via cv2.dilate (byte-exact vs the
        device reduce_window it replaces — both are max filters with
        zero borders); pooled heights/separator upsampled back to map
        resolution (pool factors inferred from the shape ratio — large
        canvases ship coarser pools, maps_and_pack)."""
        import cv2

        bits = np.stack(
            [(packed >> i) & 1 for i in range(8)], axis=-1
        ).reshape(packed.shape[0], packed.shape[1], packed.shape[2] * 8)
        baselines_masks = bits
        kernel = np.ones(
            (self.VERTICAL_CONNECTION_RANGE, 3), np.uint8
        )
        connecteds = np.stack(
            [cv2.dilate(m, kernel) for m in baselines_masks]
        )
        hf = packed.shape[1] // heights_q.shape[1]
        heights_maps = (
            heights_q.astype(np.float32) / 4.0
        ).repeat(hf, axis=1).repeat(hf, axis=2)
        sf = packed.shape[1] // sep_q.shape[1]
        sep_nib = np.stack(
            [sep_q >> 4, sep_q & 0xF], axis=-1
        ).reshape(sep_q.shape[0], sep_q.shape[1], sep_q.shape[2] * 2)
        sep_maps = (
            sep_nib.astype(np.float32) / 15.0
        ).repeat(sf, axis=1).repeat(sf, axis=2)
        return baselines_masks, connecteds, heights_maps, sep_maps

    def _batch_lines(self, pages, ids, lines_override, masks, ds=None):
        """Per-page line sets for one batch + the padded slot count.

        The line axis pads to the densest page in the batch, rounded up
        to a line_slot multiple (bounds distinct stage-B compile shapes;
        no line is ever dropped).  Each page entry is
        (b_list, h_list, clusters): paragraph ids from the reference's
        separator-penalty clustering over the transported separator map
        (None when clustering is off)."""
        arts = (
            masks if isinstance(masks, TPUPagePipeline._StageAArtifacts)
            else None
        )
        sep_pool = 1
        if arts is not None:
            baselines_masks = connecteds = heights_maps = None
            if self.cluster_paragraphs:
                sep_maps, sep_pool = arts.sep_pooled
            else:
                sep_maps = None
        else:
            baselines_masks, connecteds, heights_maps, sep_maps = (
                masks if masks is not None else (None, None, None, None)
            )
        page_lines = []
        for slot, i in enumerate(ids):
            if lines_override is not None:
                by_index = getattr(lines_override, "_by_index", None)
                if by_index is not None:
                    b_list, h_list = by_index[i]
                else:
                    b_list, h_list = lines_override(pages[i])
            elif arts is not None:
                with stage_timer("pipeline/cc_parse"):
                    got = self._lines_from_packed(
                        arts.packed[slot], arts.heights_q[slot], ds
                    )
                if got is None:
                    # Native kernel unavailable: fall back to the
                    # unpacked python path for the rest of the batch.
                    baselines_masks, connecteds, heights_maps, sep_maps = (
                        arts.unpacked
                    )
                    arts = None
                    sep_pool = 1
                    b_list, h_list = self._lines_from_masks(
                        baselines_masks[slot], connecteds[slot],
                        heights_maps[slot], ds,
                    )
                else:
                    b_list, h_list = got[0], got[1]
            else:
                b_list, h_list = self._lines_from_masks(
                    baselines_masks[slot], connecteds[slot],
                    heights_maps[slot], ds,
                )
            if self.max_lines is not None:
                b_list = b_list[: self.max_lines]
                h_list = h_list[: self.max_lines]
            # Paragraph clustering belongs to the CNN layout parse; a
            # classical lines_override matches the reference configs
            # that carry no separator clustering (and on a 1-core host
            # every worker millisecond competes with the main thread).
            clusters, t_list = (
                self._cluster_lines(
                    b_list, h_list,
                    sep_maps[slot] if sep_maps is not None else None, ds,
                    sep_pool,
                )
                if lines_override is None else (None, None)
            )
            page_lines.append((b_list, h_list, clusters, t_list))
        max_n = max(len(b) for b, _, _, _ in page_lines)
        n_slot = max(
            self.line_slot,
            int(np.ceil(max_n / self.line_slot)) * self.line_slot,
        )
        return page_lines, max_n, n_slot

    def _cluster_lines(self, b_list, h_list, sep_map, ds=None, sep_pool=1):
        """Paragraph ids via the layout engine's separator-penalty
        clustering (reference: cnn_layout_engine.py:330-372), running in
        the host worker thread on the transported separator map
        (``sep_pool`` > 1: sep_map stays at the pooled transport
        resolution and the penalties index it directly).  Returns
        (clusters, textline outlines) — the outlines ride along on
        PageResult so layout assembly never recomputes them."""
        if not self.cluster_paragraphs or len(b_list) == 0:
            return None, None
        from pero_ocr_tpu.layout_engines import helpers

        with stage_timer("pipeline/textlines"):
            t_list = helpers.baselines_to_textlines(b_list, h_list)
        with stage_timer("pipeline/make_clusters"):
            clusters = self._clusterer.make_clusters(
                [np.asarray(b) for b in b_list], h_list, t_list, sep_map,
                self.downsample if ds is None else ds, sep_pool=sep_pool,
            )
        return list(np.asarray(clusters).tolist()), t_list

    def _drain(self, entry, stage_timer):
        (ids_, geoms_, labels_dev, lengths_dev, confs_dev,
         lvals_dev, lidx_dev) = entry
        if labels_dev is None:
            labels = lengths = confs = lvals = lidx = None
        else:
            with stage_timer("pipeline/labels_sync"):
                labels = np.asarray(labels_dev)
                lengths = np.asarray(lengths_dev)
                confs = (
                    np.asarray(confs_dev)
                    if confs_dev is not None and self._has_confidence
                    else None
                )
                lvals = (
                    np.asarray(lvals_dev) if lvals_dev is not None else None
                )
                lidx = (
                    np.asarray(lidx_dev) if lidx_dev is not None else None
                )
        for slot, (i, (b_list, h_list, widths, clusters, tlines)) in (
            enumerate(zip(ids_, geoms_))
        ):
            if widths is None or labels is None:
                yield PageResult(
                    i, b_list, h_list, None, None, None, clusters,
                    textlines=tlines,
                )
            else:
                yield PageResult(
                    i, b_list, h_list, labels[slot], lengths[slot], widths,
                    clusters,
                    confs[slot] if confs is not None else None,
                    lvals[slot] if lvals is not None else None,
                    lidx[slot] if lidx is not None else None,
                    textlines=tlines,
                )

    def _run_page(self, pages, lines_override, page_batch):
        """Page transport: whole pages upload once, crops warp on device."""
        from concurrent.futures import ThreadPoolExecutor

        from pero_ocr_tpu.utils.timing import stage_timer

        n = len(pages)
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
            grays = self._stack_grays(self._gray(pages[i]) for i in padded)
            if self.transport_bits == 4:
                stack = self._unpack4(jnp.asarray(self._pack4(grays)))
            else:
                stack = jnp.asarray(grays)
            device_pages[batch_idx] = stack
            # Sticky adaptive scale: the first pass runs at the scale
            # the last correction settled on (reference last_downsample).
            ds0 = self._last_ds if self.adaptive_downsample else self.downsample
            stage_a_out[batch_idx] = (self._stage_a(stack, ds0), ds0)

        # Uploads block on the host link, so the NEXT batch's upload +
        # stage-A dispatch run on a worker thread while this thread syncs
        # and post-processes the current batch.
        uploader = ThreadPoolExecutor(max_workers=1)
        pending = uploader.submit(dispatch_a, 0)

        # Stage-B fetches trail one batch behind their dispatch: batch
        # i-1's labels download while batch i dispatches and batch i+1's
        # stage A is in flight.
        inflight = None  # (ids, geoms, labels/lengths/confs/lvals/lidx dev)

        for batch_idx, ids in enumerate(batches):
            with stage_timer("pipeline/upload+dispatch_a"):
                pending.result()
            if batch_idx + 1 < len(batches):
                pending = uploader.submit(dispatch_a, batch_idx + 1)

            with stage_timer("pipeline/stage_a_sync"):
                outs_a, ds_used = stage_a_out[batch_idx]
                packed, heights_q, sep_q = jax.tree_util.tree_map(
                    np.asarray, outs_a
                )
            masks = self._unpack_stage_a(packed, heights_q, sep_q)
            if self.adaptive_downsample and lines_override is None:
                ds2 = self._adapt_target_ds(masks, ds_used)
                if ds2 is not None:
                    # Second pass at the corrected scale: the pages are
                    # already on device, so this is one extra dispatch +
                    # mask fetch, no re-upload (reference:
                    # torch_parsenet.py:88-93).
                    with stage_timer("pipeline/stage_a_second_pass"):
                        masks = self._unpack_stage_a(
                            *jax.tree_util.tree_map(
                                np.asarray,
                                self._stage_a(device_pages[batch_idx], ds2),
                            )
                        )
                    ds_used = ds2
            with stage_timer("pipeline/host_geometry"):
                page_lines, max_n, n_slot = self._batch_lines(
                    pages, ids, lines_override, masks, ds_used,
                )

            labels_dev = lengths_dev = confs_dev = None
            lvals_dev = lidx_dev = None
            if max_n == 0:
                geoms = [(b, h, None, c, t) for b, h, c, t in page_lines]
            else:
                geom3 = [
                    self._geometry(b, h, n_slot) for b, h, _, _ in page_lines
                ]
                with stage_timer("pipeline/stage_b"):
                    zeros_b = np.zeros(
                        (n_slot, self.BASELINE_POINTS, 2), np.float32
                    )
                    ones_h = np.ones((n_slot, 2), np.float32)
                    bl = np.stack(
                        [g[0] if g[0] is not None else zeros_b for g in geom3]
                        + [zeros_b] * (page_batch - len(ids))
                    )
                    hh = np.stack(
                        [g[1] if g[1] is not None else ones_h for g in geom3]
                        + [ones_h] * (page_batch - len(ids))
                    )
                    # Strong tilt or oversize spans would distort through
                    # the structured warp's roll budget; such batches take
                    # the exact gather-warp program instead.
                    from pero_ocr_tpu.ops.warp_structured import (
                        structured_warp_supported,
                    )

                    flat = bl.reshape(-1, self.BASELINE_POINTS, 2)
                    structured_ok = bool(
                        structured_warp_supported(
                            hh.reshape(-1, 2), self.crop_height, flat
                        ).all()
                    )
                    (labels_dev, lengths_dev, confs_dev, lvals_dev,
                     lidx_dev) = self._stage_b(
                        device_pages[batch_idx],
                        jnp.asarray(bl), jnp.asarray(hh),
                        structured_ok=structured_ok,
                    )
                geoms = [
                    (b, h, g[2], c, t)
                    for (b, h, c, t), g in zip(page_lines, geom3)
                ]

            device_pages.pop(batch_idx, None)
            stage_a_out.pop(batch_idx, None)

            if inflight is not None:
                yield from self._drain(inflight, stage_timer)
            inflight = (ids, geoms, labels_dev, lengths_dev, confs_dev,
                        lvals_dev, lidx_dev)

        if inflight is not None:
            yield from self._drain(inflight, stage_timer)

    def _run_crops(self, pages, lines_override, page_batch):
        """Crop transport: ONE combined program per batch (stage A of
        batch i + recognition of batch i-LAG's host-warped crops), so the
        high-RTT link sees a single repeated program and one forced sync
        per batch.  Crops TRAIL the dispatch by LAG=2 batches so the
        host geometry parse + cv2 warp of batch i run in a worker thread
        OVERLAPPED with batch i+1's entire upload/dispatch/sync — this
        tunnel serializes device compute with transfers, so every
        millisecond of host work off the critical path is a millisecond
        of link time saved.  LAG flush dispatches (zero small pages)
        recognize the final batches' crops."""
        from concurrent.futures import ThreadPoolExecutor

        from pero_ocr_tpu.utils.timing import stage_timer

        n = len(pages)
        batches = [
            list(range(s, min(s + page_batch, n)))
            for s in range(0, n, page_batch)
        ]
        n_batches = len(batches)
        lag = min(self.crop_lag, 2 if n_batches > 1 else 1)

        def prep(batch_idx):
            """Host image work for one batch (worker thread): grayscale
            + 1/ds canvas + optional nibble packing.  The canvas scale is
            the sticky adaptive downsample (reference last_downsample)."""
            return self._prep_canvas_batch(pages, batches[batch_idx],
                                           page_batch)

        def geometry_and_warp(bi, grays, masks, ds_used):
            """Worker-thread job: CC line parse + host crop warp + pack
            for one batch.  Returns (ids, geoms, payload|None, n_slot);
            the payload is the packed dense buffer (trim_crops=False) or
            a (strip, offsets, widths) triple (trim_crops=True)."""
            ids = batches[bi]
            with stage_timer("pipeline/host_geometry"):
                page_lines, max_n, n_slot = self._batch_lines(
                    pages, ids, lines_override, masks, ds_used
                )
            if self.trim_crops:
                with stage_timer("pipeline/host_warp"):
                    payload, widths_all = self._build_strip(
                        grays, page_lines, n_slot, page_batch
                    )
                geoms = [
                    (b, h, w, c, t)
                    for (b, h, c, t), w in zip(page_lines, widths_all)
                ]
                return ids, geoms, payload, n_slot
            with stage_timer("pipeline/host_warp"):
                crop_stack = np.zeros(
                    (page_batch, n_slot, self.crop_height,
                     self.crop_bucket),
                    np.uint8,
                )
                widths_flat = np.zeros(page_batch * n_slot, np.int32)
                widths_all = []
                for slot, (b_list, h_list, *_) in enumerate(page_lines):
                    if b_list:
                        crop_stack[slot], w = self._host_crops(
                            grays[slot], b_list, h_list, n_slot
                        )
                        widths_all.append(w[: len(b_list)])
                        widths_flat[
                            slot * n_slot : slot * n_slot + len(b_list)
                        ] = w[: len(b_list)]
                    else:
                        widths_all.append(None)
            geoms = [
                (b, h, w, c, t)
                for (b, h, c, t), w in zip(page_lines, widths_all)
            ]
            if max_n == 0:
                return ids, geoms, None, n_slot
            flat = crop_stack.reshape(
                page_batch * n_slot, self.crop_height, self.crop_bucket
            )
            if self.transport_bits in (2, 4):
                with stage_timer("pipeline/pack_crops"):
                    flat = (
                        self._pack4(flat) if self.transport_bits == 4
                        else self._pack2(flat, self.dither_2bit)
                    )
            return ids, geoms, (flat, widths_flat), n_slot

        uploader = ThreadPoolExecutor(max_workers=1)
        warper = ThreadPoolExecutor(max_workers=1)
        prep_f = self._take_primed(pages, page_batch)
        if prep_f is None:
            prep_f = uploader.submit(prep, 0)

        small_shape = None
        warp_futures = {}   # bi -> Future[(ids, geoms, crops|None, n_slot)]
        dispatched = {}     # bi -> (ids, geoms, has_labels)

        pack_div = {8: 1, 4: 2, 2: 4}[self.transport_bits]
        wb = self.crop_bucket // pack_div

        for bi in range(n_batches + lag):
            if bi < n_batches:
                with stage_timer("pipeline/prep"):
                    grays, small, ds_used = prep_f.result()
                if bi + 1 < n_batches:
                    prep_f = uploader.submit(prep, bi + 1)
                small_dev = jnp.asarray(small)
                small_shape = small.shape
            else:
                # Flush dispatch: recognize trailing crops; the zero
                # small pages' masks are discarded.
                small_dev = jnp.zeros(small_shape, jnp.uint8)

            rec_bi = bi - lag
            fut = warp_futures.pop(rec_bi, None)
            if fut is not None:
                with stage_timer("pipeline/warp_wait"):
                    rec_ids, rec_geoms, rec_payload, _ = fut.result()
                dispatched[rec_bi] = (rec_ids, rec_geoms,
                                      rec_payload is not None)
            else:
                rec_payload = None

            if self.trim_crops:
                hc_packed = self.crop_height // pack_div
                if rec_payload is None:
                    strip_dev = jnp.zeros(
                        (self._strip_cols(0), hc_packed), jnp.uint8
                    )
                    offs_dev = jnp.zeros(
                        (page_batch * self.line_slot,), jnp.int32
                    )
                    wid_dev = offs_dev
                else:
                    strip, offs, wid = rec_payload
                    strip_dev = jnp.asarray(strip)
                    offs_dev = jnp.asarray(offs)
                    wid_dev = jnp.asarray(wid)
                rw = (
                    self._rebuild_width(rec_payload[2])
                    if rec_payload is not None else self._rebuild_step()
                )
                with stage_timer("pipeline/combined_dispatch"):
                    (packed_m, heights_q, sep_q, labels_dev, lengths_dev,
                     confs_dev, lvals_dev, lidx_dev) = self._combined_strip(
                        small_dev, strip_dev, offs_dev, wid_dev, page_batch,
                        rw,
                    )
            else:
                if rec_payload is None:
                    crops_dev = jnp.zeros(
                        (page_batch * self.line_slot, self.crop_height, wb),
                        jnp.uint8,
                    )
                    wid_dev = jnp.zeros(
                        (page_batch * self.line_slot,), jnp.int32
                    )
                else:
                    crops_dev = jnp.asarray(rec_payload[0])
                    wid_dev = jnp.asarray(rec_payload[1])

                with stage_timer("pipeline/combined_dispatch"):
                    (packed_m, heights_q, sep_q, labels_dev, lengths_dev,
                     confs_dev, lvals_dev, lidx_dev) = (
                        self._combined_crops(
                            small_dev, crops_dev, wid_dev, page_batch
                        )
                    )

            # ONE forced-fetch round per dispatch: batch bi's masks and
            # batch bi-lag's labels arrive together (a second fetch
            # would pay the link RTT again).
            entry = dispatched.pop(rec_bi, None)
            need_labels = entry is not None and entry[2]
            with stage_timer("pipeline/sync"):
                fetch = (
                    [packed_m, heights_q, sep_q] if bi < n_batches else []
                )
                if need_labels:
                    fetch += [labels_dev, lengths_dev, confs_dev]
                    if self.want_logits:
                        fetch += [lvals_dev, lidx_dev]
                fetched = [np.asarray(x) for x in fetch]
            lvals_np = lidx_np = None
            if need_labels and self.want_logits:
                labels_np, lengths_np, confs_np, lvals_np, lidx_np = (
                    fetched[-5:]
                )
            elif need_labels:
                labels_np, lengths_np, confs_np = fetched[-3:]
            else:
                labels_np = lengths_np = confs_np = None

            if bi < n_batches:
                # Lazy artifacts: the native CC path consumes the
                # PACKED transport directly; unpacking happens only on
                # the python fallback.
                masks = self._StageAArtifacts(
                    fetched[0], fetched[1], fetched[2], self
                )
                if self.adaptive_downsample and lines_override is None:
                    ds2 = self._adapt_artifacts(masks, ds_used)
                    if ds2 is not None:
                        # Second pass at the corrected scale: re-resize
                        # on host (the full page never crossed the link
                        # in crop transport) and run the standalone
                        # stage-A program on the corrected canvas.
                        with stage_timer("pipeline/stage_a_second_pass"):
                            small2 = np.stack(
                                [self._canvas(g, ds2) for g in grays]
                            )
                            # Quantize-roundtrip so the second pass
                            # sees the same canvas a first pass would.
                            small2 = self._unpack_canvas_dev(
                                jnp.asarray(self._pack_canvas(small2))
                            )
                            masks = self._StageAArtifacts(
                                *jax.tree_util.tree_map(
                                    np.asarray,
                                    self._stage_a_small(small2),
                                ),
                                self,
                            )
                        ds_used = ds2
                warp_futures[bi] = warper.submit(
                    geometry_and_warp, bi, grays, masks, ds_used
                )

            if entry is not None:
                yield from self._drain(
                    (entry[0], entry[1], labels_np, lengths_np, confs_np,
                     lvals_np, lidx_np),
                    stage_timer,
                )

    def _run_crops_override(self, pages, lines_override, page_batch,
                            skip_stage_a=False):
        """Crop transport when line geometry is config-provided (classical
        layout engines, ``--input-xml-path`` re-OCR resume, benchmark
        overrides): the host geometry does NOT depend on stage A's masks,
        which removes every round the mask dependency forced on the
        ``_run_crops`` loop —

        - stage A still executes on device (cost parity with CNN
          configs) but its outputs are never fetched: the masks' download
          bytes and their share of the sync round disappear;
        - no crop LAG and no flush dispatches: each batch's own crops ride
          its own combined dispatch, so a 16-page stream at page_batch 8
          is TWO link rounds instead of four (the tunnel charges a fixed
          ~26-240ms per round depending on weather);
        - label fetches trail their dispatch by ``inflight`` batches, so
          a fetch's round trip queues behind the NEXT batches' uploads
          instead of leaving the wire idle.

        Host prep (gray/canvas/pack) + geometry + warp chain in one
        worker thread, two batches ahead of the wire."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from pero_ocr_tpu.utils.timing import stage_timer

        n = len(pages)
        batches = [
            list(range(s, min(s + page_batch, n)))
            for s in range(0, n, page_batch)
        ]
        n_batches = len(batches)
        pack_div = {8: 1, 4: 2, 2: 4}[self.transport_bits]

        def prep_and_warp(bi):
            ids = batches[bi]
            padded = ids + [ids[-1]] * (page_batch - len(ids))
            # skip_stage_a never stacks the grays (no canvas upload), so
            # the re-OCR shape accepts mixed page sizes in one stream.
            grays = [self._gray(pages[i]) for i in padded]
            ds0 = (
                self._last_ds if self.adaptive_downsample
                else self.downsample
            )
            if skip_stage_a:
                small = None
            else:
                grays = self._stack_grays(grays)
                small = np.stack([self._canvas(g, ds0) for g in grays])
                small = self._pack_canvas(small)
            with stage_timer("pipeline/host_geometry"):
                page_lines, max_n, n_slot = self._batch_lines(
                    pages, ids, lines_override, None, ds0
                )
            with stage_timer("pipeline/host_warp"):
                if self.trim_crops:
                    payload, widths_all = self._build_strip(
                        grays, page_lines, n_slot, page_batch
                    )
                elif max_n == 0:
                    payload, widths_all = None, [None] * len(page_lines)
                else:
                    crop_stack = np.zeros(
                        (page_batch, n_slot, self.crop_height,
                         self.crop_bucket),
                        np.uint8,
                    )
                    widths_flat = np.zeros(page_batch * n_slot, np.int32)
                    widths_all = []
                    for slot, (b_list, h_list, *_) in enumerate(page_lines):
                        if b_list:
                            crop_stack[slot], w = self._host_crops(
                                grays[slot], b_list, h_list, n_slot
                            )
                            widths_all.append(w[: len(b_list)])
                            widths_flat[
                                slot * n_slot : slot * n_slot + len(b_list)
                            ] = w[: len(b_list)]
                        else:
                            widths_all.append(None)
                    flat = crop_stack.reshape(
                        page_batch * n_slot, self.crop_height,
                        self.crop_bucket,
                    )
                    if self.transport_bits in (2, 4):
                        flat = (
                            self._pack4(flat) if self.transport_bits == 4
                            else self._pack2(flat, self.dither_2bit)
                        )
                    payload = (flat, widths_flat)
            geoms = [
                (b, h, w, c, t)
                for (b, h, c, t), w in zip(page_lines, widths_all)
            ]
            return ids, geoms, small, payload

        worker = ThreadPoolExecutor(max_workers=1)
        futs = {
            bi: worker.submit(prep_and_warp, bi)
            for bi in range(min(2, n_batches))
        }

        inflight = deque()  # (ids, geoms, labels/lengths/confs/lvals/lidx)
        for bi in range(n_batches):
            with stage_timer("pipeline/prep"):
                ids, geoms, small, payload = futs.pop(bi).result()
            if bi + 2 < n_batches:
                futs[bi + 2] = worker.submit(prep_and_warp, bi + 2)

            if payload is None:
                # Nothing to recognize in this batch: skip the dispatch
                # entirely and yield geometry-only results.
                inflight.append((ids, geoms, None, None, None, None, None))
            elif skip_stage_a:
                if not self.trim_crops:
                    raise ValueError(
                        "skip_stage_a currently requires trim_crops "
                        "(the strip payload)"
                    )
                strip, offs, wid = payload
                with stage_timer("pipeline/combined_dispatch"):
                    outs = self._stage_b_strip(
                        jnp.asarray(strip), jnp.asarray(offs),
                        jnp.asarray(wid), page_batch,
                        self._rebuild_width(wid),
                    )
                inflight.append((ids, geoms) + tuple(outs))
            else:
                small_dev = jnp.asarray(small)
                with stage_timer("pipeline/combined_dispatch"):
                    if self.trim_crops:
                        strip, offs, wid = payload
                        outs = self._combined_strip(
                            small_dev, jnp.asarray(strip),
                            jnp.asarray(offs), jnp.asarray(wid),
                            page_batch, self._rebuild_width(wid),
                        )
                    else:
                        outs = self._combined_crops(
                            small_dev, jnp.asarray(payload[0]),
                            jnp.asarray(payload[1]), page_batch,
                        )
                # outs[0:3] are stage A's masks — deliberately never
                # fetched (nobody consumes them on this path).
                inflight.append((ids, geoms) + tuple(outs[3:]))
            while len(inflight) > self.override_inflight:
                yield from self._drain(inflight.popleft(), stage_timer)

        while inflight:
            yield from self._drain(inflight.popleft(), stage_timer)
