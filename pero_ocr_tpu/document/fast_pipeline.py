"""Fast-path adapter: drive the device-resident page pipeline from the
document layer and emit PageLayout results.

Connects :class:`pero_ocr_tpu.parallel.pipeline.TPUPagePipeline` (the
throughput-optimized serving path: single grayscale upload, fused map
postprocessing, structured warp, batched recognition) to the standard
``PageLayout`` outputs, so ``parse_folder.py --fast-pipeline`` can use
it for CNN-layout + CTC configs.

Works with CNN-layout + CTC configs, native transformer configs, AND
converted reference transformer checkpoints (both AR greedy decodes run
on device inside stage B as one lax.scan).

Differences from the stage-by-stage PageParser path:
- labels decode on device; logits are only materialized on request
  (``want_logits=True`` downloads top-k sparse logits per line and
  rebuilds the reference's csc record — unlocking logits pickles, forced
  alignment, and ALTO at fast-path throughput), and line crops only with
  ``want_crops=True`` (host re-warp);
- the ParseNet adaptive-resolution second pass follows the config's
  ADAPTIVE_DOWNSAMPLE (sticky per-batch correction, integer scale
  ladder — see TPUPagePipeline);
- LAYOUT_CNN options the fast path does not implement
  (MULTI_ORIENTATION, MERGE_LINES, ADJUST_HEIGHTS/BASELINES,
  DETECT_STRAIGHT_LINES_IN_REGIONS), extra layout stages (LINE_FILTER,
  postprocessing, sorters), and RUN_DECODER are REJECTED loudly:
  :func:`FastPagePipeline.unsupported_features` lists them and
  parse_folder falls back to the stage-by-stage path.

Paragraph clustering IS preserved: the reference's separator-penalty
clustering runs in the pipeline's host worker thread on a transported
half-res separator map, and lines group into one region per cluster
(alpha-shape region outlines, same helper as the engine).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Tuple

import numpy as np

from pero_ocr_tpu.core import geometry
from pero_ocr_tpu.core.layout import PageLayout, RegionLayout, TextLine
from pero_ocr_tpu.layout_engines import helpers


def assemble_page_layout(result, page_id, page_size, characters,
                         n_emit=None, line_hook=None):
    """Build the full PageLayout for one :class:`PageResult`: TextLines
    (outline polygons, transcriptions, confidences) grouped into one
    region per paragraph cluster with alpha-shape region outlines — the
    shared consumer behind :meth:`FastPagePipeline.process_pages` and
    the benchmark's full-semantics loop (BASELINE.json config-2:
    detection + recognition + layout assembly, reference shape
    pero_ocr/document_ocr/page_parser.py:515-531 ->
    user_scripts/parse_folder.py:175).

    ``line_hook(line, i)`` runs after each line's standard fields are
    set (crop/logits attachment for the document layer)."""
    h, w = page_size
    layout = PageLayout(id=page_id, page_size=page_size)
    n_emit = len(characters) if n_emit is None else n_emit

    # The pipeline's host worker already built the outlines for
    # paragraph clustering; reuse them (batched rebuild otherwise).
    textlines = result.textlines
    if textlines is None and result.baselines:
        textlines = helpers.baselines_to_textlines(
            result.baselines, result.heights
        )

    lines = []
    for i, (baseline, heights) in enumerate(
        zip(result.baselines, result.heights)
    ):
        line = TextLine(
            index=i,
            baseline=np.asarray(baseline),
            heights=list(heights),
            polygon=textlines[i],
        )
        if result.labels is not None and i < result.labels.shape[0]:
            n = int(result.label_lengths[i])
            lab = result.labels[i, :n]
            lab = lab[(lab >= 0) & (lab < n_emit)]
            line.transcription = "".join(
                map(characters.__getitem__, lab.tolist())
            )
            if result.confidences is not None:
                line.transcription_confidence = float(
                    result.confidences[i]
                )
        else:
            line.transcription = ""
        if line_hook is not None:
            line_hook(line, i)
        lines.append(line)

    # One region per paragraph cluster (the reference's
    # separator-penalty clustering runs in the pipeline's host
    # worker); whole-page fallback when clustering is off.
    clusters = result.clusters
    if clusters is None:
        clusters = [0] * len(lines)
    n_regions = (max(clusters) + 1) if clusters else 1
    for r in range(n_regions):
        members = [ln for ln, c in zip(lines, clusters) if c == r]
        if not members and n_regions > 1:
            continue
        if members:
            try:
                # Same alpha-shape outline + Douglas-Peucker simplify
                # the stage-by-stage engine uses (reference:
                # cnn_layout_engine.py:301-328 simplify tolerance 5).
                poly = helpers.region_from_textlines(
                    [ln.polygon for ln in members]
                )
                poly = geometry.simplify_polygon(poly, 5)
                if len(poly) < 3:
                    raise ValueError("degenerate region")
            except Exception:
                pts = np.concatenate([ln.polygon for ln in members])
                x0, y0 = pts.min(axis=0)
                x1, y1 = pts.max(axis=0)
                poly = np.asarray(
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
                )
        else:
            poly = np.asarray([[0, 0], [w, 0], [w, h], [0, h]])
        region = RegionLayout(f"r{r + 1}", poly)
        for j, ln in enumerate(members):
            ln.id = f"r{r + 1}-l{j + 1:03d}"
            region.lines.append(ln)
        layout.regions.append(region)
    return layout


class FastPagePipeline:
    """Build from an existing PageParser's engines."""

    @staticmethod
    def unsupported_features(page_parser):
        """Config features the fast path would silently change the
        semantics of — the caller must fall back to the stage-by-stage
        path (or drop the feature) when this is non-empty.  Every
        LAYOUT_CNN option is either honored by the device pipeline or
        listed here (reference option set:
        pero_ocr/document_ocr/page_parser.py:237-298)."""
        from pero_ocr_tpu.document.page_parser import LayoutExtractor

        reasons = []
        extractor = None
        for lp in page_parser.layout_parsers:
            if isinstance(lp, LayoutExtractor) and extractor is None:
                extractor = lp
            elif not isinstance(lp, LayoutExtractor):
                reasons.append(
                    f"extra layout stage {type(lp).__name__}"
                )
        if extractor is not None:
            for flag, name in (
                (extractor.multi_orientation, "MULTI_ORIENTATION"),
                (extractor.merge_lines, "MERGE_LINES"),
                (extractor.adjust_heights, "ADJUST_HEIGHTS"),
                (extractor.adjust_baselines, "ADJUST_BASELINES"),
                (extractor.detect_straight_lines_in_regions,
                 "DETECT_STRAIGHT_LINES_IN_REGIONS"),
            ):
                if flag:
                    reasons.append(name)
            if not extractor.detect_regions or not extractor.detect_lines:
                reasons.append("DETECT_REGIONS/DETECT_LINES disabled")
        if page_parser.decoder is not None:
            reasons.append("RUN_DECODER (beam/LM decoding stage)")
        if page_parser.filter_confident_lines_threshold > 0:
            reasons.append("FILTER_CONFIDENT_LINES_THRESHOLD")
        return reasons

    def __init__(self, page_parser, page_batch: int = 4, max_lines=None,
                 line_slot: int = 32, crop_bucket: int = 2048, mesh=None,
                 transport_bits: int = 4, transport: str = "page",
                 want_logits: bool = False, want_crops: bool = False,
                 logits_topk: int = 8, reocr: bool = False,
                 canvas_bits=None):
        """``reocr=True`` builds the recognize-only variant for re-OCR of
        existing layouts (``--input-xml-path`` with no layout stages in
        the config, reference: user_scripts/parse_folder.py:165-168): no
        ParseNet is loaded, the line crops are the only device upload
        (crops transport, skip_stage_a), and ``process_pages`` must be
        given ``input_layouts``."""
        from pero_ocr_tpu.document.page_parser import LayoutExtractor
        from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

        extractor = next(
            (
                lp for lp in page_parser.layout_parsers
                if isinstance(lp, LayoutExtractor)
            ),
            None,
        )
        if reocr:
            if extractor is not None or page_parser.layout_parsers:
                raise ValueError(
                    "re-OCR fast mode takes the layout from the input "
                    "XML; remove layout stages from the config (the "
                    "stage-by-stage path honors them)"
                )
            transport = "crops"
        elif extractor is None:
            raise ValueError(
                "--fast-pipeline needs a LAYOUT_CNN stage in the config"
            )
        self.reocr = reocr
        if page_parser.ocr is None:
            raise ValueError(
                "--fast-pipeline needs an [OCR] engine in the config"
            )
        ocr_engine = page_parser.ocr.ocr_engine
        self.characters = list(ocr_engine.characters)
        # Converted reference transformer checkpoints append two special
        # symbols (U+200B boundary + ignore) that must not reach the
        # transcription text (reference:
        # pero_ocr/ocr_engine/transformer_ocr_engine.py:94-105).
        self._n_emit = (
            len(self.characters) - 2
            if getattr(ocr_engine, "_ref_mode", False)
            else len(self.characters)
        )
        cropper = page_parser.line_cropper.crop_engine
        self.line_scale = cropper.scale
        self.page_batch = page_batch
        self.want_logits = want_logits
        self.want_crops = want_crops
        # Frame subsampling for fast-path logit_coords: crops sit at
        # column 0 (no 32px margin), so coords are [0, w // subsampling]
        # (stage-by-stage analog: ocr/line_ocr_engine.py:222-227).
        self.net_subsampling = int(getattr(ocr_engine, "net_subsampling", 4))

        if reocr:
            self.pipeline = TPUPagePipeline(
                None, None,
                ocr_engine.model,
                ocr_engine.variables,
                crop_height=cropper.line_height,
                crop_bucket=crop_bucket,
                max_lines=max_lines,
                line_slot=line_slot,
                height_scale=cropper.scale,
                mesh=mesh,
                transport_bits=transport_bits,
                transport=transport,
                canvas_bits=canvas_bits,
                cluster_paragraphs=False,
                want_logits=want_logits,
                logits_topk=logits_topk,
            )
        else:
            parsenet_wrapper = extractor.engine.parsenet
            self.pipeline = TPUPagePipeline(
                parsenet_wrapper.model,
                parsenet_wrapper.variables,
                ocr_engine.model,
                ocr_engine.variables,
                downsample=int(parsenet_wrapper.init_downsample),
                detection_threshold=extractor.engine.line_detection_threshold,
                line_end_weight=extractor.engine.line_end_weight,
                crop_height=cropper.line_height,
                crop_bucket=crop_bucket,
                max_lines=max_lines,
                line_slot=line_slot,
                height_scale=cropper.scale,
                mesh=mesh,
                transport_bits=transport_bits,
                transport=transport,
                canvas_bits=canvas_bits,
                want_logits=want_logits,
                logits_topk=logits_topk,
                adaptive_downsample=bool(
                    getattr(parsenet_wrapper, "adaptive_downsample", False)
                ),
            )

    def _attach_logits(self, line, result, i):
        """Rebuild the reference's sparse logits record from the
        downloaded top-k: a (T, C) float32 csc_matrix plus charset and
        fast-path logit_coords (crops sit at column 0, so the valid span
        is [0, width // subsampling]; stage-by-stage analog:
        ocr/line_ocr_engine.py:222-227)."""
        from scipy import sparse

        vals = result.logits_vals[i].astype(np.float32)  # (T, K)
        idx = result.logits_idx[i].astype(np.int64)
        t, k = vals.shape
        c = len(self.characters)
        rows = np.repeat(np.arange(t), k)
        line.logits = sparse.coo_matrix(
            (vals.ravel(), (rows, idx.ravel())), shape=(t, c)
        ).tocsc()
        line.characters = list(self.characters)
        w = (
            int(result.crops_width[i])
            if result.crops_width is not None else 0
        )
        line.logit_coords = [0, min(t, w // self.net_subsampling)]

    def _attach_line_result(self, line, result, i, gray):
        """Write one recognized line's outputs onto a TextLine (shared
        by the detection and re-OCR paths)."""
        if gray is not None:
            crop = self.pipeline._host_crop_line(
                gray, np.asarray(line.baseline, float), line.heights
            )
            line.crop = np.repeat(crop[:, :, None], 3, axis=2)
        if result.labels is not None and i < result.labels.shape[0]:
            n = int(result.label_lengths[i])
            line.transcription = "".join(
                self.characters[c]
                for c in result.labels[i, :n]
                if 0 <= c < self._n_emit
            )
            if result.logits_vals is not None:
                self._attach_logits(line, result, i)
            if result.confidences is not None:
                line.transcription_confidence = float(
                    result.confidences[i]
                )
        else:
            line.transcription = ""

    def process_existing_layouts(
        self,
        pages: Iterable[np.ndarray],
        layouts: Iterable[PageLayout],
    ) -> Iterator[PageLayout]:
        """Re-OCR: recognize every line of pre-existing layouts (input
        Page XML) at fast-path throughput and return the SAME layouts
        with transcriptions/confidences (and logits/crops on request)
        updated in place.  Region structure, reading order, and line ids
        are preserved; the line crops are the only device upload
        (recognize-only dispatch, mixed page sizes accepted).

        Reference shape: parse_folder with --input-xml-path and layout
        stages off (user_scripts/parse_folder.py:165-168) — there the
        cropper + OCR still run per page on host; here they run batched
        on device."""
        pages = list(pages)
        layouts = list(layouts)
        if len(pages) != len(layouts):
            raise ValueError("pages and layouts must align")
        line_objs = [list(lay.lines_iterator()) for lay in layouts]
        seq = [
            (
                [np.asarray(ln.baseline, float) for ln in lines],
                [list(ln.heights) for ln in lines],
            )
            for lines in line_objs
        ]
        for result in self.pipeline.run(
            pages, lines_override=seq, page_batch=self.page_batch,
            skip_stage_a=self.reocr,
        ):
            lines = line_objs[result.page_index]
            gray = (
                self.pipeline._gray(pages[result.page_index])
                if self.want_crops and lines else None
            )
            for i, line in enumerate(lines):
                self._attach_line_result(line, result, i, gray)
            yield layouts[result.page_index]

    def _consume_result(self, result, pages, page_ids) -> PageLayout:
        """Assemble one PageResult into a PageLayout (runs on the
        single consumer worker of :meth:`process_pages`)."""
        page = pages[result.page_index]
        gray = self.pipeline._gray(page) if self.want_crops else None

        def line_hook(line, i):
            # Crop warp (3-channel for the crop-output/LMDB
            # writers) + optional sparse logits; transcription and
            # confidence come from the shared assembler.
            if gray is not None:
                crop = self.pipeline._host_crop_line(
                    gray, np.asarray(line.baseline, float),
                    line.heights,
                )
                line.crop = np.repeat(crop[:, :, None], 3, axis=2)
            if (
                result.logits_vals is not None
                and result.labels is not None
                and i < result.labels.shape[0]
            ):
                self._attach_logits(line, result, i)

        return assemble_page_layout(
            result,
            page_ids[result.page_index],
            (page.shape[0], page.shape[1]),
            self.characters,
            n_emit=self._n_emit,
            line_hook=line_hook,
        )

    def prime(self, first_pages) -> None:
        """Start the first batch's host prep (grayscale/canvas/pack) in
        the background; call as soon as the leading ``page_batch``
        images are decoded, while the caller is still loading the rest.
        :meth:`process_pages` must then be called with a page list whose
        leading elements are these same arrays."""
        self.pipeline.prime(first_pages, self.page_batch)

    def process_pages(
        self, pages: Iterable[np.ndarray], page_ids: List[str]
    ) -> Iterator[PageLayout]:
        """Stream assembled PageLayouts in page order.

        PageLayout assembly + outline geometry run in ONE worker thread
        overlapped with the pipeline's wire waits (the tunnel fetch
        releases the GIL during its RTT stalls); consuming inline
        between pipeline yields instead displaces the prep/warp worker
        overlap on the 1-core host and was measured ~15% slower
        (scripts/exp_consume_ab.py mode D vs B).  A bounded pending
        window keeps the stream lazy (memory stays O(page_batch)), so
        the CLI's disk writes also overlap the next batch's wire time.
        This is the exact consumer shape bench.timed_run_full times."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pages = list(pages)
        window = max(2 * self.page_batch, 4)
        pending = deque()
        with ThreadPoolExecutor(max_workers=1) as pool:
            for result in self.pipeline.run(
                pages, page_batch=self.page_batch
            ):
                pending.append(
                    pool.submit(self._consume_result, result, pages,
                                page_ids)
                )
                while len(pending) > window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
