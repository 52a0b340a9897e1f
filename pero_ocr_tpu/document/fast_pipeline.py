"""Fast-path adapter: drive the device-resident page pipeline from the
document layer and emit PageLayout results.

Connects :class:`pero_ocr_tpu.parallel.pipeline.TPUPagePipeline` (the
throughput-optimized serving path: single grayscale upload, fused map
postprocessing, structured warp, batched recognition) to the standard
``PageLayout`` outputs, so ``parse_folder.py --fast-pipeline`` can use
it for CNN-layout + CTC configs.

Works with CNN-layout + CTC configs AND native transformer configs (the
AR greedy decode runs on device inside stage B).

Differences from the stage-by-stage PageParser path:
- line crops and logits are not materialized (labels decode on device) —
  crop/logit outputs are unavailable in fast mode;
- the ParseNet adaptive-resolution second pass is skipped (fixed
  downsample).

Paragraph clustering IS preserved: the reference's separator-penalty
clustering runs in the pipeline's host worker thread on a transported
half-res separator map, and lines group into one region per cluster
(alpha-shape region outlines, same helper as the engine).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Tuple

import numpy as np

from pero_ocr_tpu.core.layout import PageLayout, RegionLayout, TextLine
from pero_ocr_tpu.layout_engines import helpers


class FastPagePipeline:
    """Build from an existing PageParser's engines."""

    def __init__(self, page_parser, page_batch: int = 4, max_lines=None,
                 line_slot: int = 32, crop_bucket: int = 2048, mesh=None,
                 transport_bits: int = 4, transport: str = "page"):
        from pero_ocr_tpu.document.page_parser import LayoutExtractor
        from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

        extractor = next(
            (
                lp for lp in page_parser.layout_parsers
                if isinstance(lp, LayoutExtractor)
            ),
            None,
        )
        if extractor is None:
            raise ValueError(
                "--fast-pipeline needs a LAYOUT_CNN stage in the config"
            )
        if page_parser.ocr is None:
            raise ValueError(
                "--fast-pipeline needs an [OCR] engine in the config"
            )
        if getattr(page_parser.ocr.ocr_engine, "_ref_mode", False):
            raise ValueError(
                "--fast-pipeline does not support converted reference "
                "transformer checkpoints yet (use the stage-by-stage "
                "path); native CTC and transformer engines both work."
            )

        ocr_engine = page_parser.ocr.ocr_engine
        self.characters = list(ocr_engine.characters)
        cropper = page_parser.line_cropper.crop_engine
        self.line_scale = cropper.scale
        self.page_batch = page_batch

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
        )

    def process_pages(
        self, pages: Iterable[np.ndarray], page_ids: List[str]
    ) -> Iterator[PageLayout]:
        pages = list(pages)
        for result in self.pipeline.run(pages, page_batch=self.page_batch):
            page = pages[result.page_index]
            layout = PageLayout(
                id=page_ids[result.page_index],
                page_size=(page.shape[0], page.shape[1]),
            )
            h, w = page.shape[:2]

            lines = []
            for i, (baseline, heights) in enumerate(
                zip(result.baselines, result.heights)
            ):
                line = TextLine(
                    index=i,
                    baseline=np.asarray(baseline),
                    heights=list(heights),
                    polygon=helpers.baseline_to_textline(
                        np.asarray(baseline), heights
                    ),
                )
                if result.labels is not None and i < result.labels.shape[0]:
                    n = int(result.label_lengths[i])
                    line.transcription = "".join(
                        self.characters[c]
                        for c in result.labels[i, :n]
                        if 0 <= c < len(self.characters)
                    )
                    if result.confidences is not None:
                        # Computed on device: worst-run greedy
                        # probability for CTC (the reference's get_prob
                        # measure), min chosen-token probability for the
                        # transformer — lands in Page XML as the line
                        # conf attribute.
                        line.transcription_confidence = float(
                            result.confidences[i]
                        )
                else:
                    line.transcription = ""
                lines.append(line)

            # One region per paragraph cluster (the reference's
            # separator-penalty clustering runs in the pipeline's host
            # worker); whole-page fallback when clustering is off.
            clusters = result.clusters
            if clusters is None:
                clusters = [0] * len(lines)
            n_regions = (max(clusters) + 1) if clusters else 1
            for r in range(n_regions):
                members = [
                    ln for ln, c in zip(lines, clusters) if c == r
                ]
                if not members and n_regions > 1:
                    continue
                if members:
                    try:
                        # Same alpha-shape outline the stage-by-stage
                        # engine uses (helpers.region_from_textlines).
                        poly = helpers.region_from_textlines(
                            [ln.polygon for ln in members]
                        )
                        if len(poly) < 3:
                            raise ValueError("degenerate region")
                    except Exception:
                        pts = np.concatenate(
                            [ln.polygon for ln in members]
                        )
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
            yield layout
