"""Per-region line postprocessing: baseline stretching, resampling,
heights-from-region (reference:
pero_ocr/layout_engines/line_postprocessing_engine.py:6-96).
"""

from __future__ import annotations

import logging
from typing import List, Union

import numpy as np

from pero_ocr_tpu.core import geometry
from pero_ocr_tpu.layout_engines import helpers

logger = logging.getLogger(__name__)


class PostprocessingEngine:
    def __init__(self, stretch_lines, resample_lines: bool, heights_from_regions: bool):
        self.stretch_lines = stretch_lines  # 'max' | int px
        self.resample_lines = resample_lines
        self.heights_from_regions = heights_from_regions

    def postprocess(self, region):
        if not region.lines:
            return region
        redo_textlines = False
        if self.stretch_lines == "max" or (
            isinstance(self.stretch_lines, int) and self.stretch_lines > 0
        ):
            self.stretch_baselines(region)
            redo_textlines = True
        if self.resample_lines:
            self.resample_baselines(region)
            redo_textlines = True
        if self.heights_from_regions:
            self.get_heights_from_regions(region)
            redo_textlines = True

        if redo_textlines:
            for line in region.lines:
                line.polygon = helpers.baseline_to_textline(
                    line.baseline, line.heights
                )
        return region

    def stretch_baselines(self, region) -> None:
        """Extend baselines either by a fixed pixel amount or out to the
        region boundary ('max'), in deskewed coordinates
        (reference: line_postprocessing_engine.py:32-71)."""
        baselines = [line.baseline for line in region.lines]
        rotation = helpers.get_rotation(baselines)
        baselines = [
            helpers.rotate_coords(b, rotation, (0, 0)) for b in baselines
        ]

        stretched: List[np.ndarray] = []
        if self.stretch_lines == "max":
            region_poly = helpers.rotate_coords(
                np.asarray(region.polygon, dtype=float), rotation, (0, 0)
            )
            x_lo = region_poly[:, 0].min() - 10
            x_hi = region_poly[:, 0].max() + 10
            for baseline in baselines:
                fit = np.poly1d(np.polyfit(baseline[:, 0], baseline[:, 1], 1))
                cuts = geometry.segment_polygon_intersections(
                    [x_lo, fit(x_lo)], [x_hi, fit(x_hi)], region_poly
                )
                if len(cuts) >= 2:
                    left = cuts[np.argmin(cuts[:, 0])]
                    right = cuts[np.argmax(cuts[:, 0])]
                    stretched.append(
                        np.concatenate(
                            [left[None, :], baseline, right[None, :]], axis=0
                        )
                    )
                else:
                    stretched.append(baseline)
        else:
            for baseline in baselines:
                first = baseline[:1].copy()
                first[0, 0] -= self.stretch_lines
                last = baseline[-1:].copy()
                last[0, 0] += self.stretch_lines
                stretched.append(np.concatenate([first, baseline, last], axis=0))

        stretched = [
            helpers.rotate_coords(b, -rotation, (0, 0)) for b in stretched
        ]
        for line, baseline in zip(region.lines, stretched):
            line.baseline = baseline

    def resample_baselines(self, region) -> None:
        resampled = helpers.resample_baselines(
            [line.baseline for line in region.lines]
        )
        for line, baseline in zip(region.lines, resampled):
            line.baseline = baseline

    def get_heights_from_regions(self, region) -> None:
        """Keep only the dominant line and size it to the region's vertical
        extent (reference: line_postprocessing_engine.py:77-96)."""
        polygon = np.asarray(region.polygon)
        scores = []
        height_pairs = []
        for line in region.lines:
            baseline = np.asarray(line.baseline)
            asc = int(round(baseline[:, 1].min() - polygon[:, 1].min()))
            desc = int(round(polygon[:, 1].max() - baseline[:, 1].max()))
            height_pairs.append((asc, desc))
            scores.append(
                baseline[:, 0].max() - baseline[:, 0].min() + asc
            )
        best = int(np.argmax(np.asarray(scores)))
        region.lines = [region.lines[best]]
        region.lines[0].heights = list(height_pairs[best])
