"""Recursive XY-cut reading order ("smart" sorter).

Capability-equivalent to the reference
(reference: pero_ocr/layout_engines/smart_sorter.py:73-303): deskew the
page by the median line tilt, recursively partition regions into groups
that overlap along alternating axes (a group "couples" when the mutual
projection overlap exceeds ``intersect_param`` of both extents), order
groups along the cut axis, and fall back to sorting by the axis with the
larger spread when a group cannot be split either way.

The implementation is a plain recursive function over index groups and
interval arrays rather than the reference's object graph.
"""

from __future__ import annotations

import math
from typing import List, Optional

import cv2
import numpy as np

from pero_ocr_tpu.core.layout import PageLayout


def _projection_overlap(lo, hi, other_lo, other_hi) -> float:
    """Absolute overlap of two intervals (0 when disjoint)."""
    return max(0.0, min(hi, other_hi) - max(lo, other_lo))


def _groups_couple(
    bounds_a: np.ndarray, bounds_b: np.ndarray, axis: int, intersect_param: float
) -> bool:
    """Do two groups' bounding boxes overlap enough along `axis`?

    Mirrors the reference's mutual-fraction test
    (reference: smart_sorter.py:44-59): the overlap must exceed
    `intersect_param` of BOTH extents."""
    lo_a, hi_a = bounds_a[axis], bounds_a[axis + 2]
    lo_b, hi_b = bounds_b[axis], bounds_b[axis + 2]
    if lo_a > hi_b or lo_b > hi_a:
        return False
    overlap = min(abs(lo_a - hi_b), abs(lo_b - hi_a))
    ext_a = max(hi_a - lo_a, 1e-6)
    ext_b = max(hi_b - lo_b, 1e-6)
    return overlap / ext_a > intersect_param and overlap / ext_b > intersect_param


def _group_bounds(bounds: np.ndarray, members: List[int]) -> np.ndarray:
    sel = bounds[members]
    return np.asarray(
        [sel[:, 0].min(), sel[:, 1].min(), sel[:, 2].max(), sel[:, 3].max()]
    )


def _order_recursive(
    bounds: np.ndarray,
    members: List[int],
    vertical: bool,
    intersect_param: float,
    stuck: bool = False,
) -> List[int]:
    """Returns `members` in reading order.

    `vertical=True` means we are grouping along x (columns side by side);
    `vertical=False` groups along y (rows above each other)."""
    if len(members) <= 1:
        return members

    axis = 0 if vertical else 1

    # Union-find style agglomeration of members whose projections couple.
    groups: List[List[int]] = []
    group_bounds: List[np.ndarray] = []
    remaining = list(members)
    while remaining:
        seed = remaining.pop(0)
        group = [seed]
        gb = bounds[seed].copy()
        changed = True
        while changed:
            changed = False
            for i, m in enumerate(remaining):
                if _groups_couple(gb, bounds[m], axis, intersect_param):
                    group.append(remaining.pop(i))
                    gb = _group_bounds(bounds, group)
                    changed = True
                    break
        groups.append(group)
        group_bounds.append(gb)

    if len(groups) == 1:
        if stuck:
            # Plan B (reference decouple, smart_sorter.py:224-256): sort by
            # the axis with the larger spread of minima.
            sel = bounds[members]
            x_spread = np.abs(np.diff(np.sort(sel[:, 0]))).sum()
            y_spread = np.abs(np.diff(np.sort(sel[:, 1]))).sum()
            key_axis = 0 if x_spread > y_spread else 1
            return sorted(members, key=lambda i: bounds[i][key_axis])
        return _order_recursive(
            bounds, members, not vertical, intersect_param, stuck=True
        )

    # Order groups along the cut axis; recurse into each with flipped axis.
    sort_key = 0 if vertical else 1
    order = sorted(range(len(groups)), key=lambda g: group_bounds[g][sort_key])
    out: List[int] = []
    for g in order:
        out.extend(
            _order_recursive(
                bounds, groups[g], not vertical, intersect_param, stuck=False
            )
        )
    return out


class SmartRegionSorter:
    def __init__(self, config=None, config_path: str = ""):
        if config is not None and hasattr(config, "getfloat"):
            self.intersect_param = config.getfloat(
                "FakeIntersectionParameter", fallback=0.1
            )
        else:
            self.intersect_param = 0.1

    def process_page(self, image, page_layout: PageLayout) -> PageLayout:
        if len(page_layout.regions) < 2:
            return page_layout

        reference_region = max(page_layout.regions, key=lambda r: len(r.lines))
        rotation = self.get_rotation(reference_region.lines)
        self.rotate_page_layout(page_layout, -rotation)

        bounds = np.asarray(
            [
                [
                    np.asarray(r.polygon)[:, 0].min(),
                    np.asarray(r.polygon)[:, 1].min(),
                    np.asarray(r.polygon)[:, 0].max(),
                    np.asarray(r.polygon)[:, 1].max(),
                ]
                for r in page_layout.regions
            ],
            dtype=float,
        )
        order = _order_recursive(
            bounds, list(range(len(page_layout.regions))),
            vertical=False, intersect_param=self.intersect_param,
        )
        page_layout.regions = [page_layout.regions[i] for i in order]

        self.rotate_page_layout(page_layout, rotation)
        return page_layout

    # ------------------------------------------------------------------
    @staticmethod
    def rotate_page_layout(page: PageLayout, angle: float, origin=(0, 0)) -> None:
        if angle == 0:
            return
        matrix = cv2.getRotationMatrix2D(origin, angle, 1)

        def tf(points):
            pts = np.asarray(points, dtype=np.float64).reshape(1, -1, 2)
            return cv2.transform(pts, matrix)[0]

        for region in page.regions:
            region.polygon = tf(region.polygon)
            for line in region.lines:
                if line.polygon is not None:
                    line.polygon = tf(line.polygon)
                if line.baseline is not None:
                    line.baseline = tf(line.baseline)

    @staticmethod
    def get_rotation(lines) -> float:
        """Median-ish tilt from the longer half of the lines
        (reference: smart_sorter.py:279-303 variant using sin)."""
        if not lines:
            return 0.0
        info = []
        for line in lines:
            first = np.asarray(line.baseline[0], dtype=np.float64)
            last = np.asarray(line.baseline[-1], dtype=np.float64)
            if last[1] != first[1]:
                length = float(np.hypot(*(last - first)))
                rotation = math.degrees(
                    math.sin((last[1] - first[1]) / max(length, 1e-9))
                )
                info.append((length, rotation))
            else:
                info.append((0.0, 0.0))
        info.sort(key=lambda x: x[0], reverse=True)
        info = info[: len(info) // 2]
        if not info:
            return 0.0
        return sum(r for _, r in info) / len(info)
