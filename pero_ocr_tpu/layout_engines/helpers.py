"""Shared layout geometry helpers.

Capability-equivalent to the reference's layout_helpers
(reference: pero_ocr/layout_engines/layout_helpers.py:16-410), built on
the framework's own geometry layer (:mod:`pero_ocr_tpu.core.geometry`)
instead of shapely.
"""

from __future__ import annotations

import logging
import math
import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from pero_ocr_tpu.core import geometry
from pero_ocr_tpu.core.layout import TextLine

logger = logging.getLogger(__name__)


def check_line_position(baseline, page_size, margin=20, min_ratio=0.125):
    """Drop short lines hugging the page edge — likely bleed-through from a
    partially scanned neighboring page
    (reference: layout_helpers.py:16-26)."""
    x_coords = np.asarray(baseline)[:, 0]
    if np.any(x_coords < margin) and not np.any(x_coords > page_size[1] * min_ratio):
        return False
    if np.any(x_coords > (page_size[1] - margin)) and not np.any(
        x_coords < page_size[1] * min_ratio
    ):
        return False
    return True


def get_max_line_length(baseline_list):
    if not baseline_list:
        return 0
    x0 = np.asarray([b[0, 0] for b in baseline_list])
    x1 = np.asarray([b[-1, 0] for b in baseline_list])
    return np.abs(x1 - x0).max()


def baseline_to_textline(baseline: np.ndarray, heights) -> np.ndarray:
    """Offset the baseline along segment normals into a closed outline
    (reference: layout_helpers.py:95-123)."""
    heights = np.asarray(
        [max(1.0, heights[0]), max(1.0, heights[1])], dtype=np.float32
    )
    baseline = np.asarray(baseline, dtype=np.float32)

    dx = np.diff(baseline[:, 0])
    dx = np.concatenate([dx, dx[-1:]])
    dy = np.diff(baseline[:, 1])
    dy = np.concatenate([dy, dy[-1:]])

    normals = np.pi / 2 + np.arctan2(dy, dx)
    up = baseline - np.stack(
        [np.cos(normals), np.sin(normals)], axis=1
    ) * heights[0]
    down = baseline + np.stack(
        [np.cos(normals), np.sin(normals)], axis=1
    ) * heights[1]
    return np.concatenate([up, down[::-1]], axis=0)


def baselines_to_textlines(baseline_list, heights_list) -> List[np.ndarray]:
    """Batched :func:`baseline_to_textline`: one vectorized pass per
    distinct vertex count instead of 2N numpy dispatches per line (the
    per-line helper was ~2.3 ms for a 40-line page; this is ~0.15).
    Identical outputs."""
    out: List[Optional[np.ndarray]] = [None] * len(baseline_list)
    by_len = {}
    for i, b in enumerate(baseline_list):
        by_len.setdefault(len(b), []).append(i)
    for npts, idxs in by_len.items():
        bl = np.asarray(
            [np.asarray(baseline_list[i], np.float32) for i in idxs]
        )                                             # (K, P, 2)
        hh = np.asarray(
            [
                [max(1.0, heights_list[i][0]), max(1.0, heights_list[i][1])]
                for i in idxs
            ],
            np.float32,
        )                                             # (K, 2)
        if npts < 2:
            for i in idxs:
                out[i] = baseline_to_textline(
                    baseline_list[i], heights_list[i]
                )
            continue
        d = np.diff(bl, axis=1)                       # (K, P-1, 2)
        d = np.concatenate([d, d[:, -1:]], axis=1)    # (K, P, 2)
        normals = np.pi / 2 + np.arctan2(d[..., 1], d[..., 0])
        nvec = np.stack([np.cos(normals), np.sin(normals)], axis=-1)
        up = bl - nvec * hh[:, None, 0:1]
        down = bl + nvec * hh[:, None, 1:2]
        polys = np.concatenate([up, down[:, ::-1]], axis=1)
        for k, i in enumerate(idxs):
            out[i] = polys[k]
    return out


def assign_lines_to_regions(baseline_list, heights_list, textline_list, regions):
    """Clip each candidate line into every bbox-overlapping region
    (reference: layout_helpers.py:37-75)."""
    if not baseline_list or not regions:
        return regions
    min_line = np.asarray([np.min(b, axis=0) for b in baseline_list])
    max_line = np.asarray([np.max(b, axis=0) for b in baseline_list])
    min_region = np.asarray([np.min(r.polygon, axis=0) for r in regions])
    max_region = np.asarray([np.max(r.polygon, axis=0) for r in regions])

    disjoint = np.logical_and(
        np.logical_or(
            max_line[:, None, 1] <= min_region[None, :, 1],
            min_line[:, None, 1] >= max_region[None, :, 1],
        ),
        np.logical_or(
            max_line[:, None, 0] <= min_region[None, :, 0],
            min_line[:, None, 0] >= max_region[None, :, 0],
        ),
    )
    for line_id, region_id in zip(*np.logical_not(disjoint).nonzero()):
        region = regions[region_id]
        baseline_clip, textline_clip = mask_textline_by_region(
            baseline_list[line_id], textline_list[line_id], region.polygon
        )
        if baseline_clip is not None and textline_clip is not None:
            region.lines.append(
                TextLine(
                    id=f"{region.id}-l{line_id + 1:03d}",
                    baseline=baseline_clip,
                    polygon=textline_clip,
                    heights=heights_list[line_id],
                )
            )
    return regions


def region_from_textlines(region_textlines) -> np.ndarray:
    """Alpha-shape outline around the union of textline outlines
    (reference: layout_helpers.py:126-148).  Returns a polygon array."""
    points = np.concatenate(region_textlines, axis=0)
    # Max segment length across all outlines in one pass: a diff over
    # the concatenated cloud, with the seams between consecutive
    # outlines masked out (cheaper than one norm call per line).
    if len(points) > 1:
        d = np.diff(points.astype(np.float64, copy=False), axis=0)
        seg2 = (d * d).sum(axis=1)
        seam = np.cumsum(
            [len(t) for t in region_textlines[:-1]], dtype=np.int64
        ) - 1
        seg2[seam] = 0.0
        max_spacing = float(np.sqrt(seg2.max())) if seg2.size else 1.0
        if max_spacing <= 0.0:
            max_spacing = 1.0
    else:
        max_spacing = 1.0

    # geometry.alpha_shape keeps triangles with circumradius < 1/alpha;
    # the reference keeps circumradius <= max_spacing.
    poly, covers_all = geometry.alpha_shape_info(
        points, alpha=1.0 / max(max_spacing, 1e-6)
    )
    if covers_all:
        # Single-ring union with every input point a kept-triangle
        # vertex: containment holds by construction (the common
        # paragraph case) — skip the straggler scan.
        return poly

    # Ensure every textline is inside; union in the stragglers.  The
    # containment test counts boundary contact as inside (shapely
    # `contains` semantics: only exterior points disqualify) — the
    # alpha shape's exact boundary passes THROUGH input points, so a
    # strict ray-cast would flag every line as a straggler.  One
    # batched test over the already-concatenated point cloud; per-line
    # attribution via offsets.
    missing = []
    inside = geometry.points_in_polygon(points, poly)
    if not inside.all():
        exterior = ~inside
        exterior[exterior] = (
            geometry.points_to_polygon_dist(points[exterior], poly) > 1e-6
        )
        if exterior.any():
            off = 0
            for textline in region_textlines:
                t = np.asarray(textline, dtype=np.float64)
                if exterior[off : off + len(t)].any():
                    missing.append(t)
                off += len(t)
    if missing:
        all_pts = np.concatenate([poly] + missing, axis=0)
        poly = geometry.convex_hull(all_pts)
    return poly


def retrace_region(region) -> None:
    """Rebuild region polygon from its lines' outlines
    (reference: layout_helpers.py:78-92)."""
    textlines = [line.polygon for line in region.lines]
    if not textlines:
        return
    new_polygon = region_from_textlines(textlines)
    region.polygon = geometry.simplify_polygon(new_polygon, 5)


def merge_lines(baselines, heights):
    """Merge baselines lying on the same visual row
    (reference: layout_helpers.py:194-258): deskew by dominant tilt, pair
    lines with >=70% vertical overlap, small horizontal gap and no
    horizontal containment, then fuse each group into one resampled
    baseline with element-wise max heights."""
    rotation = get_rotation(baselines)
    baselines = [rotate_coords(b, rotation, (0, 0)) for b in baselines]

    n = len(baselines)
    avg_y = np.asarray([np.average(np.asarray(b)[:, 1]) for b in baselines])
    x_min = np.asarray([np.amin(np.asarray(b)[:, 0]) for b in baselines])
    x_max = np.asarray([np.amax(np.asarray(b)[:, 0]) for b in baselines])
    h_asc = np.asarray([h[0] for h in heights], dtype=float)
    h_desc = np.asarray([h[1] for h in heights], dtype=float)

    merged = set()
    groups: List[List[int]] = []
    for i in range(n):
        group = []
        for j in range(n):
            if i == j:
                continue
            contained = (x_min[i] > x_min[j] and x_max[i] < x_max[j]) or (
                x_min[j] > x_min[i] and x_max[j] < x_max[i]
            )
            gap = max(x_min[i] - x_max[j], x_min[j] - x_max[i])
            overlap = min(avg_y[i] + h_desc[i], avg_y[j] + h_desc[j]) - max(
                avg_y[i] - h_asc[i], avg_y[j] - h_asc[j]
            )
            min_height = min(h_asc[i] + h_desc[i], h_asc[j] + h_desc[j])
            if (
                overlap > 0.7 * min_height
                and not contained
                and gap < 2 * min_height
            ):
                if i not in merged:
                    group.append(i)
                    merged.add(i)
                if j not in merged:
                    group.append(j)
                    merged.add(j)
        groups.append(group)

    baselines = [np.asarray(b) for b in baselines]
    heights = [list(h) for h in heights]
    for group in groups:
        if not group:
            continue
        pts = np.concatenate([baselines[g] for g in group], axis=0)
        pts = pts[np.argsort(pts[:, 0])]
        baselines.append(resample_baselines([pts])[0])
        heights.append(
            [
                max(heights[g][0] for g in group),
                max(heights[g][1] for g in group),
            ]
        )

    keep = [i for i in range(len(baselines)) if i not in merged]
    baselines = [baselines[i] for i in keep]
    heights = [heights[i] for i in keep]

    order = [
        b[0][1] + random.uniform(0.001, 0.999) for b in baselines
    ]
    baselines = [b for _, b in sorted(zip(order, baselines), key=lambda x: x[0])]
    heights = [h for _, h in sorted(zip(order, heights), key=lambda x: x[0])]

    baselines = [rotate_coords(b, -rotation, (0, 0)) for b in baselines]
    return baselines, heights


def order_lines_vertical(baselines, heights, textlines):
    """Sort lines top to bottom (jittered to stabilize equal-y sorts,
    reference: layout_helpers.py:261-272)."""
    order = [b[0][1] + random.uniform(0.001, 0.999) for b in baselines]
    idx = sorted(range(len(order)), key=lambda i: order[i])
    return (
        [baselines[i] for i in idx],
        [heights[i] for i in idx],
        [textlines[i] for i in idx],
    )


def resample_baselines(baselines, num_points: int = 10):
    """Polynomial-fit resampling to `num_points`
    (reference: layout_helpers.py:275-292); vertical baselines are fit in
    transposed coordinates."""
    out = []
    for baseline in baselines:
        baseline = np.asarray(baseline, dtype=float)
        vertical = abs(baseline[0, 0] - baseline[-1, 0]) < abs(
            baseline[0, 1] - baseline[-1, 1]
        )
        if vertical:
            baseline = baseline[:, ::-1]
        order = 1 if baseline.shape[0] == 2 else 2
        fit = np.poly1d(np.polyfit(baseline[:, 0], baseline[:, 1], order))
        xs = np.linspace(baseline[0, 0], baseline[-1, 0], num_points)
        resampled = np.stack([xs, fit(xs)], axis=-1)
        if vertical:
            resampled = resampled[:, ::-1]
        out.append(resampled)
    return out


def filter_list(items_list, indices_to_remove):
    """Remove list items by index, supporting negatives
    (reference: layout_helpers.py:295-309)."""

    def normalize(idx):
        n = len(items_list)
        if idx < -n or idx > n - 1:
            raise ValueError(f"Cannot remove index {idx} from {n}-long data")
        return idx if idx >= 0 else n + idx

    to_remove = {normalize(i) for i in indices_to_remove}
    return [x for i, x in enumerate(items_list) if i not in to_remove]


def mask_textline_by_region(baseline, textline, region):
    """Clip a line's baseline+outline to a region polygon
    (reference: layout_helpers.py:312-342).  Returns (baseline, textline)
    arrays or (None, None) if the overlap is negligible."""
    baseline = np.asarray(baseline, dtype=float)
    region = np.asarray(region, dtype=float)
    clipped_baseline = geometry.mask_polyline_by_polygon(baseline, region)
    if clipped_baseline is None or len(clipped_baseline) < 2:
        return None, None
    length = np.hypot(*np.diff(clipped_baseline, axis=0).T).sum()
    if length <= 2:
        return None, None
    clipped_textline = geometry.polygon_intersection(
        np.asarray(textline, dtype=float), region
    )
    if clipped_textline is None:
        return None, None
    return clipped_baseline, clipped_textline


def get_rotation(lines) -> float:
    """Mean tilt (degrees) of the longer half of the lines
    (reference: layout_helpers.py:345-374)."""
    info = []
    for line in lines:
        first = np.asarray(line[0], dtype=np.float64)
        last = np.asarray(line[-1], dtype=np.float64)
        if last[1] != first[1]:
            rotation = math.degrees(
                np.arctan2(last[1] - first[1], last[0] - first[0])
            )
            length = float(np.hypot(*(last - first)))
            info.append((length, rotation))
        else:
            info.append((0.0, 0.0))
    info.sort(key=lambda x: x[0], reverse=True)
    info = info[: len(info) // 2]
    if not info:
        return 0.0
    return sum(r for _, r in info) / len(info)


def rotate_coords(coords, rotation: float, center) -> np.ndarray:
    """Rotate points around `center` by `rotation` degrees
    (reference: layout_helpers.py:377-390)."""
    matrix = cv2.getRotationMatrix2D(tuple(center), rotation, 1)
    pts = np.asarray(coords, dtype=np.float64).reshape(1, -1, 2)
    return cv2.transform(pts, matrix)[0]


def adjust_baselines_to_intensity(baselines, img, tolerance: int = 5):
    """Snap baselines to the strongest vertical intensity gradient within
    +/-tolerance px (reference: layout_helpers.py:393-410)."""
    from scipy import ndimage

    grad = np.gradient(
        cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(float)
    )[0]
    grad = ndimage.gaussian_filter(grad, 3)
    new_baselines = []
    for baseline in baselines:
        num_points = max(int(baseline[-1][0] - baseline[0][0]), 2)
        pts = np.round(
            resample_baselines([baseline], num_points=num_points)[0]
        ).astype(int)
        ys = np.clip(
            pts[:, 1][None, :] + np.arange(-tolerance, tolerance)[:, None],
            0,
            grad.shape[0] - 1,
        )
        xs = np.clip(pts[:, 0], 0, grad.shape[1] - 1)
        scores = grad[ys, xs[None, :]].sum(axis=1)
        best_offset = int(np.argmax(scores)) - tolerance
        pts[:, 1] += best_offset
        new_baselines.append(
            resample_baselines([pts], num_points=len(baseline))[0]
        )
    return new_baselines
