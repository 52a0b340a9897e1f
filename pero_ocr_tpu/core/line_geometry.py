"""Text-line geometry: baseline interpolation, warp-field construction and
height estimation.

This module is host-side numpy and fully vectorized (no per-sample Python
loops).  It produces the per-line sampling grids that the device-side
batched warp (:mod:`pero_ocr_tpu.ops.warp`) gathers with; ALTO word
geometry reuses the same fields.

Behavior matches the reference crop-input construction
(reference: pero_ocr/core/crop_engine.py:54-111): rotate to the baseline
chord, fit a cubic interpolant (or low-order polynomial), resample
uniformly in arc length, offset along per-sample normals spanning
``[-ascender, +descender]``, and rotate back.  The reference's numba
arc-length inversion loop (crop_engine.py:101-111) is replaced by
``np.interp``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

from pero_ocr_tpu.core import geometry


def chord_rotation(baseline: np.ndarray) -> Tuple[float, np.ndarray]:
    """Angle of the baseline chord and its rotation matrix R such that
    ``points @ inv(R)`` maps into chord-aligned coordinates."""
    coords = np.asarray(baseline, dtype=np.float64)
    alpha = math.atan2(
        coords[-1, 1] - coords[0, 1], coords[-1, 0] - coords[0, 0]
    )
    rot = np.array(
        [[np.cos(alpha), np.sin(alpha)], [-np.sin(alpha), np.cos(alpha)]]
    )
    return alpha, rot


def fit_baseline(
    coords: np.ndarray, poly: int = 0
):
    """Fit y(x) to chord-aligned baseline points.

    ``poly > 0`` uses a least-squares polynomial of that order; otherwise a
    natural cubic spline through the points with a linear fallback for
    degenerate inputs.  Returns a callable y(x).
    """
    x = coords[:, 0].astype(np.float64)
    y = coords[:, 1].astype(np.float64)
    if poly:
        order = poly if len(x) > 2 else 1
        return np.poly1d(np.polyfit(x, y, order))
    if len(x) < 3:
        return np.poly1d(np.polyfit(x, y, 1))
    from scipy import interpolate

    # Strictly increasing x is required; nudge duplicates apart.
    x = x.copy()
    x[-1] += 0.1
    dx = np.diff(x)
    if np.any(dx <= 0):
        return np.poly1d(np.polyfit(x, y, 1))
    try:
        return interpolate.interp1d(x, y, kind="cubic", fill_value="extrapolate")
    except Exception:
        return np.poly1d(np.polyfit(x, y, 1))


def warp_field(
    baseline: np.ndarray,
    heights: Sequence[float],
    target_height: int,
    poly: int = 0,
    scale: float = 1.0,
) -> np.ndarray:
    """Build the dense (target_height, W, 2) map of source x,y coordinates
    for dewarping a curved line into a height-normalized strip.

    W is proportional to the baseline arc length scaled by
    ``target_height / (asc + desc)`` — the same output-width rule as the
    reference (reference: pero_ocr/core/crop_engine.py:77-81).
    """
    asc = float(heights[0]) * scale
    desc = float(heights[1]) * scale

    coords = np.asarray(baseline, dtype=np.float64).copy().astype(int).astype(np.float64)
    _, rot = chord_rotation(coords)
    coords = coords @ np.linalg.inv(rot)

    interp = fit_baseline(coords, poly=poly)

    left = coords[:, 0].min()
    right = coords[:, 0].max()
    xs = np.arange(left, right)
    if len(xs) < 2:
        xs = np.array([left, left + 1.0])
    ys = np.asarray(interp(xs), dtype=np.float64)

    seg_len = np.hypot(np.diff(xs), np.diff(ys))
    arc = np.concatenate([[0.0], np.cumsum(seg_len)])

    px_scale = target_height / max(asc + desc, 1e-6)
    n_cols = int(arc[-1] * px_scale)
    if n_cols < 1:
        n_cols = 1

    # Uniform arc-length positions -> source x via inverse arc-length map.
    t = np.linspace(0, arc[-1], n_cols)
    out_x = np.interp(t, arc, xs)
    out_y = np.asarray(interp(out_x), dtype=np.float64)

    # Normals from the local tangent (forward difference, h=0.1), identical
    # finite-difference scheme to the reference (crop_engine.py:87-93).
    d_x = np.full_like(out_x, 0.1)
    d_y = out_y - np.asarray(interp(out_x + 0.1), dtype=np.float64)
    norm = np.hypot(d_x, d_y)
    norm_x = -d_y / norm
    norm_y = d_x / norm

    vertical = np.linspace(-asc, desc, target_height).reshape(-1, 1)
    map_x = norm_x[None, :] * vertical + out_x[None, :]
    map_y = norm_y[None, :] * vertical + out_y[None, :]

    field = np.stack([map_x, map_y], axis=2)
    field = field @ rot
    return field.astype(np.float32)


def resample_baseline(baseline: np.ndarray, num_points: int = 10) -> np.ndarray:
    """Resample a baseline polyline to ``num_points`` points uniformly spaced
    in arc length (vectorized replacement for
    reference: pero_ocr/layout_engines/layout_helpers.py:275-292)."""
    pts = np.asarray(baseline, dtype=np.float64)
    if len(pts) < 2:
        return pts.copy()
    seg = np.hypot(*np.diff(pts, axis=0).T)
    arc = np.concatenate([[0.0], np.cumsum(seg)])
    if arc[-1] <= 0:
        return np.repeat(pts[:1], num_points, axis=0)
    t = np.linspace(0, arc[-1], num_points)
    x = np.interp(t, arc, pts[:, 0])
    y = np.interp(t, arc, pts[:, 1])
    return np.stack([x, y], axis=1)


def baseline_to_textline(
    baseline: np.ndarray, heights: Sequence[float]
) -> np.ndarray:
    """Expand a baseline into a line outline polygon by offsetting along
    per-point normals: up by the ascender, down by the descender
    (reference: pero_ocr/layout_engines/layout_helpers.py:95-123 semantics)."""
    pts = np.asarray(baseline, dtype=np.float64)
    if len(pts) == 1:
        pts = np.concatenate([pts, pts + [1.0, 0.0]], axis=0)
    # Per-point tangents via central differences.
    tangents = np.gradient(pts, axis=0)
    norm = np.hypot(tangents[:, 0], tangents[:, 1])
    norm = np.where(norm < 1e-9, 1.0, norm)
    normals = np.stack([-tangents[:, 1] / norm, tangents[:, 0] / norm], axis=1)
    top = pts - normals * float(heights[0])
    bottom = pts + normals * float(heights[1])
    polygon = np.concatenate([top, bottom[::-1]], axis=0)
    return np.round(polygon).astype(np.int64)


def guess_heights_from_polygon(
    baseline: np.ndarray,
    polygon: np.ndarray,
    num_probes: int = 10,
) -> Sequence[float]:
    """Estimate [ascender, descender] heights by intersecting baseline
    normals with the line polygon (used on import when heights are absent,
    e.g. Transkribus PAGE files; reference: pero_ocr/core/layout.py:133-198).

    Probes several points along the baseline; falls back to a 0.8/0.2 split
    of the polygon's vertical extent when probing fails."""
    baseline = np.asarray(baseline, dtype=np.float64)
    polygon = np.asarray(polygon, dtype=np.float64)
    try:
        direction = baseline[-1] - baseline[0]
        length = np.hypot(*direction)
        if length < 1e-9:
            raise ValueError("degenerate baseline")
        normal = np.array([-direction[1], direction[0]]) / length
        span = max(polygon[:, 1].max() - polygon[:, 1].min(), 1.0) * 10.0

        probes = resample_baseline(baseline, num_probes)
        ups, downs = [], []
        for p in probes:
            cuts = geometry.segment_polygon_intersections(
                p - normal * span, p + normal * span, polygon
            )
            if len(cuts) < 2:
                continue
            ys = cuts[:, 1]
            above = cuts[ys < p[1]]
            below = cuts[ys >= p[1]]
            if len(above) == 0 or len(below) == 0:
                continue
            up = np.min(np.hypot(*(above - p[None, :]).T))
            down = np.min(np.hypot(*(below - p[None, :]).T))
            ups.append(up)
            downs.append(down)
        if ups:
            return [float(np.mean(ups)), float(np.mean(downs))]
    except Exception:
        pass
    height = polygon[:, 1].max() - polygon[:, 1].min()
    return [float(height * 0.8), float(height * 0.2)]
