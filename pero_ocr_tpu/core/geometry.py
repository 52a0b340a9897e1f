"""Host-side 2D polygon geometry.

Standalone replacement for the reference's shapely/skimage dependency
surface (used by pero_ocr/layout_engines/layout_helpers.py and
pero_ocr/core/layout.py).  Exact predicates where cheap (shoelace area,
segment intersection, point-in-polygon) and raster-based boolean ops
(intersection area, masking, buffering) via OpenCV, which is robust for
the pixel-coordinate polygons this framework works with.

All polygons are (N, 2) float arrays of x,y coordinates.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


def polygon_area(polygon: np.ndarray) -> float:
    """Signed shoelace area (positive for counter-clockwise in y-down coords)."""
    p = np.asarray(polygon, dtype=np.float64)
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def bbox(polygon: np.ndarray) -> Tuple[float, float, float, float]:
    p = np.asarray(polygon)
    return float(p[:, 0].min()), float(p[:, 1].min()), float(p[:, 0].max()), float(p[:, 1].max())


def bboxes_intersect(a: np.ndarray, b: np.ndarray, margin: float = 0.0) -> bool:
    ax0, ay0, ax1, ay1 = bbox(a)
    bx0, by0, bx1, by1 = bbox(b)
    return not (
        ax1 + margin < bx0
        or bx1 + margin < ax0
        or ay1 + margin < by0
        or by1 + margin < ay0
    )


def point_in_polygon(point: Sequence[float], polygon: np.ndarray) -> bool:
    """Ray-casting point-in-polygon test."""
    x, y = float(point[0]), float(point[1])
    p = np.asarray(polygon, dtype=np.float64)
    x0, y0 = p[:, 0], p[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    crosses = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
    hits = crosses & (x < x_int)
    return bool(np.count_nonzero(hits) % 2)


def points_in_polygon(points: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting test for many points; returns bool (N,)."""
    pts = np.asarray(points, dtype=np.float64)
    p = np.asarray(polygon, dtype=np.float64)
    x0, y0 = p[:, 0], p[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    x = pts[:, 0:1]
    y = pts[:, 1:2]
    crosses = (y0[None, :] > y) != (y1[None, :] > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x0[None, :] + (y - y0[None, :]) / (y1[None, :] - y0[None, :]) * (
            x1[None, :] - x0[None, :]
        )
    hits = crosses & (x < x_int)
    return (np.count_nonzero(hits, axis=1) % 2).astype(bool)


def points_to_polygon_dist(
    points: np.ndarray, polygon: np.ndarray
) -> np.ndarray:
    """Distance from each point to the polygon BOUNDARY (0 on an edge
    or vertex); vectorized over points x edges.  Returns (N,)."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.size == 0:
        return np.zeros((0,), np.float64)
    a0 = np.asarray(polygon, dtype=np.float64)
    a1 = np.roll(a0, -1, axis=0)
    d = a1 - a0                                   # (E, 2)
    pr = pts[:, None, :] - a0[None, :, :]         # (N, E, 2)
    denom = np.maximum((d * d).sum(-1), 1e-12)    # (E,)
    t = np.clip((pr * d[None]).sum(-1) / denom[None], 0.0, 1.0)
    closest = a0[None] + t[..., None] * d[None]
    return np.sqrt(
        ((pts[:, None, :] - closest) ** 2).sum(-1)
    ).min(axis=1)


def segment_polygon_intersections(
    p0: Sequence[float], p1: Sequence[float], polygon: np.ndarray
) -> np.ndarray:
    """All intersection points of segment p0->p1 with the polygon boundary,
    ordered by distance from p0.  Returns (K, 2) array (possibly empty)."""
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    poly = np.asarray(polygon, dtype=np.float64)
    a0 = poly
    a1 = np.roll(poly, -1, axis=0)

    d = p1 - p0  # segment direction
    e = a1 - a0  # edge directions
    denom = d[0] * e[:, 1] - d[1] * e[:, 0]
    diff = a0 - p0
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (diff[:, 0] * e[:, 1] - diff[:, 1] * e[:, 0]) / denom
        u = (diff[:, 0] * d[1] - diff[:, 1] * d[0]) / denom
    valid = (np.abs(denom) > 1e-12) & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u < 1.0)
    t = t[valid]
    pts = p0[None, :] + t[:, None] * d[None, :]
    order = np.argsort(t)
    return pts[order]


# ----------------------------------------------------------------------
# Raster-based boolean operations
# ----------------------------------------------------------------------
def _raster_frame(*polygons: np.ndarray, pad: int = 2):
    """Common integer raster frame covering all polygons."""
    allp = np.concatenate([np.asarray(p, dtype=np.float64) for p in polygons], axis=0)
    x0 = int(np.floor(allp[:, 0].min())) - pad
    y0 = int(np.floor(allp[:, 1].min())) - pad
    x1 = int(np.ceil(allp[:, 0].max())) + pad
    y1 = int(np.ceil(allp[:, 1].max())) + pad
    w = max(x1 - x0, 1)
    h = max(y1 - y0, 1)
    return x0, y0, w, h


def rasterize_polygon(
    polygon: np.ndarray, origin: Tuple[int, int], shape: Tuple[int, int]
) -> np.ndarray:
    """Binary mask of the polygon in a raster with the given origin/(h, w)."""
    mask = np.zeros(shape, dtype=np.uint8)
    pts = np.round(np.asarray(polygon, dtype=np.float64) - np.asarray(origin)[None, :])
    cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
    return mask


def _rasterize_scaled(polygon, x0, y0, shape, scale):
    """Rasterize with pixel-center sampling at `scale` subpixels per pixel:
    raster pixel (i, j) samples page point ((j/scale)+x0, (i/scale)+y0)."""
    mask = np.zeros(shape, dtype=np.uint8)
    pts = (np.asarray(polygon, dtype=np.float64) - [x0, y0]) * scale - 0.5
    cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask


def polygon_intersection_area(a: np.ndarray, b: np.ndarray, scale: int = 4) -> float:
    """Intersection area of two polygons (supersampled raster approximation;
    unbiased pixel-center sampling at `scale` subpixels per unit)."""
    if not bboxes_intersect(a, b):
        return 0.0
    x0, y0, w, h = _raster_frame(a, b)
    while scale > 1 and (w * h * scale * scale) > 64_000_000:
        scale //= 2
    if w * h * scale * scale > 64_000_000:  # degenerate huge frame -> bbox overlap
        ax0, ay0, ax1, ay1 = bbox(a)
        bx0, by0, bx1, by1 = bbox(b)
        iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
        ih = max(0.0, min(ay1, by1) - max(ay0, by0))
        return iw * ih
    shape = (h * scale, w * scale)
    ma = _rasterize_scaled(a, x0, y0, shape, scale)
    mb = _rasterize_scaled(b, x0, y0, shape, scale)
    return float(np.count_nonzero(ma & mb)) / (scale * scale)


def polygons_overlap(a: np.ndarray, b: np.ndarray, min_area: float = 1.0) -> bool:
    return polygon_intersection_area(a, b) >= min_area


def polygon_intersection(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Largest connected intersection polygon of a and b (raster-based),
    or None if they do not intersect."""
    if not bboxes_intersect(a, b):
        return None
    x0, y0, w, h = _raster_frame(a, b)
    ma = rasterize_polygon(a, (x0, y0), (h, w))
    mb = rasterize_polygon(b, (x0, y0), (h, w))
    inter = (ma & mb).astype(np.uint8)
    if not inter.any():
        return None
    contours, _ = cv2.findContours(inter, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    largest = max(contours, key=cv2.contourArea)
    poly = largest.reshape(-1, 2).astype(np.float64) + np.asarray([x0, y0])[None, :]
    if len(poly) < 3:
        return None
    return poly


def polygon_min_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Minimum Euclidean distance between two polygon BOUNDARIES,
    vectorized exact segment-segment distances (no rasterization).

    ``buffer(a, da).intersects(buffer(b, db))`` — the reference's
    dilated-overlap test (cnn_layout_engine.py:337-344) — is by the
    Minkowski-sum identity EXACTLY ``polygon_min_distance(a, b) <
    da + db`` for disjoint polygons, and this form runs ~50x faster
    than rasterized dilation."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a0 = a
    a1 = np.roll(a, -1, axis=0)
    b0 = b
    b1 = np.roll(b, -1, axis=0)
    # Broadcast all (M segments) x (N segments) pairs.
    d1 = (a1 - a0)[:, None]              # (M, 1, 2)
    d2 = (b1 - b0)[None]                 # (1, N, 2)
    r = a0[:, None] - b0[None]           # (M, N, 2)
    A = (d1 * d1).sum(-1)
    E = (d2 * d2).sum(-1)
    B = (d1 * d2).sum(-1)
    C = (d1 * r).sum(-1)
    F = (d2 * r).sum(-1)
    denom = A * E - B * B
    s = np.where(
        denom > 1e-12,
        np.clip((B * F - C * E) / np.where(denom > 1e-12, denom, 1.0), 0, 1),
        0.0,
    )
    t = np.clip((B * s + F) / np.where(E > 1e-12, E, 1.0), 0, 1)
    s = np.clip((B * t - C) / np.where(A > 1e-12, A, 1.0), 0, 1)
    p = a0[:, None] + s[..., None] * d1
    q = b0[None] + t[..., None] * d2
    return float(np.sqrt(((p - q) ** 2).sum(-1)).min())


def polygon_min_distance_batch(
    polys, pairs: np.ndarray
) -> np.ndarray:
    """`polygon_min_distance` for MANY pairs in one vectorized shot.

    ``polys``: list of (Pi, 2) polygons; ``pairs``: (K, 2) int indices.
    Polygons pad to the longest by repeating the last vertex (degenerate
    segments cannot change a minimum distance).  Returns (K,) floats."""
    pairs = np.asarray(pairs)
    if len(pairs) == 0:
        return np.zeros(0)
    pmax = max(len(p) for p in polys)
    stack = np.stack([
        np.pad(
            np.asarray(p, np.float64),
            ((0, pmax - len(p)), (0, 0)), mode="edge",
        )
        for p in polys
    ])                                        # (n, P, 2)
    va = stack[pairs[:, 0]]                   # (K, P, 2)
    vb = stack[pairs[:, 1]]
    a0 = va[:, :, None]                       # (K, P, 1, 2)
    a1 = np.roll(va, -1, axis=1)[:, :, None]
    b0 = vb[:, None]                          # (K, 1, P, 2)
    b1 = np.roll(vb, -1, axis=1)[:, None]
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    A = (d1 * d1).sum(-1)
    E = (d2 * d2).sum(-1)
    B = (d1 * d2).sum(-1)
    C = (d1 * r).sum(-1)
    F = (d2 * r).sum(-1)
    denom = A * E - B * B
    s = np.where(
        denom > 1e-12,
        np.clip((B * F - C * E) / np.where(denom > 1e-12, denom, 1.0), 0, 1),
        0.0,
    )
    t = np.clip((B * s + F) / np.where(E > 1e-12, E, 1.0), 0, 1)
    s = np.clip((B * t - C) / np.where(A > 1e-12, A, 1.0), 0, 1)
    p = a0 + s[..., None] * d1
    q = b0 + t[..., None] * d2
    return np.sqrt(((p - q) ** 2).sum(-1)).min(axis=(1, 2))


def buffer_polygon(polygon: np.ndarray, distance: float) -> np.ndarray:
    """Grow (distance>0) or shrink (distance<0) a polygon (raster-based)."""
    d = int(round(abs(distance)))
    if d == 0:
        return np.asarray(polygon, dtype=np.float64)
    x0, y0, w, h = _raster_frame(polygon, pad=d + 2)
    mask = rasterize_polygon(polygon, (x0, y0), (h, w))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * d + 1, 2 * d + 1))
    if distance > 0:
        mask = cv2.dilate(mask, kernel)
    else:
        mask = cv2.erode(mask, kernel)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return np.asarray(polygon, dtype=np.float64)
    largest = max(contours, key=cv2.contourArea)
    return largest.reshape(-1, 2).astype(np.float64) + np.asarray([x0, y0])[None, :]


def simplify_polygon(polygon: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker simplification."""
    p = np.asarray(polygon, dtype=np.float32).reshape(-1, 1, 2)
    if len(p) < 3:
        return np.asarray(polygon, dtype=np.float64)
    approx = cv2.approxPolyDP(p, tolerance, True)
    out = approx.reshape(-1, 2).astype(np.float64)
    return out if len(out) >= 3 else np.asarray(polygon, dtype=np.float64)


def convex_hull(points: np.ndarray) -> np.ndarray:
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 1, 2)
    hull = cv2.convexHull(pts)
    return hull.reshape(-1, 2).astype(np.float64)


def _triangle_union_boundary(
    pts: np.ndarray, tris: np.ndarray
) -> Optional[np.ndarray]:
    """Exact outer boundary of a union of triangles from one
    triangulation, via a directed-edge walk (no rasterization).

    Orient every triangle CCW; a directed edge whose reverse does not
    occur is a boundary edge, and chaining boundary edges start -> end
    traces each component's outer ring CCW (holes come out CW and lose
    the signed-area comparison).  Returns the largest-area ring, or
    None when a vertex is shared by several boundary rings (pinch) —
    the caller falls back to the raster path for those rare shapes."""
    return _triangle_union_boundary_info(pts, tris)[0]


def _triangle_union_boundary_info(
    pts: np.ndarray, tris: np.ndarray
) -> Tuple[Optional[np.ndarray], int]:
    """:func:`_triangle_union_boundary` plus the closed-ring count
    (outer rings AND holes).  ``n_rings == 1`` proves the kept union is
    one simply connected component whose outer boundary is the returned
    ring — callers use that to skip redundant containment checks."""
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    t = tris.copy()
    flip = cross < 0
    t[flip, 1], t[flip, 2] = tris[flip, 2], tris[flip, 1]
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    n = int(edges.max()) + 1
    code = edges[:, 0].astype(np.int64) * n + edges[:, 1]
    if len(np.unique(code)) != len(code):  # duplicate directed edge
        return None, 0
    rcode = edges[:, 1].astype(np.int64) * n + edges[:, 0]
    on_boundary = ~np.isin(code, rcode)
    boundary = edges[on_boundary]
    if len(boundary) < 3:
        return None, 0
    starts = boundary[:, 0]
    if len(np.unique(starts)) != len(starts):
        return None, 0  # pinch vertex: two rings meet — raster fallback
    succ = dict(zip(starts.tolist(), boundary[:, 1].tolist()))

    best_poly, best_area, n_rings = None, 0.0, 0
    remaining = dict(succ)
    while remaining:
        u0, v = remaining.popitem()
        loop = [u0]
        u = v
        while u != u0:
            loop.append(u)
            nxt = remaining.pop(u, None)
            if nxt is None:     # open chain: inconsistent input
                return None, 0
            u = nxt
        n_rings += 1
        ring = pts[loop]
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * float(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        )
        if area > best_area:
            best_area, best_poly = area, ring
    if best_poly is None or len(best_poly) < 3:
        return None, 0
    return best_poly.astype(np.float64), n_rings


def alpha_shape(points: np.ndarray, alpha: float) -> np.ndarray:
    """Concave hull via Delaunay triangulation with circumradius filtering,
    following the alpha-shape construction the reference builds on shapely
    (reference: pero_ocr/layout_engines/layout_helpers.py:160-181).

    Returns the outer boundary polygon of the union of kept triangles;
    falls back to the convex hull when filtering disconnects everything.
    The boundary comes from an exact directed-edge walk (the reference's
    polygonize+unary_union equivalent, ~100x cheaper than rasterizing
    megapixel clusters — 35 -> 0.3 ms/page on the bench layout);
    pinched unions fall back to the raster+contour path."""
    return alpha_shape_info(points, alpha)[0]


def alpha_shape_info(
    points: np.ndarray, alpha: float
) -> Tuple[np.ndarray, bool]:
    """:func:`alpha_shape` plus a containment proof: the second element
    is True when the walk closed a SINGLE ring and every input point is
    a vertex of a kept triangle — every input point then lies on (or
    inside) the returned boundary, so callers can skip their own
    point-in-polygon straggler checks (~1 ms per 400-point paragraph
    on the 1-core bench host)."""
    from scipy.spatial import Delaunay

    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 4:
        return convex_hull(pts), False
    try:
        tri = Delaunay(pts)
    except Exception:
        return convex_hull(pts), False

    simplices = tri.simplices
    a = pts[simplices[:, 0]]
    b = pts[simplices[:, 1]]
    c = pts[simplices[:, 2]]
    # circumradius r = la*lb*lc / (4*area) < 1/alpha, evaluated in
    # squares (no sqrt, area from the cross product): r^2 < t^2  <=>
    # la2*lb2*lc2 < 4*cross^2*t^2.  Degenerate (zero-area) triangles
    # fail the strict inequality, same as the heron-floor form did.
    ab, ac, bc = b - a, c - a, c - b
    la2 = (bc * bc).sum(1)
    lb2 = (ac * ac).sum(1)
    lc2 = (ab * ab).sum(1)
    cross = ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0]
    t = 1.0 / max(alpha, 1e-9)
    keep = la2 * lb2 * lc2 < 4.0 * (cross * cross) * (t * t)
    if not keep.any():
        return convex_hull(pts), False

    kept = simplices[keep]
    poly, n_rings = _triangle_union_boundary_info(pts, kept)
    if poly is not None:
        covers_all = n_rings == 1 and len(np.unique(kept)) == len(pts)
        return poly, covers_all

    # Union of kept triangles via rasterization; boundary via contours.
    x0, y0, w, h = _raster_frame(pts)
    mask = np.zeros((h, w), dtype=np.uint8)
    tris = (pts[kept] - np.asarray([x0, y0])[None, None, :]).astype(np.int32)
    cv2.fillPoly(mask, list(tris), 1)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return convex_hull(pts), False
    largest = max(contours, key=cv2.contourArea)
    poly = largest.reshape(-1, 2).astype(np.float64) + np.asarray([x0, y0])[None, :]
    if len(poly) < 3:
        return convex_hull(pts), False
    return poly, False


def mask_polyline_by_polygon(
    polyline: np.ndarray, polygon: np.ndarray
) -> Optional[np.ndarray]:
    """Clip a polyline to the part inside the polygon: returns the longest
    contiguous run of inside points, with boundary intersections appended at
    the cut ends (reference: pero_ocr/layout_engines/layout_helpers.py:312-342
    semantics).  Returns None if no point is inside."""
    line = np.asarray(polyline, dtype=np.float64)
    inside = points_in_polygon(line, polygon)
    if not inside.any():
        return None
    if inside.all():
        return line

    # Longest run of inside points.
    best_start, best_len = 0, 0
    cur_start, cur_len = None, 0
    for i, flag in enumerate(inside):
        if flag:
            if cur_start is None:
                cur_start, cur_len = i, 1
            else:
                cur_len += 1
            if cur_len > best_len:
                best_start, best_len = cur_start, cur_len
        else:
            cur_start, cur_len = None, 0
    seg = line[best_start : best_start + best_len]

    pieces: List[np.ndarray] = []
    if best_start > 0:
        entry = line[best_start]
        cuts = segment_polygon_intersections(line[best_start - 1], entry, polygon)
        # Ignore cuts at the inside endpoint itself (it may lie exactly on
        # the polygon boundary); keep the last true boundary crossing.
        cuts = cuts[np.hypot(*(cuts - entry[None, :]).T) > 1e-6]
        if len(cuts):
            pieces.append(cuts[-1:][:, :2])
    pieces.append(seg)
    end = best_start + best_len
    if end < len(line):
        exit_pt = line[end - 1]
        cuts = segment_polygon_intersections(exit_pt, line[end], polygon)
        cuts = cuts[np.hypot(*(cuts - exit_pt[None, :]).T) > 1e-6]
        if len(cuts):
            pieces.append(cuts[:1][:, :2])
    return np.concatenate(pieces, axis=0)
