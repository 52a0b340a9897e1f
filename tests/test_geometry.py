"""Tests for the shapely-free geometry layer and line geometry."""

import numpy as np
import pytest

from pero_ocr_tpu.core import geometry, line_geometry

SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)


class TestPolygonBasics:
    def test_area(self):
        assert abs(geometry.polygon_area(SQUARE)) == pytest.approx(100.0)

    def test_point_in_polygon(self):
        assert geometry.point_in_polygon([5, 5], SQUARE)
        assert not geometry.point_in_polygon([15, 5], SQUARE)

    def test_points_in_polygon_vectorized(self):
        pts = np.array([[5, 5], [15, 5], [1, 1], [-1, 0]])
        np.testing.assert_array_equal(
            geometry.points_in_polygon(pts, SQUARE), [True, False, True, False]
        )

    def test_segment_intersections(self):
        cuts = geometry.segment_polygon_intersections([-5, 5], [15, 5], SQUARE)
        assert len(cuts) == 2
        np.testing.assert_allclose(sorted(cuts[:, 0]), [0, 10], atol=1e-9)

    def test_intersection_area(self):
        other = SQUARE + np.array([5, 0])
        area = geometry.polygon_intersection_area(SQUARE, other)
        assert area == pytest.approx(50.0, rel=0.15)

    def test_no_intersection(self):
        other = SQUARE + np.array([100, 0])
        assert geometry.polygon_intersection_area(SQUARE, other) == 0.0

    def test_buffer_grow(self):
        grown = geometry.buffer_polygon(SQUARE, 3)
        assert abs(geometry.polygon_area(grown)) > 100.0

    def test_simplify(self):
        dense = np.array(
            [[i, 0.01 * (i % 2)] for i in range(20)]
            + [[19, 10], [0, 10]],
            dtype=float,
        )
        simplified = geometry.simplify_polygon(dense, 1.0)
        assert len(simplified) < len(dense)

    def test_convex_hull(self):
        pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5]], dtype=float)
        hull = geometry.convex_hull(pts)
        assert len(hull) == 4

    def test_alpha_shape_concave(self):
        # An L-shaped point cloud: alpha shape should hug it more tightly
        # than the convex hull.
        pts = []
        for i in range(0, 21):
            for j in range(0, 21):
                if i <= 8 or j <= 8:
                    pts.append([i, j])
        pts = np.asarray(pts, dtype=float)
        shape = geometry.alpha_shape(pts, alpha=0.3)
        hull = geometry.convex_hull(pts)
        assert abs(geometry.polygon_area(shape)) < abs(geometry.polygon_area(hull))

    def test_alpha_shape_edge_walk_exact_grid(self):
        # A 10x10 unit grid with a permissive alpha keeps every
        # triangle: the exact edge walk must return the 9x9 outer
        # square (area exactly 81 — the raster path could only
        # approximate this).
        g = np.arange(10, dtype=float)
        pts = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
        exact = geometry.alpha_shape(pts, alpha=0.5)
        assert abs(abs(geometry.polygon_area(exact)) - 81.0) < 1e-9
        inside = geometry.points_in_polygon(pts, exact)
        dist = geometry.points_to_polygon_dist(pts[~inside], exact)
        assert dist.max() < 1e-9  # boundary points, none exterior

    def test_triangle_union_boundary_simple(self):
        # Two triangles sharing an edge -> a quad outer ring, exact.
        pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
        tris = np.array([[0, 1, 2], [0, 2, 3]])
        ring = geometry._triangle_union_boundary(pts, tris)
        assert ring is not None
        assert abs(abs(geometry.polygon_area(ring)) - 4.0) < 1e-9
        assert len(ring) == 4

    def test_triangle_union_boundary_pinch_falls_back(self):
        # Two triangles sharing ONLY a vertex (bow tie): pinch -> None
        # (caller rasterizes instead).
        pts = np.array(
            [[0, 0], [2, 0], [1, 1], [0, 2], [2, 2]], dtype=float
        )
        tris = np.array([[0, 1, 2], [2, 3, 4]])
        assert geometry._triangle_union_boundary(pts, tris) is None

    def test_points_to_polygon_dist(self):
        d = geometry.points_to_polygon_dist(
            np.array([[5.0, 5.0], [5.0, 0.0], [5.0, -3.0], [15.0, 5.0]]),
            SQUARE,
        )
        np.testing.assert_allclose(d, [5.0, 0.0, 3.0, 5.0], atol=1e-9)


class TestMaskPolyline:
    def test_fully_inside(self):
        line = np.array([[2, 5], [8, 5]], dtype=float)
        out = geometry.mask_polyline_by_polygon(line, SQUARE)
        np.testing.assert_allclose(out, line)

    def test_fully_outside(self):
        line = np.array([[20, 5], [30, 5]], dtype=float)
        assert geometry.mask_polyline_by_polygon(line, SQUARE) is None

    def test_clipped(self):
        line = np.array([[5, 5], [8, 5], [20, 5]], dtype=float)
        out = geometry.mask_polyline_by_polygon(line, SQUARE)
        assert out is not None
        assert out[-1, 0] == pytest.approx(10.0, abs=1e-6)


class TestWarpField:
    def test_straight_horizontal_line(self):
        baseline = np.array([[10, 50], [110, 50]], dtype=float)
        heights = [20.0, 12.0]
        target_height = 32
        field = line_geometry.warp_field(baseline, heights, target_height)
        assert field.shape[0] == target_height
        # Output width = arc length * target_height/(asc+desc) = 100 * 1 = 100
        assert field.shape[1] == pytest.approx(100, abs=2)
        # Top row maps to y = 50 - asc, bottom row to y = 50 + desc.
        np.testing.assert_allclose(field[0, :, 1], 50 - 20, atol=0.5)
        np.testing.assert_allclose(field[-1, :, 1], 50 + 12, atol=0.5)
        # X coordinates increase monotonically from the left end.
        assert np.all(np.diff(field[16, :, 0]) > 0)
        assert field[16, 0, 0] == pytest.approx(10, abs=1.0)

    def test_diagonal_line_rotation(self):
        baseline = np.array([[0, 0], [100, 100]], dtype=float)
        field = line_geometry.warp_field(baseline, [10, 5], 15)
        # Arc length ~141, scale 1 -> ~141 columns.
        assert field.shape[1] == pytest.approx(141, abs=3)
        # Rows near the baseline should track y=x (row 7 of linspace(-10, 5, 15)
        # sits at perpendicular offset -2.5px -> |x-y| = 2.5*sqrt(2)).
        mid = field[field.shape[0] // 2]
        np.testing.assert_allclose(mid[:, 0], mid[:, 1] + 2.5 * np.sqrt(2), atol=1.0)

    def test_short_baseline_does_not_crash(self):
        baseline = np.array([[5, 5], [6, 5]], dtype=float)
        field = line_geometry.warp_field(baseline, [3, 1], 8)
        assert field.ndim == 3


class TestBaselineOps:
    def test_resample_uniform(self):
        baseline = np.array([[0, 0], [10, 0], [10, 10]], dtype=float)
        out = line_geometry.resample_baseline(baseline, 5)
        assert out.shape == (5, 2)
        seg = np.hypot(*np.diff(out, axis=0).T)
        np.testing.assert_allclose(seg, seg[0], atol=1e-6)

    def test_baseline_to_textline(self):
        baseline = np.array([[0, 50], [100, 50]], dtype=float)
        poly = line_geometry.baseline_to_textline(baseline, [10, 4])
        ys = poly[:, 1]
        assert ys.min() == pytest.approx(40, abs=1)
        assert ys.max() == pytest.approx(54, abs=1)

    def test_guess_heights(self):
        baseline = np.array([[10, 70], [190, 70]], dtype=float)
        polygon = np.array([[10, 40], [190, 40], [190, 80], [10, 80]], dtype=float)
        heights = line_geometry.guess_heights_from_polygon(baseline, polygon)
        assert heights[0] == pytest.approx(30, abs=2)
        assert heights[1] == pytest.approx(10, abs=2)


class TestPolygonDistance:
    def test_matches_pointwise_for_squares(self):
        from pero_ocr_tpu.core import geometry

        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        assert geometry.polygon_min_distance(sq, sq + [20, 0]) == pytest.approx(10.0)
        assert geometry.polygon_min_distance(sq, sq + [15, 15]) == pytest.approx(
            np.hypot(5, 5)
        )
        # Overlapping boundaries -> 0.
        assert geometry.polygon_min_distance(sq, sq + [5, 0]) == 0.0

    def test_batch_matches_scalar(self):
        from pero_ocr_tpu.core import geometry

        rng = np.random.default_rng(0)
        polys = [
            rng.uniform(0, 100, (int(n), 2))
            for n in rng.integers(3, 9, size=6)
        ]
        pairs = np.array([[0, 1], [2, 3], [4, 5], [0, 5]])
        batch = geometry.polygon_min_distance_batch(polys, pairs)
        for (i, j), d in zip(pairs, batch):
            assert d == pytest.approx(
                geometry.polygon_min_distance(polys[i], polys[j]), abs=1e-9
            )

    def test_native_close_matches_batch_threshold(self):
        """The native early-exit proximity kernel agrees with the exact
        batched distance + threshold comparison, including thresholds
        straddling the true distance (ties count as close, like
        shapely's buffer().intersects())."""
        from pero_ocr_tpu.core import geometry
        from pero_ocr_tpu.utils import native

        rng = np.random.default_rng(1)
        polys = [
            rng.uniform(0, 100, (int(n), 2))
            for n in rng.integers(3, 9, size=8)
        ]
        pairs = np.array(
            [[i, j] for i in range(8) for j in range(i + 1, 8)], np.int32
        )
        dists = geometry.polygon_min_distance_batch(polys, pairs)
        # Exact ties at the last ulp can flip between the squared
        # (native) and unsquared comparison; probe just off the tie.
        for scale in (0.5, 1.0 - 1e-9, 1.0 + 1e-9, 2.0):
            thr = np.maximum(dists * scale, 1e-9)
            close = native.native_polygons_close(polys, pairs, thr)
            if close is None:
                pytest.skip("native library not built")
            np.testing.assert_array_equal(close, dists <= thr)


class TestSeparatorPenalty:
    def test_penalty_reads_band_mass(self):
        """The vectorized penalty equals mean separator mass along the
        3-row band of the shifted baseline."""
        from pero_ocr_tpu.layout_engines.cnn_engine import ParagraphClusterer

        cl = ParagraphClusterer(0.3)
        sep = np.zeros((40, 100), np.float32)
        sep[19:22, :] = 1.0   # full-width wall rows 19..21
        baseline = np.array([[10.0, 15.0], [90.0, 15.0]])
        # shift +5 -> band rows 19,20,21 exactly on the wall.
        p = cl.get_penalty(baseline, 5, 10, 90, sep)
        assert p == pytest.approx(3.0, rel=0.05)   # 3 rows of mass 1
        # shift 0 -> band rows 14..16, empty.
        assert cl.get_penalty(baseline, 0, 10, 90, sep) == pytest.approx(0.0)
        # columns outside the baseline span contribute nothing.
        p_wide = cl.get_penalty(baseline, 5, 0, 100, sep)
        assert p_wide < p
