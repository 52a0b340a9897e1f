"""Classical region detection by thresholding + morphology.

Capability-equivalent to the reference
(reference: pero_ocr/layout_engines/simple_region_engine.py:9-137):
downscale, denoise, adaptive threshold, morphological close, distance
transform, connected components, simplified contour polygons.
"""

from __future__ import annotations

from typing import List

import cv2
import numpy as np

from pero_ocr_tpu.core import geometry
from pero_ocr_tpu.core.layout import PageLayout, RegionLayout


class SimpleThresholdRegion:
    def __init__(self, config=None, config_path: str = ""):
        pass

    def process_page(self, img: np.ndarray, page_layout: PageLayout) -> PageLayout:
        polygons = self._compute_layout(img)
        page_layout.regions = [
            RegionLayout(f"r-{idx}", polygon)
            for idx, polygon in enumerate(polygons)
        ]
        return page_layout

    @staticmethod
    def _compute_layout(
        img: np.ndarray,
        downscale: int = 4,
        open_kernel_size: int = 28,
        poly_simplify_tolerance: int = 20,
        denoising_strength: int = 20,
        border_dist: int = 45,
        threshold_block_size: int = 100,
        threshold_mean_subtract: int = 80,
        precise_envelope: bool = True,
        min_point_per_component: int = 100,
    ) -> List[np.ndarray]:
        """Returns region polygons as (N, 2) x,y arrays in original image
        coordinates."""
        if img.ndim > 2:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        img = cv2.resize(img, None, fx=1 / downscale, fy=1 / downscale)
        img = cv2.normalize(
            img, None, alpha=0, beta=255, norm_type=cv2.NORM_MINMAX,
            dtype=cv2.CV_8UC1,
        )

        # Pad with the (document-background) border median.
        border_vals = np.concatenate(
            [img[0, :], img[-1, :], img[:, 0], img[:, -1]]
        )
        median_val = float(max(np.median(border_vals), 100))
        h, w = img.shape
        pad_y, pad_x = h // 10, w // 10
        img = cv2.copyMakeBorder(
            img, pad_y, pad_y, pad_x, pad_x, cv2.BORDER_CONSTANT,
            value=median_val,
        )

        img = cv2.fastNlMeansDenoising(img, h=denoising_strength // downscale)

        block = threshold_block_size // downscale
        if block % 2 == 0:
            block += 1
        img = cv2.adaptiveThreshold(
            img, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY,
            block, threshold_mean_subtract,
        )
        img = 255 - img

        k = max(open_kernel_size // downscale, 1)
        closed = cv2.morphologyEx(img, cv2.MORPH_CLOSE, np.ones((k, k), np.uint8))

        dist = cv2.distanceTransform(255 - closed, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
        mask = (dist < border_dist // downscale).astype(np.uint8)

        num, labels = cv2.connectedComponents(mask, connectivity=8)

        regions: List[np.ndarray] = []
        min_points = min_point_per_component // downscale
        for label in range(1, num):
            component = (labels == label).astype(np.uint8)
            if component.sum() < min_points:
                continue
            contours, _ = cv2.findContours(
                component, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
            )
            if not contours:
                continue
            points = max(contours, key=cv2.contourArea).reshape(-1, 2)
            if len(points) < 3:
                continue
            if precise_envelope:
                poly = geometry.simplify_polygon(
                    points.astype(float), poly_simplify_tolerance // downscale
                )
            else:
                poly = geometry.convex_hull(points.astype(float))
            # Undo padding and downscale.
            poly = (poly - np.asarray([pad_x, pad_y])) * downscale
            regions.append(poly.astype(np.int32))
        return regions
