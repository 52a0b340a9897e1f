"""Debug rendering of a page layout into an image
(reference: pero_ocr/core/layout.py:737-771, :850-874)."""

from __future__ import annotations

from typing import Sequence, Tuple

import cv2
import numpy as np


def draw_polyline(
    image: np.ndarray,
    points: np.ndarray,
    color: Tuple[int, int, int],
    close: bool = False,
    thickness: int = 2,
    endpoint_circles: bool = False,
) -> None:
    pts = np.round(np.asarray(points)).astype(np.int32).reshape(-1, 1, 2)
    if len(pts) >= 2:
        cv2.polylines(image, [pts], close, color, thickness=thickness)
    if endpoint_circles and len(pts):
        cv2.circle(image, tuple(pts[0, 0]), 3, color, 4)
        cv2.circle(image, tuple(pts[-1, 0]), 3, color, 4)


def render_layout(
    layout,
    image: np.ndarray,
    thickness: int = 2,
    circles: bool = True,
    render_order: bool = False,
) -> np.ndarray:
    for region in layout.regions:
        for line in region.lines:
            if line.baseline is not None:
                draw_polyline(
                    image, line.baseline, (0, 0, 255),
                    thickness=thickness, endpoint_circles=circles,
                )
            if line.polygon is not None:
                draw_polyline(
                    image, line.polygon, (0, 255, 0), close=True, thickness=thickness
                )
        if region.polygon is not None:
            draw_polyline(
                image, region.polygon, (255, 0, 0), close=True,
                thickness=thickness, endpoint_circles=circles,
            )

    if render_order:
        font = cv2.FONT_HERSHEY_DUPLEX
        font_scale = 4
        font_thickness = 5
        for idx, region in enumerate(layout.regions):
            poly = np.asarray(region.polygon)
            lo = poly.min(axis=0)
            hi = poly.max(axis=0)
            (text_w, text_h), _ = cv2.getTextSize(
                str(idx), font, font_scale, font_thickness
            )
            mid = (
                int((lo[0] + hi[0]) // 2 - text_w // 2),
                int((lo[1] + hi[1]) // 2 + text_h // 2),
            )
            cv2.putText(
                image, str(idx), mid, font, font_scale, (0, 0, 0),
                thickness=font_thickness, lineType=cv2.LINE_AA,
            )
    return image
