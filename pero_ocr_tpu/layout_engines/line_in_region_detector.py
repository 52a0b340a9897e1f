"""Straight-line detection inside a known region from ParseNet maps.

Capability-equivalent to the reference
(reference: pero_ocr/layout_engines/line_in_region_detector.py:8-122):
PCA of the baseline-channel contours gives the dominant text direction;
the region maps are rotated into that frame; row projections of the
baseline channel are peak-picked with subpixel parabola refinement;
heights come from the 70th percentile of the height channels along each
baseline row.
"""

from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np
from scipy import signal

from pero_ocr_tpu.layout_engines import helpers


def find_peaks(array: np.ndarray, min_distance=1, min_height=0.05):
    """Integer + subpixel (parabola-fit) peak positions
    (reference: line_in_region_detector.py:103-122)."""
    peaks, _ = signal.find_peaks(array, distance=min_distance, height=min_height)
    peaks_float = peaks.astype(float).copy()
    for i, x in enumerate(peaks):
        xs = np.clip(np.arange(x - 2, x + 3), 0, array.shape[0] - 1)
        ys = array[xs]
        p = np.polyfit(xs, ys, 2)
        if abs(p[0]) > 1e-12:
            peaks_float[i] = -p[1] / (2 * p[0])
    return peaks, peaks_float


def detect_lines_in_region(
    region: np.ndarray,
    detection_maps: np.ndarray,
    downsample: float,
    line_detection_threshold: float = 0.2,
):
    """Returns (baselines, heights, textlines) for straight lines inside
    `region` (page coordinates)."""
    region = np.asarray(region, dtype=float)
    region_polygon = np.stack(
        [
            np.clip(region[:, 0] / downsample, 1, detection_maps.shape[1] - 2),
            np.clip(region[:, 1] / downsample, 1, detection_maps.shape[0] - 2),
        ],
        axis=1,
    )
    bb_lt = np.round(region_polygon.min(axis=0) - 1).astype(np.int32)
    bb_rb = np.round(region_polygon.max(axis=0) + 1).astype(np.int32)
    region_maps = detection_maps[bb_lt[1]:bb_rb[1], bb_lt[0]:bb_rb[0]].copy()
    region_polygon = region_polygon - bb_lt[None, :]

    polygon_mask = np.zeros(region_maps.shape[:2], dtype=np.float32)
    cv2.fillPoly(polygon_mask, [np.round(region_polygon).astype(np.int32)], 1.0)
    region_maps = region_maps * polygon_mask[:, :, None]

    # Dominant direction by PCA over baseline-channel contours.
    contours, _ = cv2.findContours(
        (region_maps[:, :, 2] > line_detection_threshold).astype(np.uint8),
        cv2.RETR_TREE,
        cv2.CHAIN_APPROX_SIMPLE,
    )
    cov = np.zeros((2, 2))
    for contour in contours:
        pts = contour[:, 0].astype(float)
        centered = pts - pts.mean(axis=0)
        cov += centered.T @ centered
    eig_val, eig_vec = np.linalg.eig(cov)
    direction = eig_vec[:, np.argmax(eig_val)]
    if direction[0] < 0:
        direction = -direction
    rad_angle = np.arctan2(direction[1], direction[0])

    # Rotate the maps into text-aligned frame.
    center = tuple(np.asarray(region_maps.shape[:2], dtype=float) * 0.5)
    T = cv2.getRotationMatrix2D(center, -rad_angle / np.pi * 180, 1)
    T = np.concatenate([T, np.array([[0, 0, 1]])], axis=0)

    transformed_polygon = cv2.transform(region_polygon[None], T[:2, :])[0]
    lt = transformed_polygon.min(axis=0)
    rb = transformed_polygon.max(axis=0)
    T = T @ np.array([[1, 0, -lt[0]], [0, 1, -lt[1]], [0, 0, 1]])
    output_size = tuple((rb - lt + 1).astype(int))
    if output_size[0] < 2 or output_size[1] < 2:
        return [], [], []

    region_map = cv2.warpAffine(region_maps[:, :, :3], T[:2, :], output_size)
    polygon_mask = cv2.warpAffine(polygon_mask, T[:2, :], output_size)

    baseline_channel = region_map[:, :, 2]
    baseline_channel[baseline_channel < line_detection_threshold] = 0
    projections = baseline_channel.sum(axis=1) / output_size[0]

    inside = polygon_mask > 0
    if not inside.any():
        return [], [], []
    mean_height = np.average(
        (region_map[:, :, 0] + region_map[:, :, 1])[inside]
    )
    rows, rows_float = find_peaks(
        projections, min_distance=max(0.7 * mean_height, 1)
    )
    if rows.shape[0] == 0:
        return [], [], []

    x0 = np.argmax(polygon_mask, axis=1)[rows]
    x1 = (polygon_mask.shape[1] - np.argmax(polygon_mask[:, ::-1], axis=1))[rows]

    baselines = np.stack(
        [
            np.stack([x0, x1], axis=1),
            np.stack([rows_float, rows_float], axis=1),
        ],
        axis=2,
    ).astype(np.float32)
    baselines = cv2.transform(baselines, np.linalg.inv(T)[:2, :])
    baselines = (baselines + bb_lt[None, :] + 1) * downsample
    b_list: List[np.ndarray] = list(baselines)

    h_list = []
    for row in rows:
        selected = region_map[row, :, 2] > line_detection_threshold
        if not selected.any():
            h_list.append([mean_height * downsample, mean_height * downsample / 3])
            continue
        asc = np.percentile(region_map[row, :, 0][selected], 70)
        desc = np.percentile(region_map[row, :, 1][selected], 70)
        h_list.append([asc * downsample, desc * downsample])

    t_list = [
        helpers.baseline_to_textline(b, h) for b, h in zip(b_list, h_list)
    ]
    return b_list, h_list, t_list
