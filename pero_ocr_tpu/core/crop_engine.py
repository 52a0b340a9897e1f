"""Line crop engine: dewarp curved lines to height-normalized strips.

API-compatible with the reference cropper
(reference: pero_ocr/core/crop_engine.py:8-163): ``crop``,
``get_crop_inputs``, ``fast_remap``, ``reverse_xy_mapping``, ``blend_in``.
The warp-field construction is the vectorized
:func:`pero_ocr_tpu.core.line_geometry.warp_field`.

Two execution paths:
- host path (this class): per-line ``cv2.remap`` — used by small-N
  consumers (baseline refinement, ALTO word geometry, debugging);
- device path: the orchestrator batches all lines of a page into ONE
  gather via :mod:`pero_ocr_tpu.ops.warp` (see
  ``document.page_parser.LineCropper``).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import cv2
import numpy as np
from scipy import ndimage

from pero_ocr_tpu.core import line_geometry

logger = logging.getLogger(__name__)


class EngineLineCropper:
    def __init__(
        self,
        correct_slant: bool = False,
        line_height: int = 32,
        poly: int = 0,
        scale: float = 1,
        blend_border: int = 4,
    ):
        self.correct_slant = correct_slant
        self.line_height = line_height
        self.poly = poly
        self.scale = scale
        self.blend_border = blend_border

    # ------------------------------------------------------------------
    def get_crop_inputs(self, baseline, line_heights, target_height) -> np.ndarray:
        """Dense (target_height, W, 2) source-coordinate field."""
        return line_geometry.warp_field(
            baseline, line_heights, target_height, poly=self.poly, scale=self.scale
        )

    def crop(
        self,
        img: np.ndarray,
        baseline,
        heights,
        return_mapping: bool = False,
        return_forward_mapping: bool = False,
    ):
        try:
            field = self.get_crop_inputs(baseline, heights, self.line_height)
            line_crop = self.fast_remap(img, field)
        except Exception:
            logger.error("line crop failed. %s %s", heights, baseline)
            line_crop = np.zeros(
                [self.line_height, 32, img.shape[2]], dtype=np.uint8
            )
            field = None

        if return_mapping:
            mapping, offset = self.reverse_xy_mapping(field, img.shape)
            return line_crop, mapping, offset
        if return_forward_mapping:
            return line_crop, field
        return line_crop

    def fast_remap(self, img: np.ndarray, field: np.ndarray) -> np.ndarray:
        """Bilinear gather restricted to the field's bounding box
        (reference: crop_engine.py:146-163)."""
        x_min = int(np.floor(field[:, :, 0].min()))
        x_max = int(np.ceil(field[:, :, 0].max()))
        y_min = int(np.floor(field[:, :, 1].min()))
        y_max = int(np.ceil(field[:, :, 1].max()))

        if (
            x_min < 0
            or y_min < 0
            or x_max > img.shape[1] - 1
            or y_max > img.shape[0] - 1
        ):
            return cv2.remap(
                img, field[:, :, 0], field[:, :, 1],
                interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
            )
        crop = img[y_min : y_max + 1, x_min : x_max + 1]
        return cv2.remap(
            crop,
            field[:, :, 0] - x_min,
            field[:, :, 1] - y_min,
            interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
        )

    # ------------------------------------------------------------------
    def reverse_xy_mapping(
        self, field: np.ndarray, shape
    ) -> Tuple[np.ndarray, Tuple[int, int]]:
        """Build the inverse (page -> crop) mapping for re-compositing a
        processed crop back into the page
        (reference: crop_engine.py:114-144).  Vectorized scatter."""
        up = 4  # supersample the forward field to densify the scatter
        y_map = np.clip(
            cv2.resize(field[:, :, 1], (0, 0), fx=up, fy=up,
                       interpolation=cv2.INTER_LINEAR),
            0, shape[0] - 1,
        )
        x_map = np.clip(
            cv2.resize(field[:, :, 0], (0, 0), fx=up, fy=up,
                       interpolation=cv2.INTER_LINEAR),
            0, shape[1] - 1,
        )
        y_idx = np.round(y_map).astype(int)
        x_idx = np.round(x_map).astype(int)
        y_start, y_stop = y_idx.min(), y_idx.max() + 1
        x_start, x_stop = x_idx.min(), x_idx.max() + 1

        # Source (crop) coordinates for every supersampled cell.
        src_y = cv2.resize(
            np.tile(
                np.arange(field.shape[0], dtype=np.float32)[:, None],
                (1, field.shape[1]),
            ),
            (0, 0), fx=up, fy=up, interpolation=cv2.INTER_LINEAR,
        )
        src_x = cv2.resize(
            np.tile(
                np.arange(field.shape[1], dtype=np.float32)[None, :],
                (field.shape[0], 1),
            ),
            (0, 0), fx=up, fy=up, interpolation=cv2.INTER_LINEAR,
        )

        reverse = np.full(
            (y_stop - y_start, x_stop - x_start, 2), -1, dtype=np.float32
        )
        reverse[y_idx - y_start, x_idx - x_start, 0] = src_x
        reverse[y_idx - y_start, x_idx - x_start, 1] = src_y
        return reverse, (int(y_start), int(x_start))

    def get_blend_mask(self, mapping: np.ndarray) -> np.ndarray:
        mask = mapping[:, :, 0] > -1
        b = self.blend_border
        mask = np.pad(mask, ((b, b), (b, b)))
        mask = ndimage.uniform_filter(mask.astype(float), size=2 * b + 1)
        mask = mask[b:-b, b:-b]
        mask = 2 * np.clip(mask - 0.5, 0, 1)
        return mask[:, :, np.newaxis]

    def blend_in(self, img, line_crop, mapping, offset):
        """Composite a (possibly modified) crop back into the page with a
        soft border (reference: crop_engine.py:32-52)."""
        y0, x0 = offset
        y1 = y0 + mapping.shape[0]
        x1 = x0 + mapping.shape[1]

        blended = img[y0:y1, x0:x1].copy()
        mask = self.get_blend_mask(mapping)
        cv2.remap(
            line_crop, mapping[:, :, 0], mapping[:, :, 1],
            interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_TRANSPARENT, dst=blended,
        )
        blended = np.round(
            (1 - mask) * img[y0:y1, x0:x1] + mask * blended
        ).astype(np.uint8)
        img[y0:y1, x0:x1] = blended
        return img
