"""ParseNet / OrientationNet inference wrappers.

Equivalent of the reference's TorchScript wrappers
(reference: pero_ocr/layout_engines/torch_parsenet.py:20-127): adaptive
two-pass downsampling targeting a 12px median line height, a
``max_megapixels`` memory cap, pad-to-multiple-of-64 canvases.

TPU-first: the canvas side lengths are bucketed to multiples of 64 (as
in the reference) AND snapped to a small ladder so repeated pages reuse
compiled programs; the forward is jitted once per canvas shape.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.models.parsenet import OrientationNet, ParseNet
from pero_ocr_tpu.utils.checkpoint import load_or_init

logger = logging.getLogger(__name__)


def _pad_to_canvas(img: np.ndarray, multiple: int = 64) -> Tuple[np.ndarray, int, int]:
    h, w = img.shape[:2]
    ch = int(np.ceil(h / multiple) * multiple)
    cw = int(np.ceil(w / multiple) * multiple)
    canvas = np.zeros((ch, cw, 3), dtype=img.dtype)
    canvas[:h, :w] = img
    return canvas, h, w


class ParseNetWrapper:
    """Layout-map inference with adaptive resolution."""

    DOWNSAMPLE_ADAPT_PIXEL_THRESHOLD = 100
    MIN_LINE_HEIGHT = 9
    MAX_LINE_HEIGHT = 15
    OPTIMAL_LINE_HEIGHT = 12
    MIN_DOWNSAMPLE = 1
    MAX_DOWNSAMPLE = 8

    def __init__(
        self,
        model_path: Optional[str] = None,
        downsample: int = 4,
        max_mp: float = 5,
        detection_threshold: float = 0.2,
        adaptive_downsample: bool = True,
        base_features: int = 32,
        depth: int = 4,
        stem: str = "conv",
        out_upsample: int = 1,
    ):
        self.detection_threshold = detection_threshold
        self.adaptive_downsample = adaptive_downsample
        self.init_downsample = downsample
        self.last_downsample = downsample
        self.max_megapixels = max_mp

        from pero_ocr_tpu.utils.ts_adapters import (
            TSParseNetModel, is_torchscript_file,
        )

        if model_path and is_torchscript_file(model_path):
            # The reference's own distribution format: an opaque
            # TorchScript archive (torch_parsenet.py:15).  The serialized
            # graph converts directly to a jittable JAX function
            # (utils/ts_graph.py) — no architecture source needed.
            self.model = TSParseNetModel.load(model_path)
            self.variables = self.model.variables
        else:
            self.model = ParseNet(
                base_features=base_features, depth=depth, stem=stem,
                out_upsample=out_upsample,
            )

            def init_fn():
                rng = jax.random.PRNGKey(0)
                return self.model.init(
                    rng, jnp.zeros((1, 64, 64, 3), jnp.float32)
                )

            self.variables = load_or_init(model_path, init_fn, name="ParseNet")
        self._forward = jax.jit(
            lambda images: self.model.apply(self.variables, images)
        )

    def get_maps(self, img: np.ndarray, downsample: float) -> np.ndarray:
        """One inference pass at 1/downsample MAP scale; returns (h, w, 5)
        maps at that resolution (reference: torch_parsenet.py:37-58).
        Super-resolving models (ParseNet.out_upsample = U > 1) read a
        1/(downsample*U) canvas and emit the same-scale maps — the
        external contract is unchanged."""
        up = int(getattr(self.model, "out_upsample", 1) or 1)
        input_scale = downsample * up
        if input_scale != 1:
            img = cv2.resize(
                img, (0, 0), fx=1 / input_scale, fy=1 / input_scale,
                interpolation=cv2.INTER_AREA,
            )
        canvas, h, w = _pad_to_canvas(img)
        batch = (canvas[None].astype(np.float32)) / 255.0
        out = np.asarray(self._forward(jnp.asarray(batch)))[0]
        return out[: h * up, : w * up]

    def get_maps_with_optimal_resolution(
        self, img: np.ndarray
    ) -> Tuple[np.ndarray, float]:
        """Two-pass adaptive inference: rerun at the downsample that brings
        the median detected line height to ~12px
        (reference: torch_parsenet.py:60-93)."""
        mp_cap = np.sqrt(
            (img.shape[0] * img.shape[1]) / (self.max_megapixels * 1e6)
        )
        first_downsample = max(self.last_downsample, mp_cap)
        net_downsample = first_downsample
        out_map = self.get_maps(img, net_downsample)
        if not self.adaptive_downsample:
            return out_map, net_downsample

        detected = (out_map[:, :, 2] > self.detection_threshold).sum()
        if detected > self.DOWNSAMPLE_ADAPT_PIXEL_THRESHOLD:
            med_height = self.get_med_height(out_map)
            if (
                med_height > self.MAX_LINE_HEIGHT
                or med_height < self.MIN_LINE_HEIGHT
            ):
                second = first_downsample * (
                    med_height / self.OPTIMAL_LINE_HEIGHT
                )
                second = float(
                    np.clip(second, self.MIN_DOWNSAMPLE, self.MAX_DOWNSAMPLE)
                )
                self.last_downsample = second
                second = max(second, mp_cap)
                ratio = second / first_downsample
                if ratio < 0.8 or ratio > 1.2:
                    net_downsample = second
                    out_map = self.get_maps(img, net_downsample)
        return out_map, net_downsample

    def get_med_height(self, out_map: np.ndarray) -> float:
        heights = (
            out_map[:, :, 2] > self.detection_threshold
        ).astype(float) * out_map[:, :, 0]
        positive = heights[heights > 0]
        return float(np.median(positive)) if positive.size else 0.0


class OrientationNetWrapper:
    """Per-pixel text-direction inference
    (reference: torch_parsenet.py:105-127)."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        max_mp: float = 5,
        base_features: int = 16,
        depth: int = 3,
    ):
        self.max_megapixels = max_mp
        self.model = OrientationNet(base_features=base_features, depth=depth)

        def init_fn():
            rng = jax.random.PRNGKey(0)
            return self.model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))

        self.variables = load_or_init(model_path, init_fn, name="OrientationNet")
        self._forward = jax.jit(
            lambda images: self.model.apply(self.variables, images)
        )

    def get_maps(self, img: np.ndarray, downsample: float) -> np.ndarray:
        if downsample != 1:
            img = cv2.resize(
                img, (0, 0), fx=1 / downsample, fy=1 / downsample,
                interpolation=cv2.INTER_AREA,
            )
        canvas, h, w = _pad_to_canvas(img)
        batch = canvas[None].astype(np.float32) / 256.0
        out = np.asarray(self._forward(jnp.asarray(batch)))[0]
        return out[:h, :w]
