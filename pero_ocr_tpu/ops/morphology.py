"""XLA map post-processing ops for layout detection.

Device-side replacements for the host scipy/cv2 morphology the reference
runs over full-page ParseNet maps
(reference: pero_ocr/layout_engines/cnn_layout_engine.py:141-153, :374-387):
grey dilation / binary dilation via ``lax.reduce_window`` max, smoothing
via depthwise convolution, vertical non-maxima suppression as an
equality-with-window-max test.  Connected-component labeling stays on
host (scipy.ndimage.label) — it is O(#line pixels), tiny next to the
map compute, and inherently sequential.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _max_window(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """Max filter with a (wh, ww) window, SAME padding."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(wh, ww),
        window_strides=(1, 1),
        padding="SAME",
    )


@functools.partial(jax.jit, static_argnames=("size_h", "size_w"))
def grey_dilation(x: jnp.ndarray, size_h: int = 7, size_w: int = 9) -> jnp.ndarray:
    return _max_window(x, size_h, size_w)


@functools.partial(jax.jit, static_argnames=("size",))
def binary_dilation(x: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    return _max_window(x.astype(jnp.float32), size, size) > 0


@functools.partial(jax.jit, static_argnames=("size",))
def box_smooth(x: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """Mean filter via separable convolution (SAME)."""
    kernel = jnp.ones((size,), jnp.float32) / size
    x = x.astype(jnp.float32)
    # Horizontal then vertical 1D convs.
    x2 = x[None, None]  # (1, 1, H, W)
    kh = kernel[None, None, None, :]
    kv = kernel[None, None, :, None]
    x2 = jax.lax.conv_general_dilated(x2, kh, (1, 1), "SAME")
    x2 = jax.lax.conv_general_dilated(x2, kv, (1, 1), "SAME")
    return x2[0, 0]


@functools.partial(jax.jit, static_argnames=("window",))
def vertical_nonmaxima_suppression(
    x: jnp.ndarray, window: int = 5
) -> jnp.ndarray:
    """Keep values that are the maximum of their vertical neighborhood
    (reference: cnn_layout_engine.py:374-387 uses element shifts; this is
    the same predicate as a window-max equality test)."""
    vmax = _max_window(x, window, 1)
    return jnp.where(x == vmax, x, 0.0)


def connected_components(mask: np.ndarray) -> tuple:
    """Host-side connected components labeling (8-connectivity).

    Returns (labels, num).  Tries the native C++ runtime first, then
    scipy."""
    try:
        from pero_ocr_tpu.utils.native import native_label

        out = native_label(np.ascontiguousarray(mask.astype(np.uint8)))
        if out is not None:
            return out
    except Exception:
        pass
    from scipy import ndimage

    labels, num = ndimage.label(np.asarray(mask), structure=np.ones((3, 3)))
    return labels, num
