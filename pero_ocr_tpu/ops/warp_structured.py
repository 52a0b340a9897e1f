"""Structured (gather-free) line-crop warp.

XLA's elementwise gather executes ~80M samples/s on this TPU — the
per-page bilinear warp (~21M taps) costs ~100ms and dominates the device
pipeline.  This module replaces it with a *structured* resample built
entirely from ops the MXU/VPU run at full rate, fully batched over
(line, column-chunk) blocks:

1. rectangular source blocks come from ONE batched block-granular gather
   (``vmap(dynamic_slice)`` — contiguous copies, not scalar loads);
2. horizontal resampling to the output column grid is a banded
   interpolation matrix contracted on the MXU (one batched einsum);
3. vertical resampling is a second batched einsum with per-(row, column)
   2-tap weights;
4. the residual per-row horizontal shift from baseline tilt (the
   normal's x-component) is applied with a small set of masked rolls.

Semantics match :func:`pero_ocr_tpu.ops.warp.warp_lines_xla` (itself
matching cv2.remap BORDER_CONSTANT) up to linear-interpolation
associativity: bit-exact for straight lines, mean error <0.5 intensity
steps for tilted/curved lines (chunk-edge columns of strongly tilted
lines may roll-wrap; bounded by MAX_SHIFT columns per chunk edge).

Constraints (see :func:`structured_warp_supported`; lines outside fall
back to the gather path):
- vertical span ``asc + desc`` <= BLOCK_H - 10 source pixels,
- source column spacing ``(asc+desc)/target_height`` <= 1.5.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 128          # output columns per block
BLOCK_H = 96         # source rows per block
BLOCK_W = 224        # source cols per block (CHUNK * max spacing + margins)
MAX_SHIFT = 4        # max per-row tilt shift in output columns


def _interp_segments(t: jnp.ndarray, xp: jnp.ndarray,
                     fp: jnp.ndarray) -> jnp.ndarray:
    """Gather-free piecewise-linear interpolation on a sorted grid.

    ``jnp.interp`` lowers to searchsorted + gather; elementwise gather
    runs at only ~80M taps/s on this TPU and dominated the whole warp
    kernel.  For monotone ``xp`` the same function has an exact
    segment-sum identity (incl. np.interp's endpoint clamping):

        f(t) = fp[0] + sum_i slope_i * clip(t - xp[i], 0, seg_i)

    which is one (T, P-1) clip + one tiny matmul — no gather at all."""
    seg = xp[1:] - xp[:-1]
    slope = (fp[1:] - fp[:-1]) / jnp.maximum(seg, 1e-12)
    contrib = jnp.clip(t[:, None] - xp[None, :-1], 0.0, seg[None, :])
    return fp[0] + contrib @ slope


def _line_geometry(baseline: jnp.ndarray, heights: jnp.ndarray,
                   target_height: int, bucket: int):
    """Per-output-column centers/normals on the arc-uniform grid (same
    construction as warp.build_fields_device)."""
    x = baseline[:, 0]
    y = baseline[:, 1]
    seg = jnp.hypot(jnp.diff(x), jnp.diff(y))
    arc = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    total = arc[-1]

    scale = target_height / jnp.maximum(heights[0] + heights[1], 1e-6)
    spacing = 1.0 / scale  # source px per output column
    t = jnp.arange(bucket, dtype=jnp.float32) * spacing
    valid = (t <= total).astype(jnp.float32)

    cx = _interp_segments(t, arc, x)
    cy = _interp_segments(t, arc, y)
    dx = jnp.gradient(cx)
    dy = jnp.gradient(cy)
    norm = jnp.maximum(jnp.hypot(dx, dy), 1e-6)
    nx = -dy / norm
    ny = dx / norm
    return cx, cy, nx, ny, valid, spacing


@functools.partial(jax.jit, static_argnames=("target_height", "bucket"))
def warp_lines_structured(
    page: jnp.ndarray,
    baselines: jnp.ndarray,
    heights: jnp.ndarray,
    target_height: int,
    bucket: int,
) -> jnp.ndarray:
    """Gather-free batched line warp.

    Args:
        page: (H, W, 3) page image (uint8 or float32).
        baselines: (N, P, 2) resampled baseline points.
        heights: (N, 2) [asc, desc] (already scaled).

    Returns (N, target_height, bucket, 3) float32 crops."""
    h_img, w_img, _ = page.shape
    n = baselines.shape[0]
    n_chunks = bucket // CHUNK
    nk = n * n_chunks
    ht = target_height

    baselines = baselines.astype(jnp.float32)
    heights = heights.astype(jnp.float32)

    # bf16 operands halve interpolation-tensor HBM traffic on TPU; the CPU
    # backend has no bf16 dot support.
    compute_dtype = (
        jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    )

    cx, cy, nx, ny, valid, spacing = jax.vmap(
        lambda b, h: _line_geometry(b, h, ht, bucket)
    )(baselines, heights)

    # Flatten (line, chunk) into one batch axis.  Chunks OVERLAP by
    # MAX_SHIFT columns on each side so the per-row tilt rolls in pass 4
    # have real neighbor data instead of wrapping; the center CHUNK
    # columns are sliced out at the end.
    cw = CHUNK + 2 * MAX_SHIFT

    def chunked(a):
        # Overlapping windows at a static stride: plain slices, no gather.
        padded = jnp.pad(a, ((0, 0), (MAX_SHIFT, MAX_SHIFT)), mode="edge")
        windows = jnp.stack(
            [padded[:, i * CHUNK : i * CHUNK + cw] for i in range(n_chunks)],
            axis=1,
        )  # (N, K, CW)
        return windows.reshape(nk, cw)

    cx_c, cy_c = chunked(cx), chunked(cy)
    nx_c, ny_c, valid_c = chunked(nx), chunked(ny), chunked(valid)

    v = jax.vmap(
        lambda h: jnp.linspace(-h[0], h[1], ht)
    )(heights)                                          # (N, H)
    v_c = jnp.repeat(v, n_chunks, axis=0)               # (NK, H)
    spacing_c = jnp.repeat(spacing, n_chunks)           # (NK,)

    denom = jnp.maximum(valid_c.sum(axis=1), 1.0)
    nxm = (nx_c * valid_c).sum(axis=1) / denom          # (NK,)
    nym = (ny_c * valid_c).sum(axis=1) / denom
    nym = jnp.where(jnp.abs(nym) < 0.5, 1.0, nym)

    first_valid = jnp.argmax(valid_c > 0, axis=1)       # (NK,)
    onehot = (
        jnp.arange(cw)[None, :] == first_valid[:, None]
    ).astype(jnp.float32)                                # gather-free pick
    anchor_x = (cx_c * onehot).sum(axis=1)
    anchor_y = (cy_c * onehot).sum(axis=1)
    cy_for_min = jnp.where(valid_c > 0, cy_c, anchor_y[:, None])

    x_lo = anchor_x + jnp.min(v_c, axis=1) * nxm - 4.0
    y_lo = jnp.min(cy_for_min, axis=1) - heights.repeat(n_chunks, axis=0)[:, 0] - 4.0
    x0c = jnp.clip(
        jnp.floor(x_lo).astype(jnp.int32), 0, max(w_img - BLOCK_W, 0)
    )
    y0c = jnp.clip(
        jnp.floor(y_lo).astype(jnp.int32), 0, max(h_img - BLOCK_H, 0)
    )

    # 1. One batched block gather (contiguous slices).
    blocks = jax.vmap(
        lambda y0, x0: jax.lax.dynamic_slice(
            page, (y0, x0, 0), (BLOCK_H, BLOCK_W, 3)
        )
    )(y0c, x0c).astype(jnp.float32)                     # (NK, BH, BW, 3)

    # 2. Horizontal resample (banded linear kernel, MXU batch matmul).
    px = cx_c - x0c[:, None].astype(jnp.float32)        # (NK, CHUNK)
    w_idx = jnp.arange(BLOCK_W, dtype=jnp.float32)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(w_idx[None, :, None] - px[:, None, :])
    )                                                    # (NK, BW, CHUNK)
    in_x = (cx_c >= 0) & (cx_c <= w_img - 1)
    wx = wx * (in_x[:, None, :] & (valid_c[:, None, :] > 0))
    x1 = jnp.einsum(
        "bywc,bwj->byjc",
        blocks.astype(compute_dtype),
        wx.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )                                                    # (NK, BH, CHUNK, 3)

    # 3. Vertical resample with per-column offsets.
    src_y = cy_c[:, None, :] + v_c[:, :, None] * nym[:, None, None]  # (NK, H, CHUNK)
    py = src_y - y0c[:, None, None].astype(jnp.float32)
    y_idx = jnp.arange(BLOCK_H, dtype=jnp.float32)
    wv = jnp.maximum(
        0.0, 1.0 - jnp.abs(y_idx[None, None, :, None] - py[:, :, None, :])
    )                                                    # (NK, H, BH, CHUNK)
    in_y = (src_y >= 0) & (src_y <= h_img - 1)
    wv = wv * in_y[:, :, None, :]
    x2 = jnp.einsum(
        "bryj,byjc->brjc",
        wv.astype(compute_dtype),
        x1.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )                                                    # (NK, H, CHUNK, 3)

    # 4. Per-row tilt shift (v_r * nx in output-column units).
    shift = v_c * nxm[:, None] / spacing_c[:, None]      # (NK, H)
    k = jnp.clip(
        jnp.floor(shift).astype(jnp.int32), -MAX_SHIFT, MAX_SHIFT - 1
    )
    frac = jnp.clip(shift - k.astype(jnp.float32), 0.0, 1.0)

    out = jnp.zeros_like(x2)
    for delta in range(-MAX_SHIFT, MAX_SHIFT):
        sel = (k == delta).astype(jnp.float32)[:, :, None, None]
        contrib = (
            jnp.roll(x2, -delta, axis=2) * (1.0 - frac)[:, :, None, None]
            + jnp.roll(x2, -delta - 1, axis=2) * frac[:, :, None, None]
        )
        out = out + sel * contrib

    out = out * valid_c[:, None, :, None]
    out = out[:, :, MAX_SHIFT : MAX_SHIFT + CHUNK]  # drop chunk overlap
    out = out.reshape(n, n_chunks, ht, CHUNK, 3)
    return jnp.moveaxis(out, 1, 2).reshape(n, ht, bucket, 3)


def structured_warp_supported(
    heights: np.ndarray,
    target_height: int,
    baselines: np.ndarray = None,
) -> np.ndarray:
    """Bool per line: fits the structured path's block budgets.

    With ``baselines`` (N, P, 2) given, also rejects lines whose tilt
    would shift rows beyond the MAX_SHIFT roll budget (pass 4): the
    per-row horizontal shift is ``|v| * |nx| / spacing`` output columns
    with ``|v| <= max(asc, desc)`` and ``|nx| ~ |sin(tilt)|`` from the
    baseline chord; beyond MAX_SHIFT-1 the shift clamps and smears the
    crop's top/bottom rows (quantified in
    tests/test_warp_structured.py::TestTiltQuantification)."""
    heights = np.asarray(heights)
    span = heights[:, 0] + heights[:, 1]
    spacing = np.maximum(span / target_height, 1e-6)
    ok = (span <= BLOCK_H - 10) & (spacing <= (BLOCK_W - 32) / CHUNK)
    if baselines is not None:
        baselines = np.asarray(baselines, float)
        chord = baselines[:, -1] - baselines[:, 0]
        clen = np.maximum(np.hypot(chord[:, 0], chord[:, 1]), 1e-6)
        nx = np.abs(chord[:, 1]) / clen           # |sin(tilt)|
        max_v = np.maximum(heights[:, 0], heights[:, 1])
        max_shift = max_v * nx / spacing
        ok = ok & (max_shift <= MAX_SHIFT - 1)
    return ok
