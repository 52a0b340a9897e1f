"""ctypes bindings for the native host runtime (native/libperotpu.so).

Every function has a pure-Python/scipy fallback at its call site; this
module returns None gracefully when the library is absent.  Build with
``make -C native``; the loader also triggers a build on first use when a
compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_LIB_DIR, "libperotpu.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _LIB_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        logger.debug("native build failed: %s", e)
        return False


def get_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    with _lock:
        if _lib is not None or _load_attempted:
            return _lib
        _load_attempted = True
        if not os.path.exists(_LIB_PATH):
            if not _try_build():
                logger.info(
                    "native library unavailable; using Python fallbacks"
                )
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("failed to load %s: %s", _LIB_PATH, e)
            return None

        lib.cc_label_u8.restype = ctypes.c_int32
        lib.cc_label_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.levenshtein_i32.restype = ctypes.c_int32
        lib.levenshtein_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.levenshtein_batch_i32.restype = None
        lib.levenshtein_batch_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.viterbi_ctc_f32.restype = ctypes.c_int32
        lib.viterbi_ctc_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ]
        try:
            lib.cc_baselines_f32.restype = None
            lib.cc_baselines_f32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
            ]
        except AttributeError:
            pass
        try:
            lib.separator_penalties_f32.restype = None
            lib.separator_penalties_f32.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
            ]
        except AttributeError:
            pass
        try:
            lib.cc_lines_packed.restype = ctypes.c_int32
            lib.cc_lines_packed.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
        except AttributeError:
            pass
        try:
            lib.polygons_close_f64.restype = None
            lib.polygons_close_f64.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
            ]
        except AttributeError:
            pass
        try:
            lib.warp_affine_lines_u8.restype = None
            lib.warp_affine_lines_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64,
            ]
        except AttributeError:
            # Stale library built before the warp kernel existed; the
            # warp helper degrades to the cv2 path.
            pass
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_label(mask: np.ndarray) -> Optional[Tuple[np.ndarray, int]]:
    """8-connectivity components; (labels, count) or None."""
    lib = get_library()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    labels = np.empty((h, w), dtype=np.int32)
    count = lib.cc_label_u8(
        _ptr(mask, ctypes.c_uint8), h, w, _ptr(labels, ctypes.c_int32)
    )
    return labels, int(count)


def native_levenshtein(a: Sequence[int], b: Sequence[int]) -> Optional[int]:
    lib = get_library()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.int32)
    b = np.ascontiguousarray(b, dtype=np.int32)
    return int(
        lib.levenshtein_i32(
            _ptr(a, ctypes.c_int32), len(a), _ptr(b, ctypes.c_int32), len(b)
        )
    )


def native_levenshtein_batch(
    seqs_a: List[Sequence[int]], seqs_b: List[Sequence[int]]
) -> Optional[np.ndarray]:
    lib = get_library()
    if lib is None:
        return None
    offsets_a = np.zeros(len(seqs_a) + 1, np.int32)
    offsets_b = np.zeros(len(seqs_b) + 1, np.int32)
    np.cumsum([len(s) for s in seqs_a], out=offsets_a[1:])
    np.cumsum([len(s) for s in seqs_b], out=offsets_b[1:])
    data_a = np.ascontiguousarray(
        np.concatenate([np.asarray(s, np.int32) for s in seqs_a])
        if offsets_a[-1] else np.zeros(1, np.int32)
    )
    data_b = np.ascontiguousarray(
        np.concatenate([np.asarray(s, np.int32) for s in seqs_b])
        if offsets_b[-1] else np.zeros(1, np.int32)
    )
    out = np.empty(len(seqs_a), np.int32)
    lib.levenshtein_batch_i32(
        _ptr(data_a, ctypes.c_int32), _ptr(offsets_a, ctypes.c_int32),
        _ptr(data_b, ctypes.c_int32), _ptr(offsets_b, ctypes.c_int32),
        len(seqs_a), _ptr(out, ctypes.c_int32),
    )
    return out


def native_warp_affine_lines(
    gray: np.ndarray, mats: np.ndarray, widths: np.ndarray,
    crop_h: int, out: np.ndarray, offsets: np.ndarray,
    stride_col: int, stride_row: int,
) -> bool:
    """Batched straight-line inverse-affine warp into a caller-owned
    buffer (the crop-transport host warp's fast path; see
    native/perotpu.cpp warp_affine_lines_u8 for the addressing
    contract).  Returns False when the library (or the symbol, for a
    stale build) is unavailable."""
    lib = get_library()
    if lib is None or not hasattr(lib, "warp_affine_lines_u8"):
        return False
    gray = np.ascontiguousarray(gray, dtype=np.uint8)
    mats = np.ascontiguousarray(mats, dtype=np.float64)
    widths = np.ascontiguousarray(widths, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    h, w = gray.shape
    lib.warp_affine_lines_u8(
        _ptr(gray, ctypes.c_uint8), h, w,
        _ptr(mats, ctypes.c_double), _ptr(widths, ctypes.c_int32),
        len(widths), crop_h, _ptr(out, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64), stride_col, stride_row,
    )
    return True


def native_cc_baselines(
    labels: np.ndarray, heights: np.ndarray, num: int, max_pts: int = 10,
):
    """Per-component decimated baselines + median heights in one C++
    pass (see native/perotpu.cpp cc_baselines_f32 for the exact
    python-equivalent semantics).  Returns (pts, npts, heights, valid)
    or None when the library/symbol is unavailable."""
    lib = get_library()
    if lib is None or not hasattr(lib, "cc_baselines_f32"):
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    heights = np.ascontiguousarray(heights, np.float32)
    h, w = labels.shape
    out_pts = np.zeros((num, max_pts, 2), np.float64)
    out_npts = np.zeros(num, np.int32)
    out_heights = np.zeros((num, 2), np.float64)
    out_valid = np.zeros(num, np.uint8)
    lib.cc_baselines_f32(
        _ptr(labels, ctypes.c_int32), h, w, num,
        _ptr(heights, ctypes.c_float), max_pts,
        _ptr(out_pts, ctypes.c_double), _ptr(out_npts, ctypes.c_int32),
        _ptr(out_heights, ctypes.c_double), _ptr(out_valid, ctypes.c_uint8),
    )
    return out_pts, out_npts, out_heights, out_valid


def native_cc_lines_packed(
    packed: np.ndarray, heights_q: np.ndarray, hf: int,
    max_comps: int = 4096, max_pts: int = 10,
):
    """Fused packed-mask -> component baselines + adaptation stats in
    one C++ pass (native/perotpu.cpp cc_lines_packed; replaces host
    unpack + (5,3) dilation + 8-connected labeling + per-component
    extraction).  ``packed``: (H, W/8) uint8 1-bit baseline mask;
    ``heights_q``: (Hq, Wq, 2) uint8 quarter-px pooled heights with
    pool factor ``hf``.  Returns (pts, npts, heights, n_emitted,
    n_px, hist0) where hist0 is the 256-bin histogram of channel-0
    heights_q values under set bits (exact median support for the
    adaptive downsample), or None when the library/symbol is
    unavailable or the component budget overflows."""
    lib = get_library()
    if lib is None or not hasattr(lib, "cc_lines_packed"):
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    heights_q = np.ascontiguousarray(heights_q, np.uint8)
    h, wb = packed.shape
    out_pts = np.zeros((max_comps, max_pts, 2), np.float64)
    out_npts = np.zeros(max_comps, np.int32)
    out_heights = np.zeros((max_comps, 2), np.float64)
    out_npx = np.zeros(1, np.int64)
    hist0 = np.zeros(256, np.int64)
    lib.cc_lines_packed.restype = ctypes.c_int32
    n = lib.cc_lines_packed(
        _ptr(packed, ctypes.c_uint8), h, wb,
        _ptr(heights_q, ctypes.c_uint8), heights_q.shape[1], int(hf),
        max_comps, max_pts,
        _ptr(out_pts, ctypes.c_double), _ptr(out_npts, ctypes.c_int32),
        _ptr(out_heights, ctypes.c_double),
        _ptr(out_npx, ctypes.c_int64), _ptr(hist0, ctypes.c_int64),
    )
    if n < 0:
        return None
    return (out_pts[:n], out_npts[:n], out_heights[:n],
            int(n), int(out_npx[0]), hist0)


def native_separator_penalties(
    bx: np.ndarray, by: np.ndarray, offs: np.ndarray,
    q_line: np.ndarray, q_shift: np.ndarray,
    q_x1: np.ndarray, q_x2: np.ndarray, sep_map: np.ndarray,
    pool: int = 1,
):
    """Batched separator-map penalties (paragraph clustering hot path;
    see native/perotpu.cpp separator_penalties_f32).  ``pool`` > 1
    means sep_map is a pooled (H/pool, W/pool) array while query
    coordinates stay full-map — sampling is byte-exact vs the
    repeat-upsampled map.  Returns the (Q,) penalties or None when the
    library/symbol is unavailable."""
    lib = get_library()
    if lib is None or not hasattr(lib, "separator_penalties_f32"):
        return None
    bx = np.ascontiguousarray(bx, np.float64)
    by = np.ascontiguousarray(by, np.float64)
    offs = np.ascontiguousarray(offs, np.int32)
    q_line = np.ascontiguousarray(q_line, np.int32)
    q_shift = np.ascontiguousarray(q_shift, np.float64)
    q_x1 = np.ascontiguousarray(q_x1, np.float64)
    q_x2 = np.ascontiguousarray(q_x2, np.float64)
    sep_map = np.ascontiguousarray(sep_map, np.float32)
    out = np.empty(len(q_line), np.float64)
    h, w = sep_map.shape
    lib.separator_penalties_f32(
        _ptr(bx, ctypes.c_double), _ptr(by, ctypes.c_double),
        _ptr(offs, ctypes.c_int32), _ptr(q_line, ctypes.c_int32),
        _ptr(q_shift, ctypes.c_double), _ptr(q_x1, ctypes.c_double),
        _ptr(q_x2, ctypes.c_double), len(q_line),
        _ptr(sep_map, ctypes.c_float), h * int(pool), w * int(pool),
        int(pool), _ptr(out, ctypes.c_double),
    )
    return out


def native_viterbi_ctc(
    neg_logprobs_states: np.ndarray, skip_ok: np.ndarray
) -> Optional[np.ndarray]:
    """Viterbi path over (T, S) gathered costs; None on lib-missing,
    raises ValueError when no valid path exists."""
    lib = get_library()
    if lib is None:
        return None
    costs = np.ascontiguousarray(neg_logprobs_states, dtype=np.float32)
    # Clamp +inf to the library's finite INF sentinel.
    costs = np.minimum(costs, 1e30)
    skip = np.ascontiguousarray(skip_ok, dtype=np.uint8)
    t, s = costs.shape
    path = np.empty(t, dtype=np.int32)
    rc = lib.viterbi_ctc_f32(
        _ptr(costs, ctypes.c_float), t, s,
        _ptr(skip, ctypes.c_uint8), _ptr(path, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError(
            "It was not possible to align the states with the logits, "
            "best path has cost of np.inf"
        )
    return path


def native_polygons_close(
    polys: Sequence[np.ndarray], pairs: np.ndarray,
    thresholds: np.ndarray,
) -> Optional[np.ndarray]:
    """For each (a, b) pair, whether the polygons' minimum boundary
    distance is <= thresholds[k] (the clustering's Minkowski
    dilated-intersection test); early-exits per pair.  Returns (K,)
    bool, or None when the library is missing."""
    lib = get_library()
    if lib is None or not hasattr(lib, "polygons_close_f64"):
        return None
    pairs = np.ascontiguousarray(pairs, dtype=np.int32)
    k = len(pairs)
    out = np.empty(k, dtype=np.uint8)
    if k == 0:
        return out.astype(bool)
    npts = np.asarray([len(p) for p in polys], dtype=np.int32)
    pmax = int(npts.max())
    verts = np.zeros((len(polys), pmax, 2), dtype=np.float64)
    for i, p in enumerate(polys):
        verts[i, : len(p)] = p
    thresholds = np.ascontiguousarray(thresholds, dtype=np.float64)
    lib.polygons_close_f64(
        _ptr(verts, ctypes.c_double), _ptr(npts, ctypes.c_int32), pmax,
        _ptr(pairs, ctypes.c_int32), k,
        _ptr(thresholds, ctypes.c_double), _ptr(out, ctypes.c_uint8),
    )
    return out.astype(bool)
