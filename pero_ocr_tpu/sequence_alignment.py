"""Levenshtein distance / alignment / alignment paths.

API-compatible with the reference module
(reference: pero_ocr/sequence_alignment.py:4-161) but fully vectorized:
the reference propagates insertions with a per-cell Python loop; here the
propagation is a running-minimum (``np.minimum.accumulate`` over
``dist[j] - j*ins_cost``), which computes the same fixpoint in O(m) numpy
ops per row.

Direction encoding in paths (same as the reference):
    0  = diagonal (substitution or match)
    1  = source-only step (deletion of a source symbol)
    -1 = target-only step (insertion)
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np


def _row_update(
    dist: np.ndarray,
    backtrack_row: np.ndarray,
    s,
    target: np.ndarray,
    sub_cost: float,
    ins_cost: float,
    del_cost: float,
) -> np.ndarray:
    """One DP row update.  Mutates backtrack_row; returns the new dist row."""
    cand_sub = dist[:-1] + (target != s) * sub_cost
    new = dist + del_cost
    where_sub = cand_sub < new[1:]
    new[1:] = np.where(where_sub, cand_sub, new[1:])
    backtrack_row[1:][where_sub] = 0

    # Insertion propagation to the fixpoint.
    j = np.arange(len(new))
    run_min = np.minimum.accumulate(new - j * ins_cost)
    improved = run_min + j * ins_cost < new
    new = np.minimum(new, run_min + j * ins_cost)
    backtrack_row[improved] = -1
    return new


def _dp(source, target, sub_cost, ins_cost, del_cost):
    target = np.array(target)
    backtrack = np.ones((len(source) + 1, len(target) + 1), dtype=np.int8)
    backtrack[0] = -1
    dist = np.arange(len(target) + 1, dtype=np.float64) * ins_cost
    for i, s in enumerate(source):
        dist = _row_update(
            dist, backtrack[i + 1], s, target, sub_cost, ins_cost, del_cost
        )
    return dist, backtrack


def levenshtein_distance(source, target, sub_cost=1, ins_cost=1, del_cost=1):
    if sub_cost == 1 and ins_cost == 1 and del_cost == 1:
        # Unit costs take the native C++ fast path when available.
        native = _native_unit_distance(source, target)
        if native is not None:
            return native
    dist, _ = _dp(source, target, sub_cost, ins_cost, del_cost)
    return dist[-1]


def _native_unit_distance(source, target) -> Optional[int]:
    try:
        from pero_ocr_tpu.utils.native import native_levenshtein

        src_ids, tgt_ids = _symbols_to_ids(source, target)
        if src_ids is None:
            return None
        return native_levenshtein(src_ids, tgt_ids)
    except Exception:
        return None


def _symbols_to_ids(source, target):
    """Map arbitrary hashable symbols onto int32 ids (shared table)."""
    table = {}
    try:
        src = [table.setdefault(s, len(table)) for s in source]
        tgt = [table.setdefault(s, len(table)) for s in target]
    except TypeError:
        return None, None
    return src, tgt


def _walk(backtrack: np.ndarray) -> List[int]:
    """Trace the backtrack matrix from the bottom-right corner; returns the
    direction sequence."""
    src_pos = backtrack.shape[0] - 1
    tar_pos = backtrack.shape[1] - 1
    path = []
    while tar_pos > 0 or src_pos > 0:
        where = int(backtrack[src_pos, tar_pos])
        if where >= 0:
            src_pos -= 1
        if where <= 0:
            tar_pos -= 1
        path.append(where)
    return list(reversed(path))


def levenshtein_alignment_path(
    source, target, sub_cost=1, ins_cost=1, del_cost=1, empty_symbol=None
):
    _, backtrack = _dp(source, target, sub_cost, ins_cost, del_cost)
    return _walk(backtrack)


def _path_to_pairs(path, source, target, empty_symbol):
    pairs = []
    si = ti = 0
    for where in path:
        s_sym = source[si] if where >= 0 else empty_symbol
        t_sym = target[ti] if where <= 0 else empty_symbol
        if where >= 0:
            si += 1
        if where <= 0:
            ti += 1
        pairs.append((s_sym, t_sym))
    return pairs


def levenshtein_alignment(
    source, target, sub_cost=1, ins_cost=1, del_cost=1, empty_symbol=None
):
    path = levenshtein_alignment_path(source, target, sub_cost, ins_cost, del_cost)
    return _path_to_pairs(path, source, target, empty_symbol)


def edit_stats_for_alignment(alig, empty_symbol=None):
    """(nphn, ncor, nins, ndel, nsub) counts for an alignment pair list
    (reference: sequence_alignment.py:74-84)."""
    if len(alig) == 0:
        return 0, 0, 0, 0, 0
    alig = np.array(alig, dtype=object)
    ncor = int(np.sum(alig[:, 0] == alig[:, 1]))
    ndel = int(np.sum(alig[:, 0] == np.array(empty_symbol)))
    nphn = int(np.sum(alig[:, 1] != np.array(empty_symbol)))
    nins = len(alig) - nphn
    nsub = nphn - ncor - ndel
    return nphn, ncor, nins, ndel, nsub


# ----------------------------------------------------------------------
# Substring variants: the shorter string may match anywhere inside the
# longer one; leading/trailing symbols of the longer string are free.
# ----------------------------------------------------------------------
def _substring_dp(source, target, sub_cost, ins_cost, del_cost):
    """DP with an extra free-suffix sink column.  `target` must be the
    shorter sequence."""
    target = np.array(target)
    n_cols = len(target) + 2  # +1 leading, +1 sink
    backtrack = np.ones((len(source) + 1, n_cols), dtype=np.int8)
    backtrack[0] = -1
    dist = np.full(n_cols, np.inf)
    dist[0] = 0.0  # free leading deletions of source

    for i, s in enumerate(source):
        cand_sub = dist[:-2] + (target != s) * sub_cost
        new = dist.copy()
        new[1:-1] += del_cost
        where_sub = cand_sub < new[1:-1]
        new[1:-1] = np.where(where_sub, cand_sub, new[1:-1])
        backtrack[i + 1, 1:-1][where_sub] = 0

        j = np.arange(n_cols - 1)
        run_min = np.minimum.accumulate(new[:-1] - j * ins_cost)
        improved = run_min + j * ins_cost < new[:-1]
        new[:-1] = np.minimum(new[:-1], run_min + j * ins_cost)
        backtrack[i + 1, :-1][improved] = -1

        # Sink: free deletions after the match has completed.
        if new[-1] == new[-2]:
            backtrack[i + 1, -1] = 0
        elif new[-1] > new[-2]:
            new[-1] = new[-2]
            backtrack[i + 1, -1] = -1
        dist = new
    return dist, backtrack


def levenshtein_distance_substring(source, target, sub_cost=1, ins_cost=1, del_cost=1):
    if len(target) > len(source):
        source, target = target, source
    dist, _ = _substring_dp(source, target, sub_cost, ins_cost, del_cost)
    return dist[-1]


def levenshtein_alignment_substring(
    source, target, sub_cost=1, ins_cost=1, del_cost=1, empty_symbol=None
):
    swapped = False
    if len(target) > len(source):
        source, target = target, source
        swapped = True

    _, backtrack = _substring_dp(source, target, sub_cost, ins_cost, del_cost)

    # Where does the free suffix start?  Last row whose sink entry was not a
    # pure pass-down.
    suffix_beginning = backtrack.shape[0]
    if np.any(backtrack[:, -1] > 0):
        below = np.where(backtrack[:, -1] < 1)[0]
        suffix_beginning = (below[-1] + 1) if len(below) else backtrack.shape[0]

    trimmed = backtrack[:suffix_beginning, :-1]
    path = _walk(trimmed)
    pairs = _path_to_pairs(path, source, target, empty_symbol)
    for ch in source[suffix_beginning - 1 :]:
        pairs.append((ch, empty_symbol))

    if swapped:
        pairs = [(b, a) for a, b in pairs]
    return pairs
