"""On-device CTC ops: greedy decode and batched forced alignment.

Greedy decode replaces the reference's per-batch device->host argmax +
Python collapse loop (reference: pero_ocr/ocr_engine/pytorch_ocr_engine.py:13-34)
with a fully vectorized on-device collapse: the host only converts the
final (short) label rows into strings.

Batched Viterbi forced alignment replaces the numba DP
(reference: pero_ocr/core/force_alignment.py:117-147) with a
``lax.scan`` over frames carrying a (B, S) cost plane — all lines of a
page are aligned in one jitted call.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@jax.jit
def greedy_ctc_labels(logits: jnp.ndarray, valid_frames: jnp.ndarray):
    """Vectorized greedy CTC collapse.

    Args:
        logits: (B, T, C) logits; blank is class C-1.
        valid_frames: (B,) number of valid frames per line.

    Returns:
        labels: (B, T) int32 label ids, left-packed; padded with -1.
        lengths: (B,) number of emitted labels.
    """
    b, t, c = logits.shape
    blank = c - 1
    best = jnp.argmax(logits, axis=-1)  # (B, T)
    frame_idx = jnp.arange(t)[None, :]
    valid = frame_idx < valid_frames[:, None]

    prev = jnp.concatenate([jnp.full((b, 1), -1, best.dtype), best[:, :-1]], axis=1)
    emit = (best != blank) & (best != prev) & valid

    # Left-pack emitted labels via a stable sort on (not emit) keys.
    order = jnp.argsort(~emit, axis=1, stable=True)
    packed = jnp.take_along_axis(jnp.where(emit, best, -1), order, axis=1)
    lengths = emit.sum(axis=1)
    return packed.astype(jnp.int32), lengths.astype(jnp.int32)


def greedy_worst_run_confidence(
    logits: jnp.ndarray, valid_frames: jnp.ndarray
) -> jnp.ndarray:
    """Per-line confidence = the WORST per-run best probability over the
    greedy argmax runs (the reference's get_prob semantics,
    reference: pero_ocr/document_ocr/page_parser.py:437-450: consecutive
    equal argmax ids form a run, each run scores its max frame
    probability, the line scores the min over runs — blank runs
    included).  Fully in-graph so the serving pipeline downloads one
    float per line instead of the logits.

    Args:
        logits: (B, T, C) raw logits.
        valid_frames: (B,) frames per line.

    Returns (B,) float32 confidences in [0, 1]."""
    b, t, c = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    best_lp = jnp.max(logp, axis=-1)            # (B, T)
    best_id = jnp.argmax(logits, axis=-1)       # (B, T)
    frame_idx = jnp.arange(t)[None, :]
    valid = frame_idx < valid_frames[:, None]

    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, best_id.dtype), best_id[:, :-1]], axis=1
    )
    run_id = jnp.cumsum(best_id != prev, axis=1) - 1   # (B, T) 0-based

    def per_line(lp, rid, v):
        seg_max = jax.ops.segment_max(
            jnp.where(v, lp, -jnp.inf), rid, num_segments=t
        )
        seg_seen = (
            jax.ops.segment_max(v.astype(jnp.int32), rid, num_segments=t)
            > 0
        )
        worst = jnp.min(jnp.where(seg_seen, seg_max, jnp.inf))
        # Empty line (no valid frames) -> confidence 1.0 like an
        # unexamined line.
        return jnp.where(jnp.isfinite(worst), jnp.exp(worst), 1.0)

    return jax.vmap(per_line)(best_lp, run_id, valid).astype(jnp.float32)


def labels_to_strings(
    packed: np.ndarray, lengths: np.ndarray, characters: List[str]
) -> List[str]:
    """Host-side: map packed label rows to strings."""
    chars = np.asarray(characters, dtype=object)
    out = []
    for row, n in zip(packed, lengths):
        out.append("".join(chars[row[: int(n)]]))
    return out


# ----------------------------------------------------------------------
# Batched forced alignment
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=())
def viterbi_align_batch(
    logprobs: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    frame_lengths: jnp.ndarray,
):
    """Batched CTC Viterbi alignment.

    Args:
        logprobs: (B, T, C) log-probabilities, blank = C-1.
        labels: (B, L) padded label ids.
        label_lengths: (B,) true label counts.
        frame_lengths: (B,) true frame counts.

    Returns:
        state_path: (B, T) state indices into the blank-interleaved chain
            (length 2L+1); frames beyond frame_lengths repeat the final
            state.  char_path: (B, T) char index per frame (-1 = blank).
        valid: (B,) bool, False where no alignment exists.
    """
    b, t, c = logprobs.shape
    l = labels.shape[1]
    s = 2 * l + 1
    blank = c - 1

    # states[k] = blank for even k, labels[(k-1)//2] for odd k.
    state_ids = jnp.arange(s)
    is_label_state = (state_ids % 2) == 1
    label_idx = jnp.clip((state_ids - 1) // 2, 0, l - 1)
    state_symbols = jnp.where(
        is_label_state[None, :], jnp.take_along_axis(
            labels, jnp.broadcast_to(label_idx[None, :], (b, s)).clip(0, l - 1), axis=1
        ), blank
    )  # (B, S)

    # skip allowed into odd state k>=3 when labels differ.
    prev_sym = jnp.roll(state_symbols, 2, axis=1)
    skip_ok = is_label_state[None, :] & (state_ids[None, :] >= 3) & (
        state_symbols != prev_sym
    )

    # valid states: s < 2*label_lengths+1
    n_states = 2 * label_lengths + 1  # (B,)
    state_valid = state_ids[None, :] < n_states[:, None]

    # Emission: logprob of each state's symbol per frame.
    # emissions[b, t, k] = logprobs[b, t, state_symbols[b, k]]
    emissions = jnp.take_along_axis(
        logprobs, state_symbols[:, None, :].astype(jnp.int32), axis=2
    )  # (B, T, S)

    init = jnp.full((b, s), NEG_INF)
    init = init.at[:, 0].set(emissions[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(l > 0, emissions[:, 0, 1], NEG_INF))
    init = jnp.where(state_valid, init, NEG_INF)

    frame_ids = jnp.arange(t)

    def step(cost, inputs):
        emit_t, t_idx = inputs
        stay = cost
        advance = jnp.concatenate([jnp.full((b, 1), NEG_INF), cost[:, :-1]], axis=1)
        skip = jnp.concatenate([jnp.full((b, 2), NEG_INF), cost[:, :-2]], axis=1)
        skip = jnp.where(skip_ok, skip, NEG_INF)
        stacked = jnp.stack([stay, advance, skip])  # (3, B, S)
        delta = jnp.argmax(stacked, axis=0)  # (B, S)
        new_cost = jnp.max(stacked, axis=0) + emit_t
        new_cost = jnp.where(state_valid, new_cost, NEG_INF)
        # Frozen frames (past the line's length) keep the old cost.
        active = (t_idx < frame_lengths)[:, None]
        new_cost = jnp.where(active, new_cost, cost)
        delta = jnp.where(active, delta, 0)
        return new_cost, delta

    final_cost, deltas = jax.lax.scan(
        step, init, (jnp.moveaxis(emissions, 1, 0)[1:], frame_ids[1:])
    )
    deltas = jnp.concatenate(
        [jnp.zeros((1, b, s), deltas.dtype), deltas], axis=0
    )  # (T, B, S)

    # Final state: argmax over the last two valid states.
    last_blank = n_states - 1
    last_label = jnp.maximum(n_states - 2, 0)
    cost_last_blank = jnp.take_along_axis(final_cost, last_blank[:, None], axis=1)[:, 0]
    cost_last_label = jnp.take_along_axis(final_cost, last_label[:, None], axis=1)[:, 0]
    final_state = jnp.where(cost_last_blank >= cost_last_label, last_blank, last_label)
    valid = jnp.maximum(cost_last_blank, cost_last_label) > NEG_INF / 2

    # Backtrack with a reverse scan.  Frames beyond frame_lengths hold the
    # final state (delta forced to 0 there).
    def back(state, delta_t_rev):
        t_idx, delta_t = delta_t_rev
        use = t_idx < frame_lengths  # only move within valid frames
        d = jnp.take_along_axis(delta_t, state[:, None], axis=1)[:, 0]
        new_state = jnp.where(use, state - d, state)
        return new_state, state

    _, states_rev = jax.lax.scan(
        back,
        final_state,
        (frame_ids[::-1], jnp.flip(deltas, axis=0)),
    )
    state_path = jnp.flip(states_rev, axis=0).T  # (B, T)

    char_path = jnp.where(
        (state_path % 2) == 1, (state_path - 1) // 2, -1
    )
    return state_path, char_path, valid


def align_text_batch(
    logprobs: np.ndarray,
    labels: np.ndarray,
    label_lengths: np.ndarray,
    frame_lengths: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched equivalent of core.force_alignment.align_text: best frame per
    character (max overall log-prob among its Viterbi frames).

    Returns (char_positions (B, L) int32 padded with -1, valid (B,) bool).
    """
    logprobs_j = jnp.asarray(logprobs)
    _, char_path, valid = viterbi_align_batch(
        logprobs_j,
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
        jnp.asarray(frame_lengths),
    )
    char_path = np.asarray(char_path)
    valid = np.asarray(valid)
    max_probs = np.asarray(jnp.max(logprobs_j, axis=-1))  # (B, T)

    bsz, l = labels.shape
    out = np.full((bsz, l), -1, dtype=np.int32)
    t = logprobs.shape[1]
    frame_idx = np.arange(t)
    for i in range(bsz):
        if not valid[i]:
            continue
        fl = int(frame_lengths[i])
        cp = char_path[i, :fl]
        mp = max_probs[i, :fl]
        for ci in range(int(label_lengths[i])):
            frames = frame_idx[:fl][cp == ci]
            if len(frames):
                out[i, ci] = frames[np.argmax(mp[frames])]
    return out, valid
