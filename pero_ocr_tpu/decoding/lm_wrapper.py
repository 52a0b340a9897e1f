"""Bridge between the beam-search decoder and the JAX character LM.

Same contract as the reference's torch-LM wrapper
(reference: pero_ocr/decoding/lm_wrapper.py:57-127):

- ``initial_h(batch)`` — state after consuming ``</s>``;
- ``advance_h0(chars, h)`` — one batched LM step over decoder char ids;
- ``log_probs(h)`` — (B, V_decoder) next-char log-probs;
- ``eos_scores(h)``, ``add_line_end(h)``, ``initial_h_from_line(line)``.

``HiddenState`` gives the pytree LM state numpy-style indexing/assignment
/concatenation (reference: lm_wrapper.py:5-54).

To keep host-side beam search from recompiling per beam width, all jitted
LM calls run at a fixed padded batch (next power of two, cached).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec


class HiddenState:
    """Pytree wrapper with gather/scatter/concat semantics."""

    def __init__(self, tree):
        self._tree = tree

    @property
    def tree(self):
        return self._tree

    def batch_size(self) -> int:
        return jax.tree_util.tree_leaves(self._tree)[0].shape[0]

    def __getitem__(self, indices):
        idx = np.asarray(indices)
        return HiddenState(
            jax.tree_util.tree_map(lambda x: np.asarray(x)[idx], self._tree)
        )

    def __setitem__(self, indices, other: "HiddenState"):
        idx = np.asarray(indices)

        def assign(dst, src):
            dst = np.asarray(dst)
            dst[idx] = np.asarray(src)
            return dst

        self._tree = jax.tree_util.tree_map(assign, self._tree, other._tree)

    def __add__(self, other: "HiddenState") -> "HiddenState":
        if self.batch_size() == 0:
            return HiddenState(other._tree)
        if other.batch_size() == 0:
            return HiddenState(self._tree)
        return HiddenState(
            jax.tree_util.tree_map(
                lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)], axis=0),
                self._tree,
                other._tree,
            )
        )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class JAXLMWrapper:
    """Drives a :class:`CharLM` for beam-search rescoring.

    ``decoder_symbols`` are the OCR charset entries WITHOUT the blank; the
    LM vocabulary is assumed to cover them plus a trailing ``</s>``.
    ``vocab_map`` (optional) maps decoder symbol -> LM token id for LMs
    trained on a different vocabulary ordering."""

    def __init__(self, model: CharLM, variables, decoder_symbols: Sequence[str],
                 vocab_map=None):
        self._model = model
        self._variables = variables
        self.spec: CharLMSpec = model.spec
        self._eos = self.spec.eos_id

        if vocab_map is None:
            self._map = np.arange(len(decoder_symbols), dtype=np.int32)
        else:
            self._map = np.asarray(
                [vocab_map[s] for s in decoder_symbols], dtype=np.int32
            )
        self._n_symbols = len(decoder_symbols)
        self._char_index = {c: i for i, c in enumerate(decoder_symbols)}

        self._advance_jit = jax.jit(
            lambda tokens, state: model.apply(
                variables, tokens, state, method=CharLM.advance
            )
        )
        self._logprobs_jit = jax.jit(
            lambda state: model.apply(variables, state, method=CharLM.log_probs)
        )

    # ------------------------------------------------------------------
    def _padded(self, h: HiddenState, tokens: np.ndarray):
        """Pad state+tokens to a power-of-two batch; returns (state, tokens,
        true_n)."""
        n = len(tokens)
        padded_n = _next_pow2(max(n, 1))
        if padded_n == n:
            return h.tree, tokens, n
        pad = padded_n - n
        tree = jax.tree_util.tree_map(
            lambda x: np.concatenate(
                [np.asarray(x), np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            ),
            h.tree,
        )
        tokens = np.concatenate([tokens, np.zeros(pad, tokens.dtype)])
        return tree, tokens, n

    def advance_h0(self, x: np.ndarray, h0: HiddenState) -> HiddenState:
        """Advance states by decoder char ids ``x`` (reference contract:
        lm_wrapper.py:70-75)."""
        tokens = self._map[np.asarray(x, dtype=np.int32)]
        tree, tokens, n = self._padded(h0, tokens)
        new_tree = self._advance_jit(jnp.asarray(tokens), tree)
        out = jax.tree_util.tree_map(lambda t: np.asarray(t)[:n], new_tree)
        return HiddenState(out)

    def log_probs(self, h: HiddenState) -> np.ndarray:
        n = h.batch_size()
        tree, _, _ = self._padded(h, np.zeros(n, np.int32))
        lp = np.asarray(self._logprobs_jit(tree))[:n]
        return lp[:, self._map]

    def eos_scores(self, h: HiddenState) -> np.ndarray:
        n = h.batch_size()
        tree, _, _ = self._padded(h, np.zeros(n, np.int32))
        lp = np.asarray(self._logprobs_jit(tree))[:n]
        return lp[:, self._eos]

    # ------------------------------------------------------------------
    def _zero_state(self, batch_size: int) -> HiddenState:
        state = self._model.apply(
            self._variables, batch_size, method=CharLM.initial_state
        )
        return HiddenState(jax.tree_util.tree_map(np.asarray, state))

    def _advance_raw(self, lm_tokens: np.ndarray, h: HiddenState) -> HiddenState:
        tree, tokens, n = self._padded(h, np.asarray(lm_tokens, np.int32))
        new_tree = self._advance_jit(jnp.asarray(tokens), tree)
        return HiddenState(
            jax.tree_util.tree_map(lambda t: np.asarray(t)[:n], new_tree)
        )

    def initial_h(self, batch_size: int) -> HiddenState:
        """State after ``</s>`` (line-start context)."""
        h = self._zero_state(batch_size)
        return self._advance_raw(np.full(batch_size, self._eos), h)

    def add_line_end(self, h: HiddenState) -> HiddenState:
        return self._advance_raw(np.full(h.batch_size(), self._eos), h)

    def initial_h_from_line(self, line: str) -> HiddenState:
        """Seed the state with the text of a previous line followed by
        ``</s>`` (reference: lm_wrapper.py:116-124)."""
        h = self.initial_h(1)
        for ch in line:
            dec_id = self._char_index.get(ch)
            if dec_id is None:
                continue
            h = self._advance_raw(self._map[[dec_id]], h)
        return self._advance_raw(np.asarray([self._eos]), h)

    def translate(self, symbols: np.ndarray) -> np.ndarray:
        return self._map[np.asarray(symbols, dtype=np.int32)]
