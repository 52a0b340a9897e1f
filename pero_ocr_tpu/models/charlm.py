"""Character-level recurrent language model for beam-search rescoring.

The TPU-native replacement for the external brnolm torch LM the
reference loads (reference: pero_ocr/decoding/decoding_itf.py:27-46) and
drives through ``LMWrapper``'s batched contract
(reference: pero_ocr/decoding/lm_wrapper.py:70-124):

- ``advance(tokens, state) -> state`` — one RNN step for a batch of
  hidden states;
- ``log_probs(state) -> (B, V)`` — output head on current states;
- start-of-sentence / end-of-sentence scoring via a ``</s>`` token.

Here the LM is a Flax LSTM stack whose step function is pure, so the
decoder can fuse LM advancement *into* the on-TPU beam-search scan —
eliminating the per-frame host->device round trip of the reference's
``update_lm_things`` path (reference: decoders.py:287,
lm_wrapper.py:70-96).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CharLMSpec:
    vocab_size: int                 # characters + </s>
    embed_dim: int = 64
    hidden_dim: int = 512
    num_layers: int = 2
    cell_type: str = "lstm"         # "lstm" | "gru"
    dtype: Any = jnp.float32        # decode-side LM maths stays fp32

    @property
    def eos_id(self) -> int:
        """``</s>`` is the last vocabulary entry."""
        return self.vocab_size - 1


class CharLM(nn.Module):
    """Recurrent character LM.  States are pytrees: a tuple of per-layer
    carries — LSTM (c, h) pairs or GRU h arrays, each (B, hidden_dim).

    ``cell_type="gru"`` is the light-step option for the on-TPU beam
    scan: the per-frame LM advance is the scan's serial bottleneck
    (measured LM-bound on v5e), and a GRU step is 3 gate matmuls to the
    LSTM's 4 with half the carry state to gather per beam."""

    spec: CharLMSpec

    def setup(self):
        sp = self.spec
        if sp.cell_type not in ("lstm", "gru"):
            raise ValueError(f"unknown cell_type {sp.cell_type!r}")
        self.embed = nn.Embed(sp.vocab_size, sp.embed_dim, dtype=sp.dtype)
        cell_cls = (
            nn.OptimizedLSTMCell if sp.cell_type == "lstm" else nn.GRUCell
        )
        self.cells = [
            cell_cls(sp.hidden_dim, dtype=sp.dtype)
            for _ in range(sp.num_layers)
        ]
        self.head = nn.Dense(sp.vocab_size, dtype=jnp.float32)

    def initial_state(self, batch_size: int):
        sp = self.spec
        zeros = jnp.zeros((batch_size, sp.hidden_dim), sp.dtype)
        if sp.cell_type == "gru":
            return tuple(zeros for _ in range(sp.num_layers))
        return tuple((zeros, zeros) for _ in range(sp.num_layers))

    def advance(self, tokens: jnp.ndarray, state):
        """One step: tokens (B,) int32 -> new state."""
        x = self.embed(tokens)
        new_state = []
        for cell, s in zip(self.cells, state):
            s2, x = cell(s, x)
            new_state.append(s2)
        return tuple(new_state)

    def log_probs(self, state) -> jnp.ndarray:
        """(B, V) log-probabilities from the top layer's hidden output."""
        top = state[-1]
        h_top = top if self.spec.cell_type == "gru" else top[1]
        logits = self.head(h_top.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)

    def __call__(self, tokens: jnp.ndarray):
        """Init-shape entry point: one advance + head (used for parameter
        initialization; sequence scoring lives in
        :func:`sequence_logprobs`, which scans the pure ``apply``)."""
        state = self.initial_state(tokens.shape[0])
        state = self.advance(tokens[:, 0], state)
        return self.log_probs(state)


def sequence_logprobs(model: CharLM, variables, tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, T) tokens -> (B, T, V) log-probs of the NEXT token after each
    position, starting from the initial (zero) state.  Pure lax.scan over
    ``model.apply`` — usable inside other jitted programs."""

    def step(state, tok):
        new_state = model.apply(variables, tok, state, method=CharLM.advance)
        lp = model.apply(variables, new_state, method=CharLM.log_probs)
        return new_state, lp

    init = model.apply(
        variables, tokens.shape[0], method=CharLM.initial_state
    )
    _, out = jax.lax.scan(step, init, tokens.T)
    return jnp.moveaxis(out, 0, 1)


def state_select(state, indices: jnp.ndarray):
    """Gather beam entries out of a batched LM state (HiddenState index
    semantics, reference: lm_wrapper.py:5-54)."""
    return jax.tree_util.tree_map(lambda x: x[indices], state)


def state_assign(state, indices: jnp.ndarray, values):
    """Scatter `values` (a state for len(indices) rows) into `state`."""
    return jax.tree_util.tree_map(
        lambda x, v: x.at[indices].set(v), state, values
    )


def state_concat(states: Sequence):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *states
    )
