"""Vectorized on-TPU CTC prefix beam search with in-graph LM fusion.

The reference decodes line-by-line in numpy with a torch-RNN round trip
per frame (reference: pero_ocr/decoding/decoders.py:220-299,
lm_wrapper.py:70-96).  Here the ENTIRE beam search for a batch of lines
runs as one ``lax.scan`` over logit frames:

- the beam is a fixed K of prefixes stored as padded id arrays;
- prefix joining (decoders.py:138-155) is resolved with rolling prefix
  hashes: entry i staying on its last char merges with entry j extending
  by that char iff ``parent_hash[i] == hash[j]`` — an O(K^2) mask per
  frame, trivial on the VPU;
- the char-LM (:class:`pero_ocr_tpu.models.charlm.CharLM`) advances
  INSIDE the scan: all K beam entries step the LSTM each frame and the
  stay-entries keep their old state, so no host round trips exist at
  all;
- lines of different lengths are batched together; frames beyond a
  line's length leave its state untouched.

Numerically this matches the host decoder
(:class:`pero_ocr_tpu.decoding.decoders.CTCPrefixLogRawNumpyDecoder`)
configured WITHOUT relevant-logit pruning (the -10 cutoff is a host-side
speed hack; on TPU the full vocabulary table is cheaper than dynamic
selection).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.decoding.bag_of_hypotheses import BagOfHypotheses

NEG_INF = -1e30
_HASH_MULT = np.uint32(1000003)


class _BeamArrays(NamedTuple):
    """Per-line beam state carried through the scan (leaves have a
    leading (B, K) shape).  Prefix STRINGS are not carried — each step
    emits (row, col) backpointers and the host reconstructs the texts
    after the scan (carrying a (B, K, Lmax) buffer would rewrite it every
    frame: ~0.5GB of HBM traffic per 512-frame scan)."""

    lengths: jnp.ndarray       # (B, K) int32
    hash: jnp.ndarray          # (B, K) uint32
    parent_hash: jnp.ndarray   # (B, K) uint32
    last_char: jnp.ndarray     # (B, K) int32
    p_blank: jnp.ndarray       # (B, K) f32
    p_nonblank: jnp.ndarray    # (B, K) f32
    p_lm: jnp.ndarray          # (B, K) f32
    lm_state: object           # pytree, leaves (B, K, ...)
    lm_preds: jnp.ndarray      # (B, K, V) f32


def _tree_gather(tree, rows):
    """Gather beam rows: leaves (B, K, ...) indexed by rows (B, K)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.take_along_axis(
            x, rows.reshape(rows.shape + (1,) * (x.ndim - 2)), axis=1
        ),
        tree,
    )


class TPUBeamSearchDecoder:
    """Batched beam search over (B, T, C) log-probs.

    Args:
        letters: charset INCLUDING the trailing blank.
        k: beam width.
        lm: optional (CharLM model, variables) tuple; the LM vocabulary
            must cover the non-blank letters (+ trailing EOS), in order
            unless ``vocab_map`` says otherwise.
        vocab_map: optional (V,) int array mapping decoder char id ->
            LM token id, for LMs trained on a different vocabulary
            ordering (the reference LMWrapper's translation contract,
            pero_ocr/decoding/lm_wrapper.py:66-68).  Applied IN-GRAPH:
            LM inputs translate through the table and LM outputs gather
            back into decoder order — one tiny (V,) gather per step.
        lm_scale, insertion_bonus: fusion parameters
            (reference: decoders.py:176-180).
        max_len: accepted for config compatibility but UNUSED — prefixes
            are reconstructed from per-frame backpointers, so hypothesis
            length is bounded only by the frame count (like the host
            decoder).
        transport_dtype: dtype the (B, T, C) log-probs travel to the
            device in.  The decode itself always runs float32; float16
            halves the upload bytes, which DOMINATE a stored-logits
            decode through a slow host link (a 160-line batch at V=81
            uploads 6.7MB as f32).  Keep the float32 default where
            bit-exact parity with the host decoder matters.
    """

    def __init__(
        self,
        letters: List[str],
        k: int = 8,
        lm: Optional[tuple] = None,
        lm_scale: float = 1.0,
        insertion_bonus: float = 0.0,
        max_len: int = 256,
        vocab_map: Optional[np.ndarray] = None,
        transport_dtype=np.float32,
    ):
        self.letters = list(letters)
        self.k = k
        self.lm_scale = lm_scale
        self.insertion_bonus = insertion_bonus
        self.max_len = max_len
        self.blank = len(letters) - 1
        self.vocab = len(letters) - 1  # non-blank chars
        self.transport_dtype = transport_dtype

        if lm is not None:
            self._lm_model, self._lm_variables = lm
        else:
            self._lm_model = self._lm_variables = None

        if vocab_map is not None and np.array_equal(
            np.asarray(vocab_map), np.arange(self.vocab)
        ):
            vocab_map = None  # identity: keep the gather-free slice path
        self._lm_map = (
            None if vocab_map is None
            else jnp.asarray(np.asarray(vocab_map, np.int32))
        )

        self._decode_jit = jax.jit(self._decode_impl, static_argnums=(2,))

    # ------------------------------------------------------------------
    def _dec_preds(self, preds_full: jnp.ndarray) -> jnp.ndarray:
        """(..., V_lm) LM log-probs -> (..., V_decoder) in decoder char
        order (identity slice, or the vocab_map gather)."""
        if self._lm_map is None:
            return preds_full[..., : self.vocab]
        return preds_full[..., self._lm_map]

    def _lm_tokens(self, chars: jnp.ndarray) -> jnp.ndarray:
        """Decoder char ids -> LM token ids."""
        if self._lm_map is None:
            return chars
        return self._lm_map[chars]

    def _lm_initial(self, b: int, init_states=None):
        """Per-beam LM state at t=0: fresh post-``</s>`` context, or the
        given per-line states (B, ...) broadcast over the beam
        (CARRY_H_OVER; reference: pero_ocr/decoding/decoders.py:229-232,
        lm_wrapper.py:109-124)."""
        if self._lm_model is None:
            return None, jnp.zeros((b, self.k, self.vocab), jnp.float32)
        model, variables = self._lm_model, self._lm_variables
        from pero_ocr_tpu.models.charlm import CharLM

        if init_states is None:
            flat = b * self.k
            state = model.apply(variables, flat, method=CharLM.initial_state)
            # Consume </s> to get the line-start context
            # (reference: lm_wrapper.py:109-114).
            eos = jnp.full((flat,), model.spec.eos_id, jnp.int32)
            state = model.apply(variables, eos, state, method=CharLM.advance)
        else:
            state = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, self.k, axis=0), init_states
            )
        preds = model.apply(variables, state, method=CharLM.log_probs)
        state = jax.tree_util.tree_map(
            lambda x: x.reshape((b, self.k) + x.shape[1:]), state
        )
        preds = self._dec_preds(preds).reshape(b, self.k, self.vocab)
        return state, preds

    def _lm_advance(self, chars_flat, state):
        """chars_flat: (B*K,) DECODER char ids; state leaves (B, K, ...)."""
        model, variables = self._lm_model, self._lm_variables
        from pero_ocr_tpu.models.charlm import CharLM

        # tree_leaves: LSTM states are (c, h) pairs per layer, GRU
        # states bare h arrays — both have (B, K, H) leaves.
        b, k = jax.tree_util.tree_leaves(state)[0].shape[:2]
        flat_state = jax.tree_util.tree_map(
            lambda x: x.reshape((b * k,) + x.shape[2:]), state
        )
        new_state = model.apply(
            variables, self._lm_tokens(chars_flat), flat_state,
            method=CharLM.advance,
        )
        preds = model.apply(variables, new_state, method=CharLM.log_probs)
        new_state = jax.tree_util.tree_map(
            lambda x: x.reshape((b, k) + x.shape[1:]), new_state
        )
        return new_state, self._dec_preds(preds).reshape(b, k, self.vocab)

    def _lm_eos_scores(self, state):
        model, variables = self._lm_model, self._lm_variables
        from pero_ocr_tpu.models.charlm import CharLM

        # tree_leaves: LSTM states are (c, h) pairs per layer, GRU
        # states bare h arrays — both have (B, K, H) leaves.
        b, k = jax.tree_util.tree_leaves(state)[0].shape[:2]
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((b * k,) + x.shape[2:]), state
        )
        lp = model.apply(variables, flat, method=CharLM.log_probs)
        return lp.reshape(b, k, -1)[:, :, model.spec.eos_id]

    # ------------------------------------------------------------------
    def _init_beam(self, b: int, init_lm_states=None) -> _BeamArrays:
        k = self.k
        lm_state, lm_preds = self._lm_initial(b, init_lm_states)
        return _BeamArrays(
            lengths=jnp.zeros((b, k), jnp.int32),
            hash=jnp.zeros((b, k), jnp.uint32),
            parent_hash=jnp.zeros((b, k), jnp.uint32),
            last_char=jnp.zeros((b, k), jnp.int32),
            p_blank=jnp.tile(
                jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)[None, :], (b, 1)
            ).astype(jnp.float32),
            p_nonblank=jnp.full((b, k), NEG_INF, jnp.float32),
            p_lm=jnp.zeros((b, k), jnp.float32),
            lm_state=lm_state,
            lm_preds=lm_preds,
        )

    def _step(self, beam: _BeamArrays, frame: jnp.ndarray, active: jnp.ndarray):
        """One frame update.  frame: (B, C); active: (B,) bool."""
        b, k = beam.lengths.shape
        v = self.vocab
        chars = frame[:, : v]                       # (B, V)
        blank = frame[:, v]                         # (B,)

        finite = beam.p_blank > NEG_INF / 2
        finite = finite | (beam.p_nonblank > NEG_INF / 2)

        has_last = beam.lengths > 0

        # --- extension scores -----------------------------------------
        from_blank = beam.p_blank[:, :, None] + chars[:, None, :]
        switching = beam.p_nonblank[:, :, None] + chars[:, None, :]
        last_onehot = jax.nn.one_hot(beam.last_char, v, dtype=bool)
        switching = jnp.where(
            last_onehot & has_last[:, :, None], NEG_INF, switching
        )
        extend = jnp.logaddexp(from_blank, switching)  # (B, K, V)

        last_char_lp = jnp.take_along_axis(
            chars[:, None, :].repeat(k, axis=1), beam.last_char[:, :, None],
            axis=2,
        )[:, :, 0]
        continued = jnp.where(
            has_last, beam.p_nonblank + last_char_lp, NEG_INF
        )
        pb_stay = jnp.logaddexp(beam.p_blank, beam.p_nonblank) + blank[:, None]

        # --- prefix joining via hashes --------------------------------
        # match[b, i, j]: entry i (staying) merges with entry j extending
        # by i's last char.
        match = (
            (beam.parent_hash[:, :, None] == beam.hash[:, None, :])
            & has_last[:, :, None]
            & finite[:, :, None]
            & finite[:, None, :]
            & ~jnp.eye(k, dtype=bool)[None]
        )
        any_match = match.any(axis=2)
        j_star = jnp.argmax(match, axis=2)  # (B, K)

        join_lp = jnp.take_along_axis(
            jnp.take_along_axis(
                extend, j_star[:, :, None].repeat(v, axis=2), axis=1
            ),
            beam.last_char[:, :, None],
            axis=2,
        )[:, :, 0]
        continued = jnp.where(
            any_match, jnp.logaddexp(continued, join_lp), continued
        )
        # Void the parent cells that were merged away.  Contracted over
        # the merging entry i as one small einsum (K x K by K x V per
        # line) — the elementwise outer-product form materialized a
        # (B, K, K, V) intermediate, the scan step's largest tensor.
        parent_cell = jnp.einsum(
            "bik,biv->bkv",
            jax.nn.one_hot(j_star, k, dtype=jnp.float32)
            * any_match[:, :, None].astype(jnp.float32),
            jax.nn.one_hot(beam.last_char, v, dtype=jnp.float32),
        ) > 0  # (B, K, V)
        extend = jnp.where(parent_cell, NEG_INF, extend)

        # --- totals + top-k -------------------------------------------
        visual = jnp.concatenate(
            [extend, jnp.logaddexp(continued, pb_stay)[:, :, None]], axis=2
        )
        lm_ext = (
            beam.p_lm[:, :, None] + beam.lm_preds + self.insertion_bonus
        )
        lm_table = jnp.concatenate(
            [lm_ext, beam.p_lm[:, :, None]], axis=2
        )
        total = visual + self.lm_scale * lm_table

        # Single wide top-k over K*(V+1).  A two-stage variant (per-row
        # top-k then top-k over the K*k survivors — exact, since a row
        # places at most k winners) was measured on the v5e: +2% decode
        # rate at V=81 but ~15 minutes of extra XLA compile for the
        # 128-frame scan — the scan is LM-LSTM-bound, not top-k-bound,
        # so the simple form wins.
        flat_total = total.reshape(b, k * (v + 1))
        _, flat_idx = jax.lax.top_k(flat_total, k)
        rows = flat_idx // (v + 1)                   # (B, K)
        cols = flat_idx % (v + 1)
        stay = cols == v

        # --- gather new beam ------------------------------------------
        def g2(x):
            return jnp.take_along_axis(x, rows, axis=1)

        g_len = g2(beam.lengths)
        new_lengths = jnp.where(stay, g_len, g_len + 1)

        g_hash = g2(beam.hash)
        ext_hash = (
            g_hash * _HASH_MULT + cols.astype(jnp.uint32) + jnp.uint32(1)
        )
        new_hash = jnp.where(stay, g_hash, ext_hash)
        new_parent = jnp.where(stay, g2(beam.parent_hash), g_hash)
        new_last = jnp.where(stay, g2(beam.last_char), cols)

        pnb_cell = jnp.take_along_axis(
            jnp.concatenate([extend, continued[:, :, None]], axis=2).reshape(
                b, k * (v + 1)
            ),
            flat_idx,
            axis=1,
        )
        new_pb = jnp.where(stay, g2(pb_stay), NEG_INF)
        new_plm = jnp.take_along_axis(
            lm_table.reshape(b, k * (v + 1)), flat_idx, axis=1
        )

        # --- LM state update ------------------------------------------
        if self._lm_model is not None:
            g_state = _tree_gather(beam.lm_state, rows)
            g_preds = jnp.take_along_axis(
                beam.lm_preds, rows[:, :, None].repeat(v, axis=2), axis=1
            )
            adv_chars = jnp.where(stay, 0, cols).reshape(b * k)
            adv_state, adv_preds = self._lm_advance(adv_chars, g_state)
            new_state = jax.tree_util.tree_map(
                lambda old, new: jnp.where(
                    stay.reshape(stay.shape + (1,) * (old.ndim - 2)), old, new
                ),
                g_state,
                adv_state,
            )
            new_preds = jnp.where(stay[:, :, None], g_preds, adv_preds)
        else:
            new_state = None
            new_preds = beam.lm_preds

        new_beam = _BeamArrays(
            lengths=new_lengths,
            hash=new_hash,
            parent_hash=new_parent,
            last_char=new_last,
            p_blank=new_pb,
            p_nonblank=pnb_cell,
            p_lm=new_plm,
            lm_state=new_state,
            lm_preds=new_preds,
        )

        # Inactive lines keep their previous state untouched.
        def sel(old, new):
            if old is None:
                return None
            return jax.tree_util.tree_map(
                lambda o, n: jnp.where(
                    active.reshape((b,) + (1,) * (o.ndim - 1)), n, o
                ),
                old,
                new,
            )

        merged = _BeamArrays(
            lengths=sel(beam.lengths, new_beam.lengths),
            hash=sel(beam.hash, new_beam.hash),
            parent_hash=sel(beam.parent_hash, new_beam.parent_hash),
            last_char=sel(beam.last_char, new_beam.last_char),
            p_blank=sel(beam.p_blank, new_beam.p_blank),
            p_nonblank=sel(beam.p_nonblank, new_beam.p_nonblank),
            p_lm=sel(beam.p_lm, new_beam.p_lm),
            lm_state=sel(beam.lm_state, new_beam.lm_state),
            lm_preds=sel(beam.lm_preds, new_beam.lm_preds),
        )
        identity = jnp.broadcast_to(jnp.arange(k)[None, :], (b, k))
        # Backpointers are the decode's DOWNLOAD: narrow them to the
        # smallest dtype that fits (the T x B x K int32 pair was 4x the
        # bytes and the link is the bottleneck for stored-logits jobs).
        rows_dt = jnp.uint8 if k <= 256 else jnp.int32
        cols_dt = (
            jnp.uint8 if v + 1 <= 256
            else (jnp.uint16 if v + 1 <= 65536 else jnp.int32)
        )
        bp_rows = jnp.where(active[:, None], rows, identity).astype(rows_dt)
        bp_cols = jnp.where(active[:, None], cols, v).astype(cols_dt)
        return merged, (bp_rows, bp_cols)

    # ------------------------------------------------------------------
    def _decode_impl(
        self, logprobs, frame_lengths, model_eos: bool = False,
        init_lm_states=None,
    ):
        # Maths always run f32; only the TRANSPORT may be f16.
        logprobs = logprobs.astype(jnp.float32)
        b, t, c = logprobs.shape
        beam = self._init_beam(b, init_lm_states)

        def body(carry, inputs):
            frame, t_idx = inputs
            active = t_idx < frame_lengths
            return self._step(carry, frame, active)

        frames = jnp.moveaxis(logprobs, 1, 0)
        beam, backpointers = jax.lax.scan(
            body, beam, (frames, jnp.arange(t))
        )

        p_total = jnp.logaddexp(beam.p_blank, beam.p_nonblank)
        p_lm = beam.p_lm
        if model_eos and self._lm_model is not None:
            p_lm = p_lm + self._lm_eos_scores(beam.lm_state)

        # Final LM state of the BEST hypothesis per line (the host
        # return_h contract, decoders.py:328-332) — a tiny in-graph
        # gather; only fetched when the caller asks for carry-over.
        if self._lm_model is not None:
            best = jnp.argmax(
                p_total + self.lm_scale * p_lm, axis=1
            )  # (B,)
            best_states = jax.tree_util.tree_map(
                lambda x: jnp.take_along_axis(
                    x, best.reshape((b, 1) + (1,) * (x.ndim - 2)), axis=1
                )[:, 0],
                beam.lm_state,
            )
        else:
            best_states = None
        return backpointers, beam.lengths, p_total, p_lm, best_states

    # ------------------------------------------------------------------
    def decode_batch(
        self,
        logprobs: np.ndarray,
        frame_lengths: Optional[np.ndarray] = None,
        model_eos: bool = False,
        init_lm_states=None,
        return_lm_states: bool = False,
    ):
        """(B, T, C) normalized log-probs -> one BagOfHypotheses per line.

        ``init_lm_states``: optional LM-state pytree with (B, ...) leaves
        seeding each line's beam (CARRY_H_OVER chaining; see
        :meth:`line_start_states` / :meth:`add_line_end`).
        ``return_lm_states``: additionally return the final best-hyp LM
        states as a (B, ...)-leaf pytree."""
        b, t, _ = logprobs.shape
        if frame_lengths is None:
            frame_lengths = np.full(b, t, np.int32)
        (bp_rows, bp_cols), lengths, p_total, p_lm, best_states = (
            self._decode_jit(
                jnp.asarray(logprobs, self.transport_dtype),
                jnp.asarray(frame_lengths, jnp.int32),
                model_eos,
                init_lm_states,
            )
        )
        bp_rows = np.asarray(bp_rows).astype(np.int64)   # (T, B, K)
        bp_cols = np.asarray(bp_cols).astype(np.int64)
        p_total = np.asarray(p_total)
        p_lm = np.asarray(p_lm)

        # Vectorized host backtrack: walk the (row, col) backpointers
        # from the final beam entries, RECORDING the emitted char id per
        # (t, beam) in one (T, B, K) array; strings materialize once per
        # beam afterwards (appending to strings per emit was O(len^2)
        # and dominated large-batch decode post-processing).
        t_total = bp_rows.shape[0]
        cursor = np.tile(np.arange(self.k)[None, :], (b, 1))  # (B, K)
        batch_idx = np.arange(b)[:, None]
        emitted = np.empty((t_total, b, self.k), np.int64)
        for t in range(t_total - 1, -1, -1):
            emitted[t] = bp_cols[t][batch_idx, cursor]
            cursor = bp_rows[t][batch_idx, cursor]
        texts = [
            [
                "".join(
                    self.letters[c]
                    for c in emitted[:, i, j]
                    if c < self.vocab
                )
                for j in range(self.k)
            ]
            for i in range(b)
        ]

        bags = []
        for i in range(b):
            bag = BagOfHypotheses(lm_weight=self.lm_scale)
            seen = set()
            for j in range(self.k):
                if p_total[i, j] <= NEG_INF / 2:
                    continue
                text = texts[i][j]
                if text in seen:
                    continue
                seen.add(text)
                bag.add(
                    text, float(p_total[i, j]),
                    float(p_lm[i, j]) if self._lm_model else 0,
                )
            bag.sort()
            bags.append(bag)
        if return_lm_states:
            return bags, best_states
        return bags

    # ------------------------------------------------------------------
    # CARRY_H_OVER state helpers (the host LMWrapper contract,
    # reference: pero_ocr/decoding/lm_wrapper.py:109-124, driven by
    # PageDecoder across consecutive lines, page_parser.py:129-135).
    # States are CharLM pytrees with (B, ...) leaves, kept on device.
    @property
    def supports_carry(self) -> bool:
        return self._lm_model is not None

    def line_start_states(self, b: int = 1):
        """Fresh per-line LM states: zero state after consuming ``</s>``."""
        from pero_ocr_tpu.models.charlm import CharLM

        model, variables = self._lm_model, self._lm_variables
        state = model.apply(variables, b, method=CharLM.initial_state)
        eos = jnp.full((b,), model.spec.eos_id, jnp.int32)
        return model.apply(variables, eos, state, method=CharLM.advance)

    def add_line_end(self, states):
        """Advance states by ``</s>`` (between-lines boundary)."""
        from pero_ocr_tpu.models.charlm import CharLM

        model, variables = self._lm_model, self._lm_variables
        b = jax.tree_util.tree_leaves(states)[0].shape[0]
        eos = jnp.full((b,), model.spec.eos_id, jnp.int32)
        return model.apply(variables, eos, states, method=CharLM.advance)

    def states_from_line(self, text: str):
        """Seed a (1, ...) state with a previous line's text + ``</s>``
        (used after a confident line skipped decoding; reference:
        lm_wrapper.py:116-124)."""
        from pero_ocr_tpu.models.charlm import CharLM

        model, variables = self._lm_model, self._lm_variables
        char_index = {c: i for i, c in enumerate(self.letters[:-1])}
        state = self.line_start_states(1)
        for ch in text:
            dec_id = char_index.get(ch)
            if dec_id is None:
                continue
            tok = self._lm_tokens(jnp.asarray([dec_id], jnp.int32))
            state = model.apply(
                variables, tok, state, method=CharLM.advance
            )
        return self.add_line_end(state)
