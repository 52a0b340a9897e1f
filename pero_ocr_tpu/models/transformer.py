"""Autoregressive transformer OCR model, TPU-native.

Capability-equivalent to the reference's in-repo torch transformer
(reference: pero_ocr/ocr_engine/transformer.py:12-564): VGG-style conv
encoder with (8, 4) subsampling, sinusoidal positions, self-attention
encoder, KV-cached causal decoder, greedy decode with per-line early
exit.

TPU-first design: decoding runs as ONE jitted ``lax.scan`` over output
positions with a preallocated KV cache and an alive mask — the reference
instead runs a Python ``while`` loop with a device round trip per token
(reference: pero_ocr/ocr_engine/transformer_ocr_engine.py:49-89).
Flax's ``nn.MultiHeadDotProductAttention(decode=True)`` supplies the
cache mechanics natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransformerSpec:
    """Architecture spec, serialized as ``net_spec`` in the OCR JSON."""

    num_classes: int = 0          # charset + BOS/EOS handling below
    line_height: int = 40
    conv_features: Tuple[int, ...] = (64, 128, 256)
    subsampling: int = 4          # horizontal subsample of the conv front
    d_model: int = 512
    num_heads: int = 8
    encoder_layers: int = 4
    decoder_layers: int = 4
    mlp_dim: int = 1024
    max_decode_len: int = 256
    dtype: Any = jnp.bfloat16

    @staticmethod
    def from_json_dict(cfg: dict, num_classes: int) -> "TransformerSpec":
        spec = cfg.get("net_spec", {})
        return TransformerSpec(
            num_classes=num_classes,
            line_height=cfg.get("line_px_height", 40),
            conv_features=tuple(spec.get("conv_features", (64, 128, 256))),
            subsampling=spec.get("subsampling", 4),
            d_model=spec.get("d_model", 512),
            num_heads=spec.get("num_heads", 8),
            encoder_layers=spec.get("encoder_layers", 4),
            decoder_layers=spec.get("decoder_layers", 4),
            mlp_dim=spec.get("mlp_dim", 1024),
            max_decode_len=spec.get("max_decode_len", 256),
        )

    @property
    def bos_id(self) -> int:
        return self.num_classes

    @property
    def eos_id(self) -> int:
        return self.num_classes + 1

    @property
    def vocab(self) -> int:
        return self.num_classes + 2


def sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


class ConvFrontend(nn.Module):
    """VGG-style conv stack producing a 1D feature sequence
    (reference contract: transformer.py:75-148, :335-363)."""

    spec: TransformerSpec

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        sp = self.spec
        import math

        w_blocks = int(math.log2(sp.subsampling))
        x = images.astype(sp.dtype)
        for i, feat in enumerate(sp.conv_features):
            x = nn.Conv(feat, (3, 3), dtype=sp.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(feat, (3, 3), dtype=sp.dtype)(x)
            x = nn.relu(x)
            stride_w = 2 if i < w_blocks else 1
            x = nn.max_pool(x, (2, 2), strides=(2, stride_w), padding="SAME")
        h = x.shape[1]
        x = nn.Conv(sp.d_model, (h, 1), padding="VALID", dtype=sp.dtype)(x)
        return x[:, 0]  # (N, W', d_model)


class EncoderLayer(nn.Module):
    spec: TransformerSpec

    @nn.compact
    def __call__(self, x, mask=None):
        sp = self.spec
        y = nn.LayerNorm(dtype=sp.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=sp.num_heads, dtype=sp.dtype
        )(y, y, mask=mask)
        x = x + y
        y = nn.LayerNorm(dtype=sp.dtype)(x)
        y = nn.Dense(sp.mlp_dim, dtype=sp.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(sp.d_model, dtype=sp.dtype)(y)
        return x + y


class DecoderLayer(nn.Module):
    spec: TransformerSpec
    decode: bool = False

    @nn.compact
    def __call__(self, x, memory, self_mask=None, cross_mask=None):
        sp = self.spec
        y = nn.LayerNorm(dtype=sp.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=sp.num_heads, dtype=sp.dtype, decode=self.decode
        )(y, y, mask=self_mask)
        x = x + y
        y = nn.LayerNorm(dtype=sp.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=sp.num_heads, dtype=sp.dtype
        )(y, memory, mask=cross_mask)
        x = x + y
        y = nn.LayerNorm(dtype=sp.dtype)(x)
        y = nn.Dense(sp.mlp_dim, dtype=sp.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(sp.d_model, dtype=sp.dtype)(y)
        return x + y


class TransformerOCR(nn.Module):
    """Encoder-decoder OCR model with three entry points:

    - ``encode(images)`` -> memory
    - ``decode_train(memory, targets)`` -> logits (teacher forcing)
    - ``decode_step(memory, token, pos)`` -> next-token logits (cached)
    """

    spec: TransformerSpec
    decode: bool = False

    def setup(self):
        sp = self.spec
        self.frontend = ConvFrontend(sp)
        self.encoder_layers_ = [
            EncoderLayer(sp) for _ in range(sp.encoder_layers)
        ]
        self.encoder_norm = nn.LayerNorm(dtype=sp.dtype)
        self.embed = nn.Embed(sp.vocab, sp.d_model, dtype=sp.dtype)
        self.decoder_layers_ = [
            DecoderLayer(sp, decode=self.decode)
            for _ in range(sp.decoder_layers)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=sp.dtype)
        self.out_proj = nn.Dense(sp.vocab, dtype=jnp.float32)

    def encode(self, images: jnp.ndarray, src_valid=None) -> jnp.ndarray:
        sp = self.spec
        x = self.frontend(images)
        x = x + sinusoidal_positions(x.shape[1], sp.d_model).astype(sp.dtype)
        mask = None
        if src_valid is not None:
            mask = nn.make_attention_mask(
                jnp.ones((x.shape[0], x.shape[1]), bool), src_valid
            )
        for layer in self.encoder_layers_:
            x = layer(x, mask=mask)
        return self.encoder_norm(x)

    def decode_train(
        self, memory: jnp.ndarray, targets: jnp.ndarray, src_valid=None
    ) -> jnp.ndarray:
        """Teacher-forced decode: targets (N, L) including BOS prefix."""
        sp = self.spec
        x = self.embed(targets)
        x = x + sinusoidal_positions(x.shape[1], sp.d_model).astype(sp.dtype)
        causal = nn.make_causal_mask(targets)
        cross = None
        if src_valid is not None:
            cross = nn.make_attention_mask(
                jnp.ones_like(targets, bool), src_valid
            )
        for layer in self.decoder_layers_:
            x = layer(x, memory, self_mask=causal, cross_mask=cross)
        x = self.decoder_norm(x)
        return self.out_proj(x).astype(jnp.float32)

    def decode_step(
        self, memory: jnp.ndarray, token: jnp.ndarray, pos: jnp.ndarray,
        src_valid=None,
    ) -> jnp.ndarray:
        """Single cached decode step: token (N,), pos (N,) -> logits (N, V)."""
        sp = self.spec
        x = self.embed(token[:, None])
        pe = sinusoidal_positions(sp.max_decode_len, sp.d_model).astype(sp.dtype)
        x = x + pe[pos][:, None, :]
        cross = None
        if src_valid is not None:
            cross = nn.make_attention_mask(
                jnp.ones((x.shape[0], 1), bool), src_valid
            )
        for layer in self.decoder_layers_:
            x = layer(x, memory, self_mask=None, cross_mask=cross)
        x = self.decoder_norm(x)
        return self.out_proj(x)[:, 0].astype(jnp.float32)

    def init_cache(self, memory: jnp.ndarray, max_len: int):
        """Allocate the full-length KV cache: a forward pass over a zeros
        sequence while the 'cache' collection is mutable-but-empty makes
        each cached attention create (N, max_len, ...) cache variables."""
        sp = self.spec
        n = memory.shape[0]
        tokens = jnp.zeros((n, max_len), jnp.int32)
        x = self.embed(tokens)
        x = x + sinusoidal_positions(max_len, sp.d_model).astype(sp.dtype)
        for layer in self.decoder_layers_:
            x = layer(x, memory)
        return self.decoder_norm(x)

    def __call__(self, images, targets):
        """Training forward: images + BOS-prefixed targets -> logits."""
        memory = self.encode(images)
        return self.decode_train(memory, targets)


def greedy_decode(
    model: TransformerOCR,
    params,
    images: jnp.ndarray,
    max_len: int,
    src_valid=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jit-friendly greedy AR decode with alive masking.

    Returns (tokens (N, max_len), lengths (N,), confidences (N,)).
    Dead (EOS'd) lines emit EOS; the loop is a fixed-length scan (early
    exit happens at the XLA level only through the alive mask zeroing
    work, matching the reference's alive-mask loop semantics,
    reference: transformer_ocr_engine.py:56-81).  ``confidences`` is the
    minimum chosen-token probability over the emitted characters (the
    transformer analog of the CTC worst-run get_prob measure; the
    reference's transformer confidence likewise reads the probability
    at the label, confidence_estimation.py:107-110)."""
    sp = model.spec
    n = images.shape[0]

    decode_model = TransformerOCR(sp, decode=True)
    memory = model.apply(params, images, method=TransformerOCR.encode)

    # Allocate the full-length KV cache (see init_cache docstring).
    dummy_token = jnp.full((n,), sp.bos_id, jnp.int32)
    _, cache_vars = decode_model.apply(
        {"params": params["params"]},
        memory,
        max_len,
        method=TransformerOCR.init_cache,
        mutable=["cache"],
    )

    def step(carry, pos):
        token, cache, alive = carry
        logits, new_vars = decode_model.apply(
            {"params": params["params"], "cache": cache},
            memory,
            token,
            jnp.full((n,), pos, jnp.int32),
            method=TransformerOCR.decode_step,
            mutable=["cache"],
        )
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        chosen_lp = jnp.max(jax.nn.log_softmax(logits, axis=-1), axis=-1)
        next_token = jnp.where(alive, next_token, sp.eos_id)
        # Dead lines contribute nothing to the confidence minimum.
        chosen_lp = jnp.where(alive, chosen_lp, 0.0)
        alive = alive & (next_token != sp.eos_id)
        return (next_token, new_vars["cache"], alive), (
            next_token, chosen_lp
        )

    init = (dummy_token, cache_vars["cache"], jnp.ones((n,), bool))
    _, (tokens, step_lp) = jax.lax.scan(step, init, jnp.arange(max_len))
    tokens = tokens.T          # (N, max_len)
    step_lp = step_lp.T        # (N, max_len)
    lengths = jnp.sum(tokens != sp.eos_id, axis=1)
    emitted = jnp.arange(max_len)[None, :] < lengths[:, None]
    confidences = jnp.exp(
        jnp.min(jnp.where(emitted, step_lp, 0.0), axis=1)
    ).astype(jnp.float32)
    return tokens, lengths, confidences


def beam_decode(
    model: TransformerOCR,
    params,
    images: jnp.ndarray,
    max_len: int,
    k: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jit-friendly BEAM-search AR decode — one fixed-length lax.scan
    with per-step KV-cache reordering (a batch-dim gather plays the
    role the reference's unused ``cache_index_select`` was written for,
    reference: pero_ocr/ocr_engine/transformer.py:262-283; its engine
    only ever decodes greedily).  Goes beyond the reference: the
    returned sequence maximizes the JOINT log-probability over k beams.

    Same contract as :func:`greedy_decode`: (tokens (N, max_len),
    lengths (N,), confidences (N,)); confidences are the minimum
    chosen-token probability along the winning beam.  ``k=1`` is
    exactly greedy."""
    sp = model.spec
    n = images.shape[0]
    neg = -1e9

    decode_model = TransformerOCR(sp, decode=True)
    memory = model.apply(params, images, method=TransformerOCR.encode)
    memory = jnp.repeat(memory, k, axis=0)  # (N*k, W, C)

    _, cache_vars = decode_model.apply(
        {"params": params["params"]},
        memory,
        max_len,
        method=TransformerOCR.init_cache,
        mutable=["cache"],
    )

    def step(carry, pos):
        token, cache, scores, done = carry
        logits, new_vars = decode_model.apply(
            {"params": params["params"], "cache": cache},
            memory,
            token,
            jnp.full((n * k,), pos, jnp.int32),
            method=TransformerOCR.decode_step,
            mutable=["cache"],
        )
        lp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        ).reshape(n, k, -1)
        v = lp.shape[-1]
        is_eos = jnp.arange(v) == sp.eos_id
        # Finished beams continue ONLY through EOS at zero cost (their
        # score is frozen); alive beams extend by any token.
        cont = jnp.where(
            done[:, :, None],
            jnp.where(is_eos[None, None, :], 0.0, neg),
            lp,
        )
        cand = scores[:, :, None] + cont
        new_scores, flat_idx = jax.lax.top_k(cand.reshape(n, k * v), k)
        parent = flat_idx // v                        # (N, K)
        tok = (flat_idx % v).astype(jnp.int32)
        # Per-step chosen log-prob of each surviving beam (for the
        # min-prob confidence measure).
        delta = new_scores - jnp.take_along_axis(scores, parent, axis=1)
        rows = (jnp.arange(n)[:, None] * k + parent).reshape(-1)
        cache = jax.tree_util.tree_map(
            lambda x: x[rows]
            if (getattr(x, "ndim", 0) >= 1 and x.shape[0] == n * k)
            else x,
            new_vars["cache"],
        )
        new_done = (
            jnp.take_along_axis(done, parent, axis=1)
            | (tok == sp.eos_id)
        )
        return (tok.reshape(-1), cache, new_scores, new_done), (
            parent, tok, delta
        )

    init = (
        jnp.full((n * k,), sp.bos_id, jnp.int32),
        cache_vars["cache"],
        jnp.tile(
            jnp.where(jnp.arange(k) == 0, 0.0, neg)[None, :], (n, 1)
        ),
        jnp.zeros((n, k), bool),
    )
    (_, _, final_scores, _), (parents, toks, deltas) = jax.lax.scan(
        step, init, jnp.arange(max_len)
    )

    # In-graph backtrack of the best-scoring beam: walk the per-step
    # (parent, token) backpointers from argmax(final_scores).
    best = jnp.argmax(final_scores, axis=1)  # (N,)
    line_idx = jnp.arange(n)

    def back(cursor, inputs):
        parent_t, tok_t, delta_t = inputs
        token = tok_t[line_idx, cursor]
        lp_t = delta_t[line_idx, cursor]
        return parent_t[line_idx, cursor], (token, lp_t)

    _, (rev_tokens, rev_lp) = jax.lax.scan(
        back, best, (parents[::-1], toks[::-1], deltas[::-1])
    )
    tokens = rev_tokens[::-1].T    # (N, max_len)
    step_lp = rev_lp[::-1].T
    lengths = jnp.sum(tokens != sp.eos_id, axis=1)
    emitted = jnp.arange(max_len)[None, :] < lengths[:, None]
    confidences = jnp.exp(
        jnp.min(jnp.where(emitted, step_lp, 0.0), axis=1)
    ).astype(jnp.float32)
    return tokens, lengths, confidences
