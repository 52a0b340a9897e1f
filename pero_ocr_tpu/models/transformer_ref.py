"""Flax mirror of the reference torch transformer's INFERENCE graph.

The framework's native transformer (:mod:`pero_ocr_tpu.models.transformer`)
is a pre-LN TPU-first design; reference checkpoints cannot load into it
because the reference is post-LN with a VGG16-slice frontend
(reference: pero_ocr/ocr_engine/transformer.py:51-146 conv frontend,
:365-386 encoder, :388-470 decoder layer, :511-564 top level).  This
module reproduces that compute graph exactly — conv/pool/affine stage
list, post-LN attention blocks, relu feed-forwards, shared
sentence-boundary BOS/EOS — so torch state dicts converted by
:func:`pero_ocr_tpu.utils.convert_torch.convert_torch_transformer` carry
over with numerical forward parity (tests/test_convert_torch.py).

Greedy decode still runs the TPU way: one ``lax.scan`` over positions
with flax's native KV cache, not the reference's per-token Python loop
(reference: pero_ocr/ocr_engine/transformer_ocr_engine.py:49-89).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.models.transformer import sinusoidal_positions


@dataclasses.dataclass(frozen=True)
class RefTransformerSpec:
    """Reference net config (the ``net_name`` JSON,
    reference: transformer.py:12-48) plus the charset size."""

    num_symbols: int              # charset incl. boundary + ignore (= torch num_classes)
    in_height: int = 40
    dim_model: int = 512
    dim_ff: int = 2048
    heads: int = 8
    encoder_layers: int = 4
    decoder_layers: int = 4
    subsampling: Tuple[int, int] = (8, 4)   # (vertical, horizontal)
    max_seq_len: int = 500
    dtype: Any = jnp.float32      # parity first; bf16 opt-in

    @staticmethod
    def from_net_config(cfg: dict, num_symbols: int,
                        in_height: int) -> "RefTransformerSpec":
        return RefTransformerSpec(
            num_symbols=num_symbols,
            in_height=in_height,
            dim_model=cfg["dim_model"],
            dim_ff=cfg["dim_ff"],
            heads=cfg["heads"],
            encoder_layers=cfg["encoder_layers"],
            decoder_layers=cfg["decoder_layers"],
            subsampling=tuple(cfg.get("conv_subsampling", (8, 4))),
            max_seq_len=cfg.get("max_seq_len", 500),
        )

    @property
    def boundary_id(self) -> int:
        """Shared BOS/EOS (reference: transformer_ocr_engine.py:18)."""
        return self.num_symbols - 2

    @property
    def ignore_id(self) -> int:
        return self.num_symbols - 1


def vgg_frontend_plan(subsampling: Tuple[int, int]):
    """Stage list of the reference frontend: VGG16 ``features[:17]``
    (64x2, 128x2, 256x3 conv/relu groups with pools) + one 512
    conv/leaky-relu block with a trailing BatchNorm, pool strides chosen
    per the running subsampling (reference: transformer.py:76-148,
    :334-363).  Returns (stages, (sub_v, sub_h)); stages are
    ("conv", feats, act) | ("pool", (sv, sh)) | ("affine", feats) —
    affine is the eval-mode BatchNorm (it sits AFTER the activation, so
    it cannot fold into a conv)."""
    groups = [(64, 2, "relu"), (128, 2, "relu"), (256, 3, "relu"),
              (512, 2, "leaky")]
    stages = []
    v = h = 1
    sub_v, sub_h = subsampling
    for feats, n, act in groups:
        for _ in range(n):
            stages.append(("conv", feats, act))
        sv = 2 if (sub_v is None or v < sub_v) else 1
        sh = 2 if h < sub_h else 1
        if (sv, sh) != (1, 1):
            stages.append(("pool", (sv, sh)))
        v *= sv
        h *= sh
        if act == "leaky":
            stages.append(("affine", feats))
    return tuple(stages), (v, h)


class RefConvFrontend(nn.Module):
    """Interprets the frontend plan; ends with the aggregation conv
    collapsing the height axis (reference: transformer.py:350-362)."""

    spec: RefTransformerSpec

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        sp = self.spec
        stages, (sub_v, _) = vgg_frontend_plan(sp.subsampling)
        x = images.astype(sp.dtype)
        ci = ai = 0
        for stage in stages:
            if stage[0] == "conv":
                _, feats, act = stage
                x = nn.Conv(
                    feats, (3, 3), padding="SAME", dtype=sp.dtype,
                    name=f"conv{ci}",
                )(x)
                ci += 1
                x = nn.relu(x) if act == "relu" else nn.leaky_relu(x)
            elif stage[0] == "pool":
                sv, sh = stage[1]
                x = nn.max_pool(x, (sv, sh), strides=(sv, sh),
                                padding="VALID")
            else:  # affine (eval-mode BatchNorm after the activation)
                feats = stage[1]
                scale = self.param(
                    f"affine{ai}_scale", nn.initializers.ones, (feats,)
                )
                shift = self.param(
                    f"affine{ai}_shift", nn.initializers.zeros, (feats,)
                )
                ai += 1
                x = x * scale + shift
        agg_h = sp.in_height // sub_v
        x = nn.Conv(
            sp.dim_model, (agg_h, 1), padding="VALID", dtype=sp.dtype,
            name="agg",
        )(x)
        x = nn.leaky_relu(x)
        return x[:, 0]  # (N, W', dim_model)


class RefEncoderLayer(nn.Module):
    """torch ``TransformerEncoderLayer`` (post-LN, relu FF)."""

    spec: RefTransformerSpec

    @nn.compact
    def __call__(self, x, mask=None):
        sp = self.spec
        y = nn.MultiHeadDotProductAttention(
            num_heads=sp.heads, dtype=sp.dtype, name="self_attn"
        )(x, x, mask=mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=sp.dtype, name="norm1")(x + y)
        y = nn.Dense(sp.dim_ff, dtype=sp.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(sp.dim_model, dtype=sp.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=sp.dtype, name="norm2")(x + y)


class RefDecoderLayer(nn.Module):
    """Reference ``DecoderLayer.infer`` semantics
    (transformer.py:421-447): post-LN self-attn, cross-attn, relu FF."""

    spec: RefTransformerSpec
    decode: bool = False

    @nn.compact
    def __call__(self, x, memory, self_mask=None):
        sp = self.spec
        y = nn.MultiHeadDotProductAttention(
            num_heads=sp.heads, dtype=sp.dtype, decode=self.decode,
            name="self_attn",
        )(x, x, mask=self_mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=sp.dtype, name="norm1")(x + y)
        y = nn.MultiHeadDotProductAttention(
            num_heads=sp.heads, dtype=sp.dtype, name="multihead_attn"
        )(x, memory)
        x = nn.LayerNorm(epsilon=1e-5, dtype=sp.dtype, name="norm2")(x + y)
        y = nn.Dense(sp.dim_ff, dtype=sp.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(sp.dim_model, dtype=sp.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=sp.dtype, name="norm3")(x + y)


class RefTransformerOCR(nn.Module):
    """Top-level mirror (reference: transformer.py:511-564).

    Entry points match the native model's: ``encode``, ``decode_train``
    (teacher forcing for per-step logits), ``decode_step`` /
    ``init_cache`` for the scan-based greedy decode."""

    spec: RefTransformerSpec
    decode: bool = False

    def setup(self):
        sp = self.spec
        self.frontend = RefConvFrontend(sp, name="encoder_frontend")
        self.input_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=sp.dtype, name="input_norm"
        )
        self.encoder_layers_ = [
            RefEncoderLayer(sp, name=f"enc{i}")
            for i in range(sp.encoder_layers)
        ]
        self.dec_embeder = nn.Embed(
            sp.num_symbols, sp.dim_model, dtype=sp.dtype, name="dec_embeder"
        )
        self.decoder_layers_ = [
            RefDecoderLayer(sp, decode=self.decode, name=f"dec{i}")
            for i in range(sp.decoder_layers)
        ]
        self.dec_out_proj = nn.Dense(
            sp.num_symbols, dtype=jnp.float32, name="dec_out_proj"
        )

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (N, H, W, 3) floats in [0, 1].  The reference applies
        input_norm BEFORE adding positions (transformer.py:378-381)."""
        sp = self.spec
        x = self.frontend(images)
        x = self.input_norm(x)
        x = x + sinusoidal_positions(x.shape[1], sp.dim_model).astype(sp.dtype)
        for layer in self.encoder_layers_:
            x = layer(x)
        return x

    def decode_train(self, memory, targets) -> jnp.ndarray:
        """targets: (N, L) token ids including the leading boundary."""
        sp = self.spec
        x = self.dec_embeder(targets)
        x = x + sinusoidal_positions(x.shape[1], sp.dim_model).astype(sp.dtype)
        causal = nn.make_causal_mask(targets)
        for layer in self.decoder_layers_:
            x = layer(x, memory, self_mask=causal)
        return self.dec_out_proj(x).astype(jnp.float32)

    def decode_step(self, memory, token, pos) -> jnp.ndarray:
        sp = self.spec
        x = self.dec_embeder(token[:, None])
        pe = sinusoidal_positions(sp.max_seq_len, sp.dim_model).astype(sp.dtype)
        x = x + pe[pos][:, None, :]
        for layer in self.decoder_layers_:
            x = layer(x, memory)
        return self.dec_out_proj(x)[:, 0].astype(jnp.float32)

    def init_cache(self, memory, max_len: int):
        sp = self.spec
        tokens = jnp.zeros((memory.shape[0], max_len), jnp.int32)
        x = self.dec_embeder(tokens)
        x = x + sinusoidal_positions(max_len, sp.dim_model).astype(sp.dtype)
        for layer in self.decoder_layers_:
            x = layer(x, memory)
        return x

    def __call__(self, images, targets):
        memory = self.encode(images)
        return self.decode_train(memory, targets)


def greedy_decode_ref(
    model: RefTransformerOCR, params, images: jnp.ndarray, max_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy AR decode as ONE lax.scan with KV caching; the shared
    sentence-boundary token both starts and terminates lines
    (reference: transformer_ocr_engine.py:53-89)."""
    sp = model.spec
    n = images.shape[0]
    decode_model = RefTransformerOCR(sp, decode=True)
    memory = model.apply(params, images, method=RefTransformerOCR.encode)
    _, cache_vars = decode_model.apply(
        {"params": params["params"]}, memory, max_len,
        method=RefTransformerOCR.init_cache, mutable=["cache"],
    )

    def step(carry, pos):
        token, cache, alive = carry
        logits, new_vars = decode_model.apply(
            {"params": params["params"], "cache": cache},
            memory, token, jnp.full((n,), pos, jnp.int32),
            method=RefTransformerOCR.decode_step, mutable=["cache"],
        )
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(alive, next_token, sp.boundary_id)
        alive = alive & (next_token != sp.boundary_id)
        return (next_token, new_vars["cache"], alive), (next_token, logits)

    init = (
        jnp.full((n,), sp.boundary_id, jnp.int32),
        cache_vars["cache"],
        jnp.ones((n,), bool),
    )
    _, (tokens, logits) = jax.lax.scan(step, init, jnp.arange(max_len))
    tokens = tokens.T                      # (N, max_len)
    logits = jnp.moveaxis(logits, 0, 1)    # (N, max_len, num_symbols)
    lengths = jnp.sum(
        jnp.cumsum(tokens == sp.boundary_id, axis=1) == 0, axis=1
    )
    return tokens, lengths, logits
