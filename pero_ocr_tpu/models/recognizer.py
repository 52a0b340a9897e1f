"""CTC line recognizer: VGG-style conv frontend + BLSTM, TPU-native.

Capability-equivalent to the reference's TorchScript CNN+BLSTM CTC models
(reference: pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-74): horizontal
subsampling 4, optional writer/style embedding input
(pytorch_ocr_engine.py:64-66), logits over charset + trailing blank.

TPU-first design choices:
- static bucketed widths (the engine pads lines into width buckets);
- bfloat16 conv/LSTM compute, float32 logits;
- the bidirectional LSTM runs as two `nn.RNN` scans over the width axis —
  XLA fuses the per-step matmuls into MXU-friendly batched GEMMs;
- height is collapsed by strided convs instead of per-column pooling
  loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RecognizerSpec:
    """Architecture spec; serialized in the OCR engine JSON as
    ``net_spec`` (our TPU-native analog of the reference's ``net_name``)."""

    num_classes: int = 0           # charset size incl. blank (last)
    line_height: int = 32
    conv_features: Sequence[int] = (48, 96, 192, 384)
    subsampling: int = 4           # horizontal subsample factor
    lstm_layers: int = 2
    lstm_features: int = 256
    embed_num: int = 0             # number of writer embeddings (0 = off)
    embed_dim: int = 64
    dtype: Any = jnp.bfloat16
    stem: str = "conv"             # "s2d" = space-to-depth fast stem
    norm: str = "none"             # "group" = GroupNorm after each conv

    @staticmethod
    def from_json_dict(cfg: dict, num_classes: int) -> "RecognizerSpec":
        spec = cfg.get("net_spec", {})
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            spec.get("dtype", "bfloat16")
        ]
        return RecognizerSpec(
            num_classes=num_classes,
            line_height=cfg.get("line_px_height", 32),
            conv_features=tuple(spec.get("conv_features", (48, 96, 192, 384))),
            subsampling=spec.get("subsampling", 4),
            lstm_layers=spec.get("lstm_layers", 2),
            lstm_features=spec.get("lstm_features", 256),
            embed_num=cfg.get("embed_num", 0) or 0,
            embed_dim=spec.get("embed_dim", 64),
            dtype=dtype,
            stem=spec.get("stem", "conv"),
            norm=spec.get("norm", "none"),
        )


class VGGEncoder(nn.Module):
    """Conv frontend: downsamples H aggressively and W by `subsampling`,
    ends with a height-collapse producing a (N, W', F) sequence."""

    spec: RecognizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        sp = self.spec
        dtype = sp.dtype
        x = x.astype(dtype)

        # Horizontal subsampling happens in the first log2(subsampling)
        # blocks; height halves every block.
        import math

        w_sub_blocks = int(math.log2(sp.subsampling))
        w_done = 0
        if sp.stem == "s2d":
            # 2x2 space-to-depth: the widest conv level moves to half
            # resolution (small-channel full-res convs are
            # bandwidth-bound on TPU — same finding as the layout net's
            # fast stem, models/parsenet.py).  Counts as one W subsample,
            # so the frame rate (W' = W / subsampling) is unchanged.
            from pero_ocr_tpu.models.parsenet import space_to_depth

            x = space_to_depth(x, 2)
            w_done = 1
        # He init for the ReLU stack: with the flax default (lecun),
        # each ReLU layer shrinks activation variance ~2x, and at this
        # depth (9 conv layers) the encoder output lands at ~0.02 scale
        # — the conv gradients become noise next to the BLSTM/bias path
        # and CTC training collapses to the input-independent marginal
        # distribution (measured: round-5 training experiments).  Tied
        # to norm="group" (the deep trainable config) so legacy
        # norm-free specs keep their exact training trajectories.
        if sp.norm == "group":
            kinit = nn.initializers.he_normal()
        else:
            kinit = nn.initializers.lecun_normal()  # the flax default

        def maybe_norm(x, feat):
            if sp.norm == "group":
                return nn.GroupNorm(
                    num_groups=min(8, feat), dtype=dtype
                )(x)
            return x

        for i, feat in enumerate(sp.conv_features):
            x = nn.Conv(feat, (3, 3), dtype=dtype, kernel_init=kinit)(x)
            x = maybe_norm(x, feat)
            x = nn.relu(x)
            x = nn.Conv(feat, (3, 3), dtype=dtype, kernel_init=kinit)(x)
            x = maybe_norm(x, feat)
            x = nn.relu(x)
            stride_w = 2 if i + w_done < w_sub_blocks else 1
            x = nn.max_pool(x, (2, 2), strides=(2, stride_w), padding="SAME")

        # Collapse remaining height with a full-height conv.
        h = x.shape[1]
        x = nn.Conv(
            sp.conv_features[-1], (h, 1), padding="VALID", dtype=dtype,
            kernel_init=kinit,
        )(x)
        x = maybe_norm(x, sp.conv_features[-1])
        x = nn.relu(x)
        return x[:, 0]  # (N, W', F)


class _BiLSTMStep(nn.Module):
    """One time step advancing BOTH directions: the two cells' matmuls
    are independent, so XLA issues them concurrently inside a single
    scan step — halving the sequential step count of the recurrence
    (the latency-bound part of the recognizer on TPU)."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, carry, inputs):
        x_fwd, x_bwd = inputs
        carry_fwd, carry_bwd = carry
        new_fwd, y_fwd = nn.OptimizedLSTMCell(
            self.features, dtype=self.dtype, name="fwd"
        )(carry_fwd, x_fwd)
        new_bwd, y_bwd = nn.OptimizedLSTMCell(
            self.features, dtype=self.dtype, name="bwd"
        )(carry_bwd, x_bwd)
        return (new_fwd, new_bwd), (y_fwd, y_bwd)


class FusedBiLSTM(nn.Module):
    """Bidirectional LSTM as ONE fused scan over time."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        xs = jnp.moveaxis(x, 1, 0)          # (T, B, F)
        xs_rev = jnp.flip(xs, axis=0)

        zeros = jnp.zeros((b, self.features), self.dtype)
        carry0 = ((zeros, zeros), (zeros, zeros))

        scan = nn.scan(
            _BiLSTMStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, (ys_fwd, ys_bwd) = scan(self.features, dtype=self.dtype)(
            carry0, (xs, xs_rev)
        )
        return jnp.concatenate(
            [
                jnp.moveaxis(ys_fwd, 0, 1),
                jnp.flip(jnp.moveaxis(ys_bwd, 0, 1), axis=1),
            ],
            axis=-1,
        )


class BLSTMStack(nn.Module):
    """Bidirectional LSTM layers; ``lstm_layers=0`` selects a conv-only
    recognizer (1-D convs over the sequence) — ~10x faster on TPU where
    the LSTM recurrence is latency-bound, at some accuracy cost."""

    spec: RecognizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sp = self.spec
        if sp.lstm_layers == 0:
            for _ in range(2):
                y = nn.Conv(2 * sp.lstm_features, (5,), dtype=sp.dtype)(x)
                x = nn.relu(y)
            return x
        for _ in range(sp.lstm_layers):
            x = FusedBiLSTM(sp.lstm_features, dtype=sp.dtype)(x)
        return x


class CTCRecognizer(nn.Module):
    """Full CTC line recognizer."""

    spec: RecognizerSpec

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        embed_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """images: (N, H, W, 3) float32 in [0, 1].
        embed_ids: (N,) int32 writer-embedding ids, or None.
        Returns logits (N, W // subsampling, num_classes) float32."""
        sp = self.spec
        x = VGGEncoder(sp)(images, train=train)

        if sp.embed_num:
            embeddings = nn.Embed(sp.embed_num + 1, sp.embed_dim, dtype=sp.dtype)
            if embed_ids is None:
                # Mean-embedding id convention: the extra last row stands in
                # for "unknown writer" (reference: pytorch_ocr_engine.py:64-66
                # uses the mean embedding as the last id).
                embed_ids = jnp.full((x.shape[0],), sp.embed_num, jnp.int32)
            e = embeddings(embed_ids)[:, None, :]
            e = jnp.broadcast_to(e, (x.shape[0], x.shape[1], sp.embed_dim))
            x = jnp.concatenate([x, e], axis=-1)

        x = BLSTMStack(sp)(x)
        logits = nn.Dense(sp.num_classes, dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)


def init_recognizer(
    spec: RecognizerSpec, rng: jax.Array, width: int = 128
) -> Tuple[CTCRecognizer, Any]:
    model = CTCRecognizer(spec)
    dummy = jnp.zeros((1, spec.line_height, width, 3), jnp.float32)
    variables = model.init(rng, dummy)
    return model, variables
