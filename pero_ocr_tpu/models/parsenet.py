"""ParseNet: the layout-detection CNN, TPU-native.

Produces the same 5-channel output map contract as the reference's
TorchScript ParseNet binary (channel semantics documented at
reference: pero_ocr/layout_engines/cnn_layout_engine.py:128-133 and
line_in_region_detector.py:13-15):

    0: ascender height regression (px, at map resolution)
    1: descender height regression
    2: baseline probability
    3: line-endpoint probability
    4: region-separator probability

plus OrientationNet, a small CNN emitting per-pixel (x, y) text-direction
vectors (reference: torch_parsenet.py:105-127).

Architecture (ours, TPU-first): a U-Net with stride-2 conv downsampling
x4 and transposed-conv upsampling with skip connections.  All convs run
in bfloat16 with float32 params/outputs; channel counts are multiples of
8 to map onto VPU/MXU lanes.  Heights are regressed with softplus (>=0);
probability channels are emitted as probabilities in [0, 1]
(sigmoid-activated) to match the reference maps' value range.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    # GroupNorm's reductions cost as much as the convs at full map
    # resolution on TPU; the full-res level runs norm-free (a standard
    # segmentation-stem design), deeper levels keep it.
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
        return nn.relu(x)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b) exact rearrangement."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, c * block * block
    )


class ParseNet(nn.Module):
    """U-Net emitting the 5-channel layout map stack.

    ``stem="s2d"`` (opt-in, measured 24.4 -> ~7ms per 4-page stage-A
    dispatch on v5e): a 2x2 space-to-depth rearrangement moves the first
    conv level to half resolution — small-channel full-resolution convs
    are bandwidth-bound on TPU (channel counts far below the 128-lane
    MXU width), so halving the spatial extent of the widest level wins
    ~3.5x on the whole net.  The rearrangement is information-exact; a
    thin norm-free full-resolution refinement head restores output
    resolution for the 1px baseline masks.  Train with
    parallel/train.make_parsenet_train_step; the default "conv" stem
    keeps existing checkpoints loadable."""

    base_features: int = 32
    depth: int = 4
    out_channels: int = 5
    dtype: Any = jnp.bfloat16
    stem: str = "conv"          # "conv" | "s2d"
    head_features: int = 8      # s2d full-res refinement width
    # Super-resolving output head: emit maps at out_upsample x the INPUT
    # resolution (thin transposed-conv levels at head_features).  With
    # out_upsample=2 the detector reads a 1/2ds canvas but its maps —
    # and therefore the adaptive-downsample band check, the CC parse,
    # and every baseline coordinate — live at map scale ds, so the
    # reference's [9, 15] map-px height band semantics
    # (torch_parsenet.py:28-35) hold while the canvas UPLOAD and the
    # U-Net body shrink 4x.  The capability trade (the net must resolve
    # lines from half-band input px) is a training-time property; gate
    # it like any detector swap: detection recall + height parity on
    # held-out pages (tests/test_pipeline.py::test_sr_head_detection_parity).
    out_upsample: int = 1

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (N, H, W, 3) float32 in [0, 1]; H, W multiples of 2**depth.

        Returns (N, H * out_upsample, W * out_upsample, 5) float32 maps."""
        x = images.astype(self.dtype)
        skips = []
        if self.stem == "s2d":
            x = space_to_depth(x, 2)
            features = self.base_features * 2
            n_levels = self.depth - 1
        else:
            features = self.base_features
            n_levels = self.depth
        for level in range(n_levels):
            x = ConvBlock(features, dtype=self.dtype, use_norm=level > 0)(x)
            skips.append(x)
            x = nn.Conv(features, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            features *= 2

        x = ConvBlock(features, dtype=self.dtype)(x)

        for level, skip in enumerate(reversed(skips)):
            features //= 2
            x = nn.ConvTranspose(
                features, (2, 2), strides=(2, 2), dtype=self.dtype
            )(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(
                features, dtype=self.dtype,
                use_norm=level < n_levels - 1,
            )(x)

        if self.stem == "s2d":
            # Thin full-resolution head: one transposed conv back to H, W
            # + one norm-free 3x3 at head_features channels (cheap at
            # full res) so masks keep single-pixel precision.
            x = nn.ConvTranspose(
                self.head_features, (2, 2), strides=(2, 2), dtype=self.dtype
            )(x)
            x = nn.relu(x)
            x = nn.Conv(self.head_features, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(x)

        up = self.out_upsample
        if up & (up - 1) or up < 1:
            raise ValueError(f"out_upsample={up} must be a power of two")
        while up > 1:
            # Super-resolving levels: same thin norm-free shape as the
            # s2d head, one per octave above input resolution.
            x = nn.ConvTranspose(
                self.head_features, (2, 2), strides=(2, 2), dtype=self.dtype
            )(x)
            x = nn.relu(x)
            x = nn.Conv(self.head_features, (3, 3), dtype=self.dtype)(x)
            x = nn.relu(x)
            up //= 2

        x = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32)(x)
        x = x.astype(jnp.float32)
        heights = jax.nn.softplus(x[..., :2])
        probs = jax.nn.sigmoid(x[..., 2:])
        return jnp.concatenate([heights, probs], axis=-1)


class OrientationNet(nn.Module):
    """Per-pixel text-direction (x, y) unit-vector map."""

    base_features: int = 16
    depth: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(self.dtype)
        features = self.base_features
        skips = []
        for _ in range(self.depth):
            x = ConvBlock(features, dtype=self.dtype)(x)
            skips.append(x)
            x = nn.Conv(features, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            features *= 2
        x = ConvBlock(features, dtype=self.dtype)(x)
        for skip in reversed(skips):
            features //= 2
            x = nn.ConvTranspose(features, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(features, dtype=self.dtype)(x)
        # Raw (x, y) direction components; consumers take arctan2 of the
        # channels, so magnitude carries no meaning (reference contract:
        # cnn_layout_engine.py:35-54).
        return nn.Conv(2, (1, 1), dtype=jnp.float32)(x).astype(jnp.float32)


def pad_to_multiple(image, multiple: int = 16):
    """Pad H, W up to a multiple (host-side helper for static shapes).
    Returns (padded, (orig_h, orig_w))."""
    import numpy as np

    h, w = image.shape[:2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return image, (h, w)
