"""Drop-in model adapters for converted TorchScript binaries.

The reference's ParseNet / CTC recognizer checkpoints are TorchScript
archives (reference: pero_ocr/layout_engines/torch_parsenet.py:15,
pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-57).  These adapters wrap
:func:`pero_ocr_tpu.utils.ts_graph.ts_to_jax` output behind the same
``model.apply(variables, images)`` surface the framework's native flax
models expose, translating conventions:

- framework: NHWC float in [0, 1]  <->  torch models: NCHW float in
  [0, 1] (the scaling the reference applies at
  torch_parsenet.py:50 / pytorch_ocr_engine.py:61 lives in the ENGINE
  on both sides, so the adapters only transpose);
- ParseNet binaries return ``(out_map, extra)`` tuples
  (torch_parsenet.py:51) — the adapter keeps element 0 and returns NHWC
  maps;
- recognizer binaries return frame logits in EITHER layout — the
  reference's exported checkpoints emit ``(N, C, T)``
  (pytorch_ocr_engine.py:13-34 argmaxes dim 1 and permutes ``(0, 2, 1)``
  afterwards), while natively-distilled graphs emit ``(N, T, C)``.  The
  adapter probes TWO dummy widths: the axis that scales with the input
  width is the frame axis, which also yields the width subsampling and
  class count; a :class:`RecognizerSpec` is synthesized so the batching
  engine and the fast pipeline treat the converted model exactly like a
  native one (``apply`` always returns ``(N, T, C)``).

``variables`` is the flat ``{attr.path: array}`` dict from the
converter — a plain pytree, so the wrapped apply jits and shards like
any flax model's.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def is_torchscript_file(path: str) -> bool:
    """TorchScript archives are zip files; flax msgpack checkpoints are
    not — the 4-byte magic discriminates."""
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"PK\x03\x04"
    except OSError:
        return False


class TSParseNetModel:
    """ParseNet-family TorchScript binary behind the flax model surface."""

    def __init__(self, ts_module):
        from pero_ocr_tpu.utils.ts_graph import ts_to_jax

        self._fn, self.params = ts_to_jax(ts_module)

    @classmethod
    def load(cls, path: str) -> "TSParseNetModel":
        from pero_ocr_tpu.utils.ts_graph import load_torchscript

        logger.info("Loading TorchScript ParseNet binary %s", path)
        return cls(load_torchscript(path))

    @property
    def variables(self) -> Dict[str, np.ndarray]:
        return self.params

    def apply(self, variables, images):
        """images: (N, H, W, 3) float [0, 1] -> (N, H, W, C) maps."""
        import jax.numpy as jnp

        x = jnp.transpose(images, (0, 3, 1, 2))
        out = self._fn(variables, x)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return jnp.transpose(out, (0, 2, 3, 1))


@dataclasses.dataclass(frozen=True)
class TSRecognizerSpec:
    """Probed facts about a converted CTC recognizer binary, shaped like
    the fields of :class:`pero_ocr_tpu.models.recognizer.RecognizerSpec`
    the engines consult."""

    num_classes: int
    line_height: int
    subsampling: int
    embed_num: int = 0
    lstm_layers: int = -1  # unknown; only !=0 matters to callers


class TSRecognizerModel:
    """CTC-recognizer TorchScript binary behind the flax model surface."""

    def __init__(self, ts_module, line_height: int = 32,
                 embed_num: int = 0, probe_width: int = 256):
        from pero_ocr_tpu.utils.ts_graph import ts_to_jax

        self._fn, self.params = ts_to_jax(ts_module)
        self._embed = embed_num > 0

        def probe(width):
            dummy = np.zeros((1, 3, line_height, width), np.float32)
            args = (dummy,)
            if self._embed:
                args = (dummy, np.zeros((1,), np.int64))
            out = np.asarray(self._fn(self.params, *args))
            if out.ndim != 3:
                raise ValueError(
                    f"recognizer graph returned shape {out.shape}; "
                    "expected 3-D frame logits"
                )
            return out.shape

        # Two probe widths disambiguate the logits layout: the axis
        # that scales with the input width is the frame axis.  The
        # reference's exported checkpoints are (N, C, T)
        # (pytorch_ocr_engine.py:59-74); distilled graphs are (N, T, C).
        s1, s2 = probe(probe_width), probe(probe_width + 32)
        if s1[1] != s2[1] and s1[2] == s2[2]:
            self._frames_last = False          # (N, T, C)
            t1, classes = s1[1], s1[2]
        elif s1[2] != s2[2] and s1[1] == s2[1]:
            self._frames_last = True           # (N, C, T)
            t1, classes = s1[2], s1[1]
        else:
            raise ValueError(
                f"cannot identify the frame axis of recognizer logits "
                f"(probe shapes {s1} at width {probe_width}, {s2} at "
                f"{probe_width + 32})"
            )
        sub = probe_width / t1
        if not float(sub).is_integer():
            raise ValueError(
                f"non-integer width subsampling {sub} "
                f"(probe width {probe_width} -> {t1} frames)"
            )
        self.spec = TSRecognizerSpec(
            num_classes=int(classes),
            line_height=line_height,
            subsampling=int(sub),
            embed_num=embed_num,
        )

    @classmethod
    def load(cls, path: str, line_height: int = 32,
             embed_num: int = 0) -> "TSRecognizerModel":
        from pero_ocr_tpu.utils.ts_graph import load_torchscript

        logger.info("Loading TorchScript CTC recognizer binary %s", path)
        return cls(
            load_torchscript(path), line_height=line_height,
            embed_num=embed_num,
        )

    @property
    def variables(self) -> Dict[str, np.ndarray]:
        return self.params

    def apply(self, variables, images, embed_ids=None):
        """images: (N, H, W, 3) float [0, 1] -> (N, T, C) logits."""
        import jax.numpy as jnp

        x = jnp.transpose(images, (0, 3, 1, 2))
        if self._embed:
            if embed_ids is None:
                embed_ids = jnp.zeros((images.shape[0],), jnp.int32)
            out = self._fn(variables, x, embed_ids)
        else:
            out = self._fn(variables, x)
        if self._frames_last:  # (N, C, T) reference layout
            out = jnp.transpose(out, (0, 2, 1))
        return out
