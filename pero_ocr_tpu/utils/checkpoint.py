"""Model checkpoint IO.

Flax variables are stored as msgpack (``flax.serialization``); this is
the TPU build's analog of the reference's TorchScript binaries / torch
state dicts (reference: pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-57,
transformer_ocr_engine.py:21-30).

Loading policy: by default (library use, hermetic tests) a missing
checkpoint falls back to random initialization with a warning so the
pipeline stays runnable without artifacts.  Production CLIs call
:func:`set_strict_loading` so a missing/corrupt checkpoint is a hard
error instead — matching the reference, where ``torch.jit.load`` raises
on a bad path (reference: pero_ocr/layout_engines/torch_parsenet.py:15)
and a typo'd path can never yield a successful garbage-text run.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Optional

import flax.serialization
import jax

logger = logging.getLogger(__name__)

_STRICT_LOADING = False


def set_strict_loading(strict: bool) -> None:
    """Make missing/corrupt checkpoints a hard error process-wide.

    Called by production CLIs (parse_folder.py and friends) unless the
    user passes ``--allow-random-weights``."""
    global _STRICT_LOADING
    _STRICT_LOADING = bool(strict)


def strict_loading_enabled() -> bool:
    return _STRICT_LOADING


def save_variables(variables: Any, path: str) -> None:
    data = flax.serialization.to_bytes(variables)
    with open(path, "wb") as f:
        f.write(data)


def load_variables(path: str, template: Any) -> Any:
    """Restore variables into the structure of `template`."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


def load_or_init(
    checkpoint: Optional[str],
    init_fn: Callable[[], Any],
    name: str = "model",
) -> Any:
    """Load `checkpoint` if it exists, else random-init via `init_fn`.

    Under :func:`set_strict_loading` a missing or unreadable checkpoint
    raises instead of degrading to random weights."""
    template = init_fn()
    if checkpoint and os.path.exists(checkpoint):
        try:
            return load_variables(checkpoint, template)
        except Exception as e:
            if _STRICT_LOADING:
                raise ValueError(
                    f"Failed to load {name} checkpoint {checkpoint}: {e}"
                ) from e
            logger.warning(
                "Failed to load %s checkpoint %s (%s); using random init.",
                name, checkpoint, e,
            )
    else:
        if checkpoint:
            if _STRICT_LOADING:
                raise FileNotFoundError(
                    f"Checkpoint {checkpoint} for {name} not found. "
                    "Fix the path, or pass --allow-random-weights to run "
                    "with random initialization."
                )
            logger.warning(
                "Checkpoint %s for %s not found; using RANDOM weights "
                "(output will be garbage text).", checkpoint, name,
            )
    return template
