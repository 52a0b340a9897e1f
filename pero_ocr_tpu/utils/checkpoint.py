"""Model checkpoint IO.

Flax variables are stored as msgpack (``flax.serialization``); this is
the TPU build's analog of the reference's TorchScript binaries / torch
state dicts (reference: pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-57,
transformer_ocr_engine.py:21-30).  Missing checkpoints fall back to
random initialization with a warning so the pipeline stays runnable in
hermetic tests.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Optional

import flax.serialization
import jax

logger = logging.getLogger(__name__)


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
    """Load `checkpoint` if it exists, else random-init via `init_fn`."""
    template = init_fn()
    if checkpoint and os.path.exists(checkpoint):
        try:
            return load_variables(checkpoint, template)
        except Exception as e:
            logger.warning(
                "Failed to load %s checkpoint %s (%s); using random init.",
                name, checkpoint, e,
            )
    else:
        if checkpoint:
            logger.warning(
                "Checkpoint %s for %s not found; using RANDOM weights "
                "(output will be garbage text).", checkpoint, name,
            )
    return template
