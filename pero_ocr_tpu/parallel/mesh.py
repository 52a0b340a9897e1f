"""Device mesh construction and sharding rules.

The reference scales out with a host process pool
(reference: user_scripts/parse_folder.py:341-346); the TPU build scales
through a ``jax.sharding.Mesh`` (SURVEY.md §5.8):

- ``dp`` (data) axis: pages / line-batches are independent -> pure data
  parallelism over ICI, no collectives in the math;
- ``tp`` (tensor) axis: feature dimensions of large Dense/Conv kernels
  are sharded; GSPMD inserts the all-gathers/reduce-scatters.

``param_sharding_rules`` derives a NamedSharding for every parameter
leaf: trailing feature axes divisible by the tp size get sharded, the
rest are replicated.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, tp: int = 1
) -> Mesh:
    """Build a (dp, tp) mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % tp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by tp={tp}")
    dp = n_devices // tp
    device_array = np.asarray(devices[:n_devices]).reshape(dp, tp)
    return Mesh(device_array, axis_names=("dp", "tp"))


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Default topology: tp=2 when at least 4 devices, else pure dp."""
    n = n_devices if n_devices is not None else len(jax.devices())
    tp = 2 if n >= 4 and n % 2 == 0 else 1
    return make_mesh(n, tp=tp)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params, mesh: Mesh):
    """NamedSharding pytree for model params: shard the LAST axis of >=2-D
    kernels over tp when divisible (column-parallel Dense/Conv), replicate
    the rest.  GSPMD handles the resulting collectives."""
    tp_size = mesh.shape["tp"]

    def rule(leaf):
        if (
            tp_size > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] % tp_size == 0
            and leaf.shape[-1] >= 2 * tp_size
        ):
            spec = [None] * (leaf.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
