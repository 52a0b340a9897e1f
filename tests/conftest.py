"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/pjit paths are exercised hermetically without TPU hardware.

NOTE: this environment's JAX build registers the TPU plugin regardless of
the JAX_PLATFORMS env var; only ``jax.config.update('jax_platforms', ...)``
reliably selects the CPU backend, so we do both."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pero_ocr_tpu.utils.jax_setup import configure

configure(cpu=True)
