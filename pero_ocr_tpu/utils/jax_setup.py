"""Centralized JAX runtime configuration.

This environment's JAX/TPU-plugin build ignores the usual env vars
(``JAX_PLATFORMS``, ``JAX_COMPILATION_CACHE_DIR``); only explicit
``jax.config.update`` calls take effect, so every entry point funnels
through here."""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = "/root/.cache/jax_comp_cache"


def configure(cpu: bool = False, cache_dir: str | None = None) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE_DIR
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    if cpu:
        jax.config.update("jax_platforms", "cpu")
