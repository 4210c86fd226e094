"""Persistent XLA compilation cache bootstrap.

Remote compilation through the axon relay costs minutes per program;
the JAX persistent cache eliminates it for previously-seen programs
(verified working across processes in this environment).  Call
:func:`enable_cache` before the first jit execution; it is idempotent
and safe on any backend.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")

_enabled = False


def enable_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    cache_dir = path or os.environ.get("LRGE_JAX_CACHE", _DEFAULT_DIR)
    if cache_dir in ("0", "off", "none"):
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    except Exception:  # never let cache plumbing break the pipeline
        pass
