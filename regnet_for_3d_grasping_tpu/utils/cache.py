"""Persistent XLA compilation cache.

Mosaic/XLA compiles through this environment's remote-compile helper take
minutes per kernel variant; the persistent cache makes that a one-time
cost per shape configuration.  Called by bench.py, the CLIs and the graft
entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "REGNET_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
