"""Persistent XLA compilation cache setup.

First compile of each program through a remote-compiled backend (the
tunneled TPU) takes minutes; cached recompiles take seconds.  Called by
every entry point.  Uses jax.config.update because the interpreter may
have imported jax before us (sitecustomize), making env vars too late.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu"
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
