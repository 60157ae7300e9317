"""Persistent XLA compilation cache wiring.

The full-size UNet chain costs ~200 s of compile+warmup per process
(PERF.md); the LOVEU sweep and the round driver re-pay it per worker.
Pointing jax at an on-disk cache makes every compile after the first a
~second-scale deserialization. Call :func:`enable_compilation_cache`
before the first jitted computation (it is a no-op afterwards for
already-compiled programs).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "INSV2V_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir used,
    or None if the running jax doesn't support it (old versions)."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took meaningful time to compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
        return cache_dir
    except Exception:
        return None
