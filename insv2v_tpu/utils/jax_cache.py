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


def _cpu_fingerprint() -> str:
    """Short hash of this host's CPU feature flags."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith(("flags", "Features")))
        return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except Exception:  # pragma: no cover - non-Linux
        import platform

        return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir used,
    or None if unsupported.

    CPU-backend entries go into a per-host ``cpu-<fingerprint>/`` subdir:
    XLA:CPU AOT results are compiled for the *builder's* CPU flags, and
    loading an entry cached by a previous round's host (different
    avx512/amx features) can execute unsupported instructions and abort
    the process (observed as a SIGABRT in the r3 test suite; the loader
    itself warns "could lead to execution errors such as SIGILL").
    TPU-backend entries stay in the shared dir — they are device
    executables, independent of the host CPU.
    """
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    import jax

    try:
        if jax.default_backend() != "tpu":
            cache_dir = os.path.join(cache_dir, "cpu-" + _cpu_fingerprint())
    except RuntimeError:  # pragma: no cover - backend probe failed
        return None
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
