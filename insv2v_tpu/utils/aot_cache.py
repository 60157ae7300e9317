"""AOT executable cache: skip trace+lower+compile on warm starts.

The persistent XLA compilation cache (utils/jax_cache.py) removes the
*XLA compile* from warm starts, but each process still pays Python
tracing + StableHLO lowering of the huge UNet window program before the
cache key can even be computed — the bulk of the ~118 s cache-warm
warmup (PERF.md r4), paid per LOVEU shard worker. This module pickles
the *compiled executable* (jax.experimental.serialize_executable) keyed
by (name, jax version, device kind, arg avals), so a warm start is one
file read + deserialize.

Usage::

    fn = load_or_compile("window_b1", jax.jit(f), *example_args)
    out = fn(*args)  # exact same arg shapes/dtypes required

Falls back silently to the plain jitted function when the backend
cannot serialize executables (some PJRT plugins), when shapes mismatch,
or when deserialization fails (stale cache after a jax upgrade) — the
caller never has to care.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

from insv2v_tpu.utils.jax_cache import DEFAULT_CACHE_DIR, _cpu_fingerprint

AOT_DIR = os.environ.get(
    "INSV2V_AOT_CACHE", os.path.join(DEFAULT_CACHE_DIR, "aot"))
_DISABLED = os.environ.get("INSV2V_AOT", "1") == "0"


_code_fp_cache = None


def _code_fingerprint() -> str:
    """Hash of the package's .py files (path, size, mtime): unlike the
    XLA persistent cache, the executable is loaded BEFORE any HLO
    exists, so the key must carry a code-version component or a stale
    entry would silently serve the old program after a code change."""
    global _code_fp_cache
    if _code_fp_cache is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha1()
        for dirpath, _, files in sorted(os.walk(root)):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    st = os.stat(p)
                    h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        _code_fp_cache = h.hexdigest()[:12]
    return _code_fp_cache


def _key(name: str, args, kwargs) -> str:
    import jax

    dev = jax.devices()[0]
    parts = [name, jax.__version__, _code_fingerprint(),
             str(getattr(dev, "device_kind", dev.platform))]
    if dev.platform != "tpu":
        # XLA:CPU AOT results are compiled for the builder's CPU flags;
        # loading them on a different host can SIGILL (see jax_cache.py)
        parts.append(_cpu_fingerprint())
    for leaf in jax.tree_util.tree_leaves((args, kwargs)):
        parts.append(f"{getattr(leaf, 'shape', ())}/{getattr(leaf, 'dtype', type(leaf).__name__)}")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:20]


def _safe(compiled: Callable, jitted: Callable) -> Callable:
    """Call the AOT executable; on ANY failure (aval drift, device-count
    mismatch on a forced multi-device CPU mesh, backend quirks) fall back
    to the live jitted fn — the caller must never notice."""

    def call(*args, **kwargs):
        try:
            return compiled(*args, **kwargs)
        except Exception:
            return jitted(*args, **kwargs)

    call._aot_compiled = compiled  # introspection for tests
    return call


def load_or_compile(name: str, jitted: Callable, *args: Any,
                    **kwargs: Any) -> Callable:
    """Return a callable computing ``jitted(*args-like)``: a deserialized
    AOT executable when cached, else ``jitted.lower(...).compile()``
    (serialized for next time), else ``jitted`` itself on any failure.
    AOT-served callables fall back to ``jitted`` per-call on mismatch."""
    if _DISABLED:
        return jitted
    import jax

    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)
    except ImportError:  # pragma: no cover
        return jitted

    path = os.path.join(AOT_DIR, _key(name, args, kwargs) + ".pjrt")
    if os.path.exists(path):
        try:
            import pickle

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            return _safe(deserialize_and_load(payload, in_tree, out_tree),
                         jitted)
        except Exception as e:  # stale/foreign entry: recompile below
            print(f"# aot cache read failed for {name}: {e}", flush=True)
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
    except Exception:
        return jitted
    try:
        import pickle

        os.makedirs(AOT_DIR, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(serialize(compiled), f)
        os.replace(tmp, path)  # atomic for concurrent shard workers
        _prune(keep=path)
    except Exception as e:
        print(f"# aot cache write failed for {name}: {e}", flush=True)
    return _safe(compiled, jitted)


def _prune(keep: str, max_bytes: int = None) -> None:
    """Drop oldest entries once the dir exceeds INSV2V_AOT_MAX_GB
    (default 8 — window executables are ~450 MB each; stale entries
    from previous code versions never hit again)."""
    if max_bytes is None:
        max_bytes = int(float(os.environ.get("INSV2V_AOT_MAX_GB", "8"))
                        * 2**30)
    try:
        entries = []
        for fn in os.listdir(AOT_DIR):
            p = os.path.join(AOT_DIR, fn)
            if p != keep and fn.endswith(".pjrt"):
                st = os.stat(p)
                entries.append((st.st_mtime, st.st_size, p))
        total = sum(s for _, s, _ in entries) + os.path.getsize(keep)
        for _, size, p in sorted(entries):
            if total <= max_bytes:
                break
            os.remove(p)
            total -= size
    except Exception:  # pragma: no cover — pruning must never fail a save
        pass


def lazy_aot(name: str, jitted: Callable,
             static_names: tuple = ()) -> Callable:
    """Wrap a jitted fn so its compiled executable is served from the AOT
    cache, keyed lazily by the FIRST call's arg avals (+ any static
    kwargs). Later calls with other shapes get their own entries; any
    mismatch or load failure falls back to the plain jitted fn for that
    call. Static kwargs are baked into the executable and stripped from
    AOT calls."""
    if _DISABLED:
        return jitted
    entries: dict = {}

    def wrap(*args, **kwargs):
        import jax

        skey = tuple(sorted(
            (k, kwargs[k]) for k in static_names if k in kwargs))
        akey = tuple(
            (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
            for x in jax.tree_util.tree_leaves(args))
        ent = entries.get((skey, akey))
        if ent is None:
            suffix = hashlib.sha1(repr(skey).encode()).hexdigest()[:6]
            ent = load_or_compile(f"{name}-{suffix}", jitted, *args, **kwargs)
            entries[(skey, akey)] = ent
        comp = getattr(ent, "_aot_compiled", None)
        if comp is None:  # load/compile failed: plain jit path
            return jitted(*args, **kwargs)
        try:  # static kwargs are baked into the executable
            return comp(*args, **{k: v for k, v in kwargs.items()
                                  if k not in static_names})
        except Exception:  # aval drift etc. — full kwargs to the live jit
            return jitted(*args, **kwargs)

    return wrap
