"""AOT executable cache: skip trace+lower+compile on warm starts.

The persistent XLA compilation cache (utils/jax_cache.py) removes the
*XLA compile* from warm starts, but each process still pays Python
tracing + StableHLO lowering of the huge UNet window program before the
cache key can even be computed — the bulk of the ~118 s cache-warm
warmup (PERF.md r4), paid per LOVEU shard worker. This module pickles
the *compiled executable* (jax.experimental.serialize_executable), so a
warm start is one file read + deserialize.

KEYING (correctness-critical): the executable is loaded before ANY
tracing happens, so the key must capture everything that shapes the
program — (name, `extra`, jax version, package-source fingerprint,
device kind, arg avals). Constants a caller bakes into the jitted
closure (sampler step count, scheduler kind, CFG scales, ...) are
INVISIBLE to the key: the caller MUST fold them into ``extra`` (or the
name), or a stale executable computing different math will be silently
served.

Usage::

    fn = load_or_compile("window_b1", jax.jit(f), *example_args,
                         extra=(steps, scheduler, text_cfg))
    out = fn(*args)  # exact same arg shapes/dtypes required

Falls back to the plain jitted function (with a one-time stderr note)
when the backend cannot serialize executables, when shapes mismatch, or
when deserialization fails (stale cache after a jax upgrade) — the
caller never has to care.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
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
    entry would silently serve the old program after a code change.
    Covers insv2v_tpu/ only — caller-script constants (bench.py etc.)
    must go through ``extra``."""
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


def _key(name: str, extra, args, kwargs) -> str:
    import jax

    dev = jax.devices()[0]
    parts = [name, repr(extra), jax.__version__, _code_fingerprint(),
             str(getattr(dev, "device_kind", dev.platform))]
    if dev.platform != "tpu":
        # XLA:CPU AOT results are compiled for the builder's CPU flags;
        # loading them on a different host can SIGILL (see jax_cache.py)
        parts.append(_cpu_fingerprint())
    for leaf in jax.tree_util.tree_leaves((args, kwargs)):
        parts.append(f"{getattr(leaf, 'shape', ())}/{getattr(leaf, 'dtype', type(leaf).__name__)}")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:20]


def _log(msg: str) -> None:
    # diagnostics MUST NOT touch stdout: bench.py's driver contract is
    # exactly one JSON line on stdout (CLAUDE.md)
    print(msg, file=sys.stderr, flush=True)


def _safe(compiled: Callable, jitted: Callable) -> Callable:
    """Call the AOT executable; on failure (aval drift, device-count
    mismatch on a forced multi-device CPU mesh, backend quirks) fall back
    to the live jitted fn. The first fallback logs to stderr so a run
    that silently measures the jit path instead of the AOT path is
    visible; a genuine device fault will fail the jit retry too and
    surface normally."""
    warned = []

    def call(*args, **kwargs):
        try:
            return compiled(*args, **kwargs)
        except Exception as e:
            if not warned:
                warned.append(1)
                _log(f"# aot executable call failed ({type(e).__name__}: "
                     f"{e}); falling back to live jit")
            return jitted(*args, **kwargs)

    call._aot_compiled = compiled  # introspection for tests
    return call


def load_or_compile(name: str, jitted: Callable, *args: Any,
                    extra: Any = None, **kwargs: Any) -> Callable:
    """Return a callable computing ``jitted(*args-like)``: a deserialized
    AOT executable when cached, else ``jitted.lower(...).compile()``
    (serialized for next time), else ``jitted`` itself on any failure.
    AOT-served callables fall back to ``jitted`` per-call on mismatch.

    ``extra`` must carry every closure constant of ``jitted`` that
    changes the computed math (see module docstring)."""
    if _DISABLED:
        return jitted
    import jax  # noqa: F401 — backend must be up for _key

    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)
    except ImportError:  # pragma: no cover
        return jitted

    path = os.path.join(AOT_DIR, _key(name, extra, args, kwargs) + ".pjrt")
    if os.path.exists(path):
        try:
            import pickle

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            return _safe(deserialize_and_load(payload, in_tree, out_tree),
                         jitted)
        except Exception as e:  # stale/foreign entry: recompile below
            _log(f"# aot cache read failed for {name}: {e}")
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
        _log(f"# aot cache write failed for {name}: {e}")
    return _safe(compiled, jitted)


def _prune(keep: str, max_bytes: int = None) -> None:
    """Drop oldest entries once the dir exceeds INSV2V_AOT_MAX_GB
    (default 8 — window executables are ~450 MB each; stale entries
    from previous code versions never hit again). Orphaned ``.tmp<pid>``
    files from crashed writers count toward the cap and are removed
    once stale (>1 h old)."""
    if max_bytes is None:
        max_bytes = int(float(os.environ.get("INSV2V_AOT_MAX_GB", "8"))
                        * 2**30)
    try:
        now = time.time()
        entries, total = [], os.path.getsize(keep)
        for fn in os.listdir(AOT_DIR):
            p = os.path.join(AOT_DIR, fn)
            if p == keep or ".pjrt" not in fn:
                continue
            st = os.stat(p)
            total += st.st_size
            if ".tmp" in fn and now - st.st_mtime > 3600:
                os.remove(p)  # crashed writer's orphan
                total -= st.st_size
            elif fn.endswith(".pjrt"):
                entries.append((st.st_mtime, st.st_size, p))
        for _, size, p in sorted(entries):
            if total <= max_bytes:
                break
            os.remove(p)
            total -= size
    except Exception:  # pragma: no cover — pruning must never fail a save
        pass


def lazy_aot(name: str, jitted: Callable, static_names: tuple = (),
             extra: Any = None) -> Callable:
    """Wrap a jitted fn so its compiled executable is served from the AOT
    cache, keyed lazily by the FIRST call's arg avals (+ any static
    kwargs + ``extra`` — which must carry the closure constants, see
    module docstring). Later calls with other shapes get their own
    entries; any mismatch or load failure falls back to the plain jitted
    fn for that call. Static kwargs are baked into the executable and
    stripped from AOT calls."""
    if _DISABLED:
        return jitted
    entries: dict = {}
    warned = []

    def wrap(*args, **kwargs):
        import jax

        skey = tuple(sorted(
            (k, kwargs[k]) for k in static_names if k in kwargs))
        akey = tuple(
            (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
            for x in jax.tree_util.tree_leaves(args))
        ent = entries.get((skey, akey))
        if ent is None:
            suffix = hashlib.sha1(repr((skey, extra)).encode()).hexdigest()[:6]
            ent = load_or_compile(f"{name}-{suffix}", jitted, *args,
                                  extra=(extra, skey), **kwargs)
            entries[(skey, akey)] = ent
        comp = getattr(ent, "_aot_compiled", None)
        if comp is None:  # load/compile failed: plain jit path
            return jitted(*args, **kwargs)
        try:  # static kwargs are baked into the executable
            return comp(*args, **{k: v for k, v in kwargs.items()
                                  if k not in static_names})
        except Exception as e:  # aval drift etc. — full kwargs, live jit
            if not warned:
                warned.append(1)
                _log(f"# aot call for {name} fell back to live jit "
                     f"({type(e).__name__}: {e})")
            return jitted(*args, **kwargs)

    return wrap
