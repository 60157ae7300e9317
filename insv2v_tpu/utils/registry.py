"""Explicit object registry backing the ``{target, params}`` config idiom.

The reference resolves ``target:`` strings with importlib reflection
(``misc_utils/model_utils.py:6-17``).  We keep the same public config
surface — YAML dicts with ``target`` / ``params`` keys — but resolve
through an explicit registry so the set of constructible objects is a
closed, auditable namespace and typos fail with a helpful message
instead of an arbitrary import error.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Decorator: register a class or factory under ``name``."""

    def deco(obj: Callable[..., Any]) -> Callable[..., Any]:
        if name in _REGISTRY and _REGISTRY[name] is not obj:
            raise ValueError(f"registry name collision: {name!r}")
        _REGISTRY[name] = obj
        return obj

    return deco


def lookup(name: str) -> Callable[..., Any]:
    # Accept reference-style dotted targets by their trailing class name so
    # configs written for the reference repo keep working, e.g.
    # ``modules.kl_autoencoder.autoencoder.AutoencoderKL`` -> ``AutoencoderKL``.
    if name in _REGISTRY:
        return _REGISTRY[name]
    tail = name.rsplit(".", 1)[-1]
    if tail in _REGISTRY:
        return _REGISTRY[tail]
    known = ", ".join(sorted(_REGISTRY))
    raise KeyError(f"unknown target {name!r}; registered: {known}")


def instantiate_from_config(config: Mapping[str, Any]) -> Any:
    """Build the object described by a ``{target, params}`` mapping.

    Mirrors the public contract of the reference's
    ``instantiate_from_config`` (misc_utils/model_utils.py:6-9).
    """
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params") or {})
    return lookup(config["target"])(**params)


def registered_names() -> tuple:
    return tuple(sorted(_REGISTRY))
