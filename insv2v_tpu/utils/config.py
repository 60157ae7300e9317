"""Minimal layered config: YAML + ``${key}`` interpolation + arg merge.

Replaces the reference's OmegaConf usage (main.py:28-33,
configs/instruct_v2v.yaml:138) with a dependency-free equivalent that
keeps the same YAML files loadable: ``${expt_dir}/${expt_name}``-style
references resolve against top-level keys.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import yaml

__all__ = ["load_config", "interpolate", "merge_args"]

_VAR = re.compile(r"\$\{([^}]+)\}")


def interpolate(obj: Any, root: Mapping[str, Any]) -> Any:
    if isinstance(obj, str):
        def sub(m):
            key = m.group(1)
            val = root
            for part in key.split("."):
                val = val[part]
            return str(val)

        return _VAR.sub(sub, obj)
    if isinstance(obj, dict):
        return {k: interpolate(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [interpolate(v, root) for v in obj]
    return obj


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    # iterate to a fixpoint so chained references (${b} -> ${a}) resolve
    for _ in range(10):
        new = interpolate(cfg, cfg)
        if new == cfg:
            break
        cfg = new
    return cfg


def merge_args(cfg: Dict[str, Any], args) -> Dict[str, Any]:
    """argparse Namespace values override top-level config keys
    (main.py:28-30 semantics)."""
    out = dict(cfg)
    for k, v in vars(args).items():
        if v is not None:
            out[k] = v
    return out
