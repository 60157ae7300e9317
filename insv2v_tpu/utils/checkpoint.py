"""Checkpoint loading/saving: torch-source weights + orbax train state.

Covers the reference's checkpoint story (SURVEY.md §5.4):
  * fused ``insv2v.pth`` (strict=False load, video_edit.ipynb cell 2)
  * two-source merge: ip2p SD UNet ``diffusion_pytorch_model.bin`` +
    AnimateDiff ``mm_sd_v15.ckpt`` (instruct_p2p_video.py:222-233)
  * ``vqvae.ckpt`` / ``text.ckpt`` frozen towers (diffusion.py:230-236, 274-280)
  * DeepSpeed ``_forward_module.`` prefixes (insv2v_run_loveu_tgve.py:61)
plus orbax-based save/restore of our TrainState for resume
(`ModelCheckpoint` equivalent, configs/instruct_v2v.yaml:136-143).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from insv2v_tpu.utils.convert import (
    convert_clip_text_state_dict,
    convert_unet3d_state_dict,
    convert_vae_state_dict,
    merge_unet_motion_state_dicts,
    strip_prefixes,
)

__all__ = [
    "load_torch_weights",
    "load_pipeline_params",
    "merge_params",
    "save_train_state",
    "restore_train_state",
]


def merge_params(base: Dict[str, Any], overrides: Dict[str, Any],
                 _path: str = "") -> Dict[str, Any]:
    """Deep-merge converted weights over a fresh init — the ``strict=False``
    load semantics of the fused insv2v.pth (video_edit.ipynb cell 2): keys
    present in ``overrides`` replace the init, missing ones keep it.
    Shape mismatches raise with the offending path."""
    out = dict(base)
    for k, v in overrides.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, dict):
            out[k] = merge_params(base[k], v, f"{_path}{k}/")
        else:
            if k in base and hasattr(base[k], "shape") and hasattr(v, "shape"):
                if tuple(base[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {_path}{k}: "
                        f"init {tuple(base[k].shape)} vs ckpt {tuple(v.shape)}")
            out[k] = v
    return out


def load_torch_weights(path: str) -> Dict[str, Any]:
    """torch.load on the host; returns a flat state dict (unwraps
    Lightning 'state_dict' nesting and DeepSpeed prefixes)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # legacy pickles (e.g. full Lightning checkpoints) need the
        # unrestricted loader; only fall back for those, with a warning
        import warnings

        warnings.warn(
            f"{path}: falling back to torch.load(weights_only=False); "
            "only load checkpoints from trusted sources")
        sd = torch.load(path, map_location="cpu", weights_only=False)
    return strip_prefixes(sd)


def _split_fused(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split a fused trainer checkpoint (insv2v.pth) into component dicts
    by prefix: unet. / vae. / text_model."""
    out: Dict[str, Dict[str, Any]] = {"unet": {}, "vae": {}, "text": {}}
    for k, v in sd.items():
        if k.startswith("unet."):
            out["unet"][k[len("unet."):]] = v
        elif k.startswith("vae."):
            out["vae"][k[len("vae."):]] = v
        elif k.startswith("text_model."):
            out["text"][k[len("text_model."):]] = v
    return out


def load_pipeline_params(
    fused_ckpt: Optional[str] = None,
    unet_weights: Optional[str] = None,
    motion_weights: Optional[str] = None,
    vae_weights: Optional[str] = None,
    text_weights: Optional[str] = None,
) -> Dict[str, Any]:
    """Assemble {'unet','vae','text'} Flax params from torch sources.

    Either a fused trainer checkpoint, or the reference's three-source
    layout (SD+motion merge, vqvae.ckpt, text.ckpt). Missing pieces are
    simply absent from the result — callers fill with fresh init.
    """
    params: Dict[str, Any] = {}
    if fused_ckpt:
        parts = _split_fused(load_torch_weights(fused_ckpt))
        if parts["unet"]:
            params["unet"] = convert_unet3d_state_dict(parts["unet"])
        if parts["vae"]:
            params["vae"] = convert_vae_state_dict(parts["vae"])
        if parts["text"]:
            params["text"] = convert_clip_text_state_dict(parts["text"])
        return params
    if unet_weights:
        sd = load_torch_weights(unet_weights)
        if motion_weights:
            sd = merge_unet_motion_state_dicts(
                sd, load_torch_weights(motion_weights))
        params["unet"] = convert_unet3d_state_dict(sd)
    if vae_weights:
        params["vae"] = convert_vae_state_dict(load_torch_weights(vae_weights))
    if text_weights:
        params["text"] = convert_clip_text_state_dict(
            load_torch_weights(text_weights))
    return params


def save_train_state(state, ckpt_dir: str, step: Optional[int] = None) -> str:
    """Orbax save (async-safe, replicated-host friendly)."""
    import jax
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state))
    ckptr.wait_until_finished()
    return path


def restore_train_state(ckpt_dir_or_path: str, template) -> Any:
    """Restore into the structure of ``template`` (a TrainState)."""
    import orbax.checkpoint as ocp

    path = ckpt_dir_or_path
    if not os.path.basename(path).startswith("step_"):
        steps = sorted(d for d in os.listdir(path) if d.startswith("step_"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = os.path.join(path, steps[-1])
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
