"""PyTorch state-dict -> Flax param-pytree conversion.

First-class component (SURVEY.md §5.4): the reference initializes from a
three-source weight surgery — SD/ip2p UNet weights merged with AnimateDiff
motion weights (pl_trainer/instruct_p2p_video.py:222-233), VAE from
``vqvae.ckpt`` and CLIP from ``text.ckpt`` (pl_trainer/diffusion.py:230-236,
274-280), plus DeepSpeed ``_forward_module.`` prefix stripping
(insv2v_run_loveu_tgve.py:61).  This module reproduces those rules against
our Flax module trees.

Value transforms:
  * conv weight (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  * linear weight (O, I)        -> kernel (I, O)
  * norm weight/bias (C,)       -> scale/bias
Key transforms are rule tables (regex) per model family; the result is a
nested dict matching ``model.init(...)['params']``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Mapping, Tuple

import numpy as np

__all__ = [
    "strip_prefixes",
    "merge_unet_motion_state_dicts",
    "nest",
    "convert_vae_state_dict",
    "convert_clip_text_state_dict",
    "convert_unet3d_state_dict",
]

Array = np.ndarray


def _to_numpy(v: Any) -> Array:
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v)


def strip_prefixes(sd: Mapping[str, Any], prefixes: Iterable[str] = ("_forward_module.",)) -> Dict[str, Any]:
    """Strip launcher/wrapper prefixes (DeepSpeed ZeRO-2 exports carry
    ``_forward_module.``; Lightning fused checkpoints may nest under
    ``state_dict``)."""
    if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def nest(flat: Mapping[str, Any]) -> Dict[str, Any]:
    """'a/b/c' -> {'a': {'b': {'c': v}}}"""
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _convert_value(name: str, v: Array, is_norm: bool) -> Tuple[str, Array]:
    """Map a torch parameter leaf-name + value to flax leaf-name + value."""
    if name == "weight":
        if v.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", np.transpose(v, (2, 3, 1, 0))
        if v.ndim == 2:  # linear (O,I) -> (I,O)
            return "kernel", np.transpose(v)
        return ("scale", v) if is_norm else ("kernel", v)
    if name == "bias":
        return "bias", v
    if name in ("weight_ih", "weight_hh"):  # unused; keep mechanical
        return name, np.transpose(v)
    return name, v


_NORM_HINTS = ("norm", "layer_norm", "ff_norm", "final_layer_norm", "ln_")


def _is_norm_param(torch_key: str) -> bool:
    parts = torch_key.split(".")[:-1]  # module path components
    last = parts[-1] if parts else ""
    if last.isdigit() and len(parts) >= 2:  # ModuleList entry, e.g. norms.0
        last = parts[-2]
    return any(h in last for h in _NORM_HINTS)


def _apply_rules(key: str, rules: List[Tuple[str, str]]) -> str:
    for pat, rep in rules:
        key = re.sub(pat, rep, key)
    return key


def _convert_with_rules(
    sd: Mapping[str, Any], rules: List[Tuple[str, str]]
) -> Dict[str, Any]:
    flat: Dict[str, Array] = {}
    for k, v in sd.items():
        v = _to_numpy(v)
        mod_path, leaf = k.rsplit(".", 1)
        leaf, v = _convert_value(leaf, v, _is_norm_param(k))
        new_mod = _apply_rules(mod_path, rules)
        flat[new_mod.replace(".", "/") + "/" + leaf] = v
    return nest(flat)


# --- VAE (modules/vqvae/model.py + kl_autoencoder/autoencoder.py) ---------

_VAE_RULES: List[Tuple[str, str]] = [
    (r"\bdown\.(\d+)\.block\.(\d+)", r"down_\1_block_\2"),
    (r"\bdown\.(\d+)\.attn\.(\d+)", r"down_\1_attn_\2"),
    (r"\bdown\.(\d+)\.downsample", r"down_\1_downsample"),
    (r"\bup\.(\d+)\.block\.(\d+)", r"up_\1_block_\2"),
    (r"\bup\.(\d+)\.attn\.(\d+)", r"up_\1_attn_\2"),
    (r"\bup\.(\d+)\.upsample", r"up_\1_upsample"),
    (r"\bmid\.block_1", "mid_block_1"),
    (r"\bmid\.attn_1", "mid_attn_1"),
    (r"\bmid\.block_2", "mid_block_2"),
]


def convert_vae_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """vqvae.ckpt -> AutoencoderKL params. Drops the unused 'loss.' tree."""
    sd = strip_prefixes(sd)
    sd = {k: v for k, v in sd.items() if not k.startswith("loss.")}
    return _convert_with_rules(sd, _VAE_RULES)


# --- CLIP text encoder (modules/openclip/modules.py:88-135) ---------------

_CLIP_RULES: List[Tuple[str, str]] = [
    (r"^transformer\.", ""),
    (r"\btext_model\.", "text_model/"),
    (r"\bembeddings\.token_embedding", "token_embedding"),
    (r"\bembeddings\.position_embedding", "position_embedding"),
    (r"\bencoder\.layers\.(\d+)", r"layers_\1"),
]


def convert_clip_text_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """HF CLIPTextModel state dict -> our ClipTextEncoder params.

    Handles the ``position_ids`` pop the reference performs on load
    (openclip/modules.py:133-135) and converts nn.Embedding weights to
    flax ``embedding`` leaves.
    """
    sd = strip_prefixes(sd)
    flat: Dict[str, Array] = {}
    for k, v in sd.items():
        if k.endswith("position_ids"):
            continue
        v = _to_numpy(v)
        mod_path, leaf = k.rsplit(".", 1)
        new_mod = _apply_rules(mod_path, _CLIP_RULES)
        if new_mod.endswith(("token_embedding", "position_embedding")):
            leaf_name, val = "embedding", v  # no transpose for embeddings
        else:
            leaf_name, val = _convert_value(leaf, v, _is_norm_param(k))
        flat[new_mod.replace(".", "/") + "/" + leaf_name] = val
    tree = nest(flat)
    return tree.get("text_model", tree)


# --- RAFT (princeton-vl checkpoints; torchvision raft_large equivalent) ----

_RAFT_RULES: List[Tuple[str, str]] = [
    (r"^module\.", ""),
    (r"\blayer(\d)\.(\d)", r"layer\1_\2"),
    (r"\bdownsample\.0", "downsample"),
    (r"\bdownsample\.1", "norm3"),
    (r"\bupdate_block\.mask\.0", "update_block.mask_0"),
    (r"\bupdate_block\.mask\.2", "update_block.mask_2"),
]


def convert_raft_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """raft-things/sintel .pth -> RAFT params. fnet InstanceNorms have no
    parameters; cnet BatchNorm running stats become FrozenBatchNorm params."""
    sd = strip_prefixes(sd)
    flat: Dict[str, Array] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(v)
        k = _apply_rules(k, _RAFT_RULES)
        mod_path, leaf = k.rsplit(".", 1)
        if leaf == "running_mean":
            leaf = "mean"
        elif leaf == "running_var":
            leaf = "var"
        else:
            leaf, v = _convert_value(leaf, v, _is_norm_param(k))
        flat[mod_path.replace(".", "/") + "/" + leaf] = v
    return nest(flat)


# --- ModelScope UNetSD (modules/damo_text_to_video/unet_sd.py) -------------


def _unet_sd_index_map(cfg) -> Dict[str, str]:
    """Map the reference's Sequential numbering (input_blocks.N.M /
    middle_block.M / output_blocks.N.M) onto our named modules, by walking
    the same construction order (unet_sd.py:89-242)."""
    m: Dict[str, str] = {
        "input_blocks.0.0": "init_conv",
        "input_blocks.0.1": "init_temporal",
        "middle_block.0": "mid_res_0",
        "middle_block.1": "mid_spatial",
        "middle_block.2": "mid_temporal",
        "middle_block.3": "mid_res_1",
    }
    scale = 1.0
    idx, blk = 1, 0
    n_levels = len(cfg.dim_mult)
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks):
            m[f"input_blocks.{idx}.0"] = f"down_res_{blk}"
            if scale in cfg.attn_scales:
                m[f"input_blocks.{idx}.1"] = f"down_spatial_{blk}"
                m[f"input_blocks.{idx}.2"] = f"down_temporal_{blk}"
            idx += 1
            blk += 1
            if i != n_levels - 1 and j == cfg.num_res_blocks - 1:
                m[f"input_blocks.{idx}"] = f"downsample_{i}"
                idx += 1
                scale /= 2.0
    blk = 0
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks + 1):
            base = f"output_blocks.{blk}"
            m[f"{base}.0"] = f"up_res_{blk}"
            pos = 1
            if scale in cfg.attn_scales:
                m[f"{base}.1"] = f"up_spatial_{blk}"
                m[f"{base}.2"] = f"up_temporal_{blk}"
                pos = 3
            if i != n_levels - 1 and j == cfg.num_res_blocks:
                m[f"{base}.{pos}"] = f"upsample_{i}"
                scale *= 2.0
            blk += 1
    m["out.0"] = "out_norm"
    m["out.2"] = "out_conv"
    m["time_embed.0"] = "time_embed_1"
    m["time_embed.2"] = "time_embed_2"
    return m


_UNET_SD_INNER_RULES: List[Tuple[str, str]] = [
    (r"\bin_layers\.0", "in_norm"),
    (r"\bin_layers\.2", "in_conv"),
    (r"\bemb_layers\.1", "emb_proj"),
    (r"\bout_layers\.0", "out_norm"),
    (r"\bout_layers\.3", "out_conv"),
    (r"\btemopral_conv\b", "temporal_conv"),  # reference typo
    (r"\btemporal_conv\.conv(\d)\.0", r"temporal_conv.norm\1"),
    (r"\btemporal_conv\.conv(\d)\.[23]", r"temporal_conv.conv\1"),
    (r"\btransformer_blocks\.0", "transformer_blocks_0"),
    (r"\bff\.net\.0\.proj", "ff.geglu_proj"),
    (r"\bff\.net\.2", "ff.proj_out"),
    (r"\bto_out\.0", "to_out"),
]


def convert_unet_sd_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """text2video_pytorch_model.pth -> UNetSD params (cfg: ModelScopeConfig)."""
    sd = strip_prefixes(sd)
    index_map = _unet_sd_index_map(cfg)
    # longest-prefix keys first so e.g. input_blocks.10 beats input_blocks.1
    prefixes = sorted(index_map, key=len, reverse=True)
    flat: Dict[str, Array] = {}
    for k, v in sd.items():
        v = _to_numpy(v)
        new_k = None
        for p in prefixes:
            if k.startswith(p + "."):
                new_k = index_map[p] + k[len(p):]
                break
        if new_k is None:
            continue  # buffers / unknown extras
        new_k = _apply_rules(new_k, _UNET_SD_INNER_RULES)
        mod_path, leaf = new_k.rsplit(".", 1)
        if leaf == "weight" and v.ndim == 5:  # Conv3d (O,I,3,1,1) -> (3,I,O)
            leaf, v = "kernel", np.transpose(v[:, :, :, 0, 0], (2, 1, 0))
        elif leaf == "weight" and v.ndim == 3:  # Conv1d k=1 -> Dense
            leaf, v = "kernel", np.transpose(v[:, :, 0])
        else:
            leaf, v = _convert_value(leaf, v, _is_norm_param(new_k))
        flat[mod_path.replace(".", "/") + "/" + leaf] = v
    return nest(flat)


# --- OpenCLIP text tower (modules/openclip/modules.py:138-197) ------------


def convert_openclip_text_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """open_clip text-tower state dict -> OpenClipTextEncoder params.

    Handles the ``model.``/``transformer.`` prefixes and splits packed
    ``attn.in_proj_weight/bias`` into q/k/v projections.
    """
    sd = strip_prefixes(sd, prefixes=("_forward_module.", "model."))
    flat: Dict[str, Array] = {}
    for k, v in sd.items():
        if not any(t in k for t in
                   ("token_embedding", "positional_embedding",
                    "resblocks", "ln_final")):
            continue
        v = _to_numpy(v)
        k = re.sub(r"^transformer\.", "", k)
        k = re.sub(r"\bresblocks\.(\d+)", r"resblocks_\1", k)
        if k == "positional_embedding":
            flat[k] = v
            continue
        if k.endswith("token_embedding.weight"):
            flat["token_embedding/embedding"] = v
            continue
        if "attn.in_proj_weight" in k:
            base = k.rsplit(".", 2)[0].replace(".", "/")
            for name, part in zip(("q_proj", "k_proj", "v_proj"),
                                  np.split(v, 3, axis=0)):
                flat[f"{base}/attn/{name}/kernel"] = np.transpose(part)
            continue
        if "attn.in_proj_bias" in k:
            base = k.rsplit(".", 2)[0].replace(".", "/")
            for name, part in zip(("q_proj", "k_proj", "v_proj"),
                                  np.split(v, 3, axis=0)):
                flat[f"{base}/attn/{name}/bias"] = part
            continue
        mod_path, leaf = k.rsplit(".", 1)
        mod_path = mod_path.replace("mlp.", "")
        leaf, v = _convert_value(leaf, v, _is_norm_param(k))
        flat[mod_path.replace(".", "/") + "/" + leaf] = v
    return nest(flat)


# --- full CLIPModel (vision + text + projections) --------------------------

_CLIP_VISION_RULES: List[Tuple[str, str]] = [
    (r"^vision_model\.", ""),
    (r"\bembeddings\.patch_embedding", "patch_embedding"),
    (r"\bembeddings\.position_embedding", "position_embedding"),
    (r"\bencoder\.layers\.(\d+)", r"layers_\1"),
]


def convert_clip_model_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """HF ``CLIPModel`` state dict -> params for ClipSimilarity:
    {'vision', 'visual_projection', 'text', 'text_projection'}."""
    sd = strip_prefixes(sd)
    text_sd = {k: v for k, v in sd.items() if k.startswith("text_model.")}
    out: Dict[str, Any] = {"text": convert_clip_text_state_dict(text_sd)}

    vis_flat: Dict[str, Array] = {}
    for k, v in sd.items():
        if not k.startswith("vision_model."):
            continue
        if k.endswith("position_ids"):
            continue
        v = _to_numpy(v)
        if k.endswith("embeddings.class_embedding"):
            vis_flat["class_embedding"] = v
            continue
        mod_path, leaf = k.rsplit(".", 1)
        new_mod = _apply_rules(mod_path, _CLIP_VISION_RULES)
        if new_mod.endswith("position_embedding"):
            leaf_name, val = "embedding", v
        else:
            leaf_name, val = _convert_value(leaf, v, _is_norm_param(k))
        vis_flat[new_mod.replace(".", "/") + "/" + leaf_name] = val
    out["vision"] = nest(vis_flat)

    if "visual_projection.weight" in sd:
        out["visual_projection"] = {
            "visual_projection": {
                "kernel": np.transpose(_to_numpy(sd["visual_projection.weight"]))
            }
        }
    if "text_projection.weight" in sd:
        out["text_projection"] = {
            "text_projection": {
                "kernel": np.transpose(_to_numpy(sd["text_projection.weight"]))
            }
        }
    return out


# --- UNet3D (modules/video_unet_temporal/*) -------------------------------

_UNET_RULES: List[Tuple[str, str]] = [
    (r"\bdown_blocks\.(\d+)", r"down_blocks_\1"),
    (r"\bup_blocks\.(\d+)", r"up_blocks_\1"),
    (r"\bresnets\.(\d+)", r"resnets_\1"),
    (r"\battentions\.(\d+)", r"attentions_\1"),
    (r"\bmotion_modules\.(\d+)", r"motion_modules_\1"),
    (r"\bdownsamplers\.0", "downsampler"),
    (r"\bupsamplers\.0", "upsampler"),
    (r"\btransformer_blocks\.(\d+)", r"transformer_blocks_\1"),
    (r"\battention_blocks\.(\d+)", r"attention_blocks_\1"),
    (r"\bnorms\.(\d+)", r"norms_\1"),
    (r"\btemporal_transformer\.", ""),  # VanillaTemporalModule wrapper is flattened
    (r"\bff\.net\.0\.proj", "ff/geglu_proj"),
    (r"\bff\.net\.2", "ff/proj_out"),
    (r"\bto_out\.0", "to_out"),
    (r"\btime_embedding\.linear_1", "time_embedding/linear_1"),
    (r"\btime_embedding\.linear_2", "time_embedding/linear_2"),
]


def merge_unet_motion_state_dicts(
    sd_unet: Mapping[str, Any],
    sd_motion: Mapping[str, Any],
    expected_total: int | None = None,
) -> Dict[str, Any]:
    """The InstructP2PVideoTrainerTemporal merge (instruct_p2p_video.py:222-233):
    union of the SD/ip2p UNet weights and the AnimateDiff motion weights,
    asserting the union covers the model exactly; ``pos_encoder.pe``
    buffers are dropped (regenerated at our PE table size)."""
    sd = dict(strip_prefixes(sd_unet))
    motion = strip_prefixes(sd_motion)
    overlap = set(sd) & set(motion)
    if overlap:
        raise ValueError(f"unexpected key overlap in merge: {sorted(overlap)[:5]}")
    sd.update(motion)
    if expected_total is not None and len(sd) != expected_total:
        raise ValueError(
            f"improper state dict length, got {len(sd)} expected {expected_total}"
        )
    return sd


def convert_unet3d_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Fused insv2v/SD+motion state dict -> UNet3DConditionModel params.

    ``pos_encoder.pe`` buffers are dropped: the PE table is a deterministic
    function of (dim, max_len) and is materialized as a constant in our
    model (the reference itself regenerates it on size mismatch,
    instruct_p2p_video.py:230-232).
    """
    sd = strip_prefixes(sd)
    sd = {k: v for k, v in sd.items() if "pos_encoder.pe" not in k}
    return _convert_with_rules(sd, _UNET_RULES)


# --- T5 encoder (modules/openclip/modules.py:58-85, HF T5EncoderModel) -----


def convert_t5_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """HF ``T5EncoderModel`` state dict -> our T5TextEncoder params.

    ``encoder.embed_tokens.weight`` is a tied duplicate of ``shared.weight``
    and is dropped; layer norms are T5 RMSNorms whose single parameter stays
    named ``weight``.
    """
    sd = strip_prefixes(sd)
    flat: Dict[str, Array] = {}
    for k, v in sd.items():
        if k == "encoder.embed_tokens.weight":
            continue
        v = _to_numpy(v)
        if k == "shared.weight":
            flat["shared/embedding"] = v
            continue
        if k.endswith("relative_attention_bias.weight"):
            flat["relative_attention_bias/embedding"] = v
            continue
        if k == "encoder.final_layer_norm.weight":
            flat["final_layer_norm/weight"] = v
            continue
        m = re.match(
            r"encoder\.block\.(\d+)\.layer\.(\d)\.(.+)$", k)
        assert m, f"unexpected t5 key {k}"
        i, sub, rest = m.group(1), m.group(2), m.group(3)
        prefix = f"block_{i}/"
        if rest == "layer_norm.weight":
            flat[prefix + ("ln_attn" if sub == "0" else "ln_ff") + "/weight"] = v
        elif rest.startswith("SelfAttention."):
            name = rest.split(".")[1]  # q/k/v/o
            flat[prefix + f"attn/{name}/kernel"] = v.T
        elif rest.startswith("DenseReluDense."):
            name = rest.split(".")[1]  # wi_0/wi_1/wo
            flat[prefix + f"{name}/kernel"] = v.T
        else:
            raise AssertionError(f"unexpected t5 key {k}")
    return nest(flat)
