"""Model/dataset assembly from reference-style YAML configs.

The counterpart of misc_utils/train_utils.py:6-72: builds the
{unet, vae, text_model} trio plus datasets from ``{target, params}``
blocks — but through the explicit registry (utils/registry.py) with
adapters that translate the reference's constructor kwargs
(configs/instruct_v2v.yaml) into our config dataclasses.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp

import insv2v_tpu.data.datasets  # noqa: F401 — registers dataset targets
from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
from insv2v_tpu.utils.registry import instantiate_from_config, register

# negative prompts used by some reference eval paths (train_utils.py:107)
NEGATIVE_PROMPTS = (
    "(deformed iris, deformed pupils, semi-realistic, cgi, 3d, render, "
    "sketch, cartoon, drawing, anime:1.4), text, close up, cropped, out of "
    "frame, worst quality, low quality, jpeg artifacts, ugly, duplicate, "
    "morbid, mutilated, extra fingers, mutated hands, poorly drawn hands, "
    "poorly drawn face, mutation, deformed, blurry, dehydrated, bad anatomy, "
    "bad proportions, extra limbs, cloned face, disfigured, gross "
    "proportions, malformed limbs, missing arms, missing legs, extra arms, "
    "extra legs, fused fingers, too many fingers, long neck"
)


@register("modules.video_unet_temporal.unet.UNet3DConditionModel")
def build_unet3d(dtype=jnp.float32, **params) -> UNet3DConditionModel:
    """Adapter: reference UNet YAML params -> UNetConfig."""
    mm_kwargs = params.get("motion_module_kwargs", {})
    cfg = UNetConfig(
        in_channels=params.get("in_channels", 8),
        out_channels=params.get("out_channels", 4),
        block_out_channels=tuple(params.get("block_out_channels",
                                            (320, 640, 1280, 1280))),
        down_block_types=tuple(params.get("down_block_types",
                                          UNetConfig.down_block_types)),
        up_block_types=tuple(params.get("up_block_types",
                                        UNetConfig.up_block_types)),
        layers_per_block=params.get("layers_per_block", 2),
        attention_head_dim=params.get("attention_head_dim", 8),
        cross_attention_dim=params.get("cross_attention_dim", 768),
        norm_num_groups=params.get("norm_num_groups", 32),
        norm_eps=float(params.get("norm_eps", 1e-5)),
        use_motion_module=params.get("use_motion_module", True),
        motion_module_resolutions=tuple(params.get("motion_module_resolutions",
                                                   (1, 2, 4, 8))),
        motion_module_mid_block=params.get("motion_module_mid_block", False),
        motion_num_attention_heads=mm_kwargs.get("num_attention_heads", 8),
        motion_num_transformer_block=mm_kwargs.get("num_transformer_block", 1),
        motion_attention_block_types=tuple(mm_kwargs.get(
            "attention_block_types", ("Temporal_Self", "Temporal_Self"))),
        motion_max_seq_length=mm_kwargs.get(
            "temporal_position_encoding_max_len", 32),
    )
    return UNet3DConditionModel(cfg=cfg, dtype=dtype)


@register("modules.kl_autoencoder.autoencoder.AutoencoderKL")
def build_vae(ddconfig: Mapping[str, Any] = None, embed_dim: int = 4,
              lossconfig=None, dtype=jnp.float32, **_unused) -> AutoencoderKL:
    dd = dict(ddconfig or {})
    cfg = VaeConfig(
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        in_channels=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        z_channels=dd.get("z_channels", 4),
        embed_dim=embed_dim,
        resolution=dd.get("resolution", 256),
        double_z=dd.get("double_z", True),
    )
    return AutoencoderKL(cfg=cfg, dtype=dtype)


@register("modules.openclip.modules.FrozenCLIPEmbedder")
def build_text_model(freeze: bool = True, dtype=jnp.float32,
                     **_unused) -> ClipTextEncoder:
    return ClipTextEncoder(ClipTextConfig.vit_l_14(), dtype=dtype)


def get_models(config: Mapping[str, Any], dtype=jnp.float32) -> Dict[str, Any]:
    """Build {'unet', 'vae', 'text_model'} from a full YAML config
    (train_utils.py:6-24)."""
    out = {}
    for key in ("unet", "vae", "text_model"):
        block = dict(config[key])
        block.setdefault("params", {})
        block["params"] = dict(block["params"], dtype=dtype)
        out[key] = instantiate_from_config(block)
    return out


def get_dataset(config: Mapping[str, Any]) -> Tuple[Any, Any]:
    """(train, val) datasets from the config's data block
    (train_utils.py:59-72)."""
    data = config["data"]
    train = instantiate_from_config(data["train"])
    val = instantiate_from_config(data["val"])
    return train, val
