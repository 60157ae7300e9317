"""Checkpoint IO: orbax TrainState round-trip, torch-source loading paths,
DeepSpeed prefix stripping, fused-checkpoint splitting."""

import numpy as np
import pytest
import torch

from insv2v_tpu.utils.checkpoint import (
    load_pipeline_params,
    load_torch_weights,
    restore_train_state,
    save_train_state,
)
from insv2v_tpu.utils.convert import merge_unet_motion_state_dicts, strip_prefixes


def test_strip_prefixes_deepspeed_and_lightning():
    sd = {"state_dict": {"_forward_module.unet.conv.weight": torch.ones(2)}}
    out = strip_prefixes(sd)
    assert list(out) == ["unet.conv.weight"]


def test_merge_asserts_on_overlap_and_count():
    a = {"x.weight": torch.ones(1)}
    b = {"y.weight": torch.ones(1)}
    merged = merge_unet_motion_state_dicts(a, b, expected_total=2)
    assert set(merged) == {"x.weight", "y.weight"}
    with pytest.raises(ValueError):
        merge_unet_motion_state_dicts(a, a)
    with pytest.raises(ValueError):
        merge_unet_motion_state_dicts(a, b, expected_total=5)


def test_load_torch_weights_and_fused_split(tmp_path):
    sd = {
        "unet.conv_in.weight": torch.randn(4, 8, 3, 3),
        "unet.conv_in.bias": torch.randn(4),
        "vae.encoder.conv_in.weight": torch.randn(8, 3, 3, 3),
        "vae.encoder.conv_in.bias": torch.randn(8),
        "text_model.transformer.text_model.final_layer_norm.weight": torch.randn(16),
        "text_model.transformer.text_model.final_layer_norm.bias": torch.randn(16),
    }
    p = str(tmp_path / "fused.pth")
    torch.save(sd, p)
    loaded = load_torch_weights(p)
    assert set(loaded) == set(sd)
    params = load_pipeline_params(fused_ckpt=p)
    assert "unet" in params and "vae" in params and "text" in params
    # conv OIHW -> HWIO
    assert params["unet"]["conv_in"]["kernel"].shape == (3, 3, 8, 4)
    assert params["text"]["final_layer_norm"]["scale"].shape == (16,)


def test_orbax_train_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.training.trainer import TrainState

    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        opt_state={"m": jnp.ones((2, 3))},
        vae_params={"v": jnp.zeros((4,))},
        text_params={"t": jnp.full((2,), 3.0)},
    )
    path = save_train_state(state, str(tmp_path / "ckpt"))
    assert "step_00000007" in path
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_train_state(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(restored.text_params["t"]), 3.0)


def test_convert_checkpoint_cli(tmp_path):
    sd = {
        "vae.encoder.conv_in.weight": torch.randn(8, 3, 3, 3),
        "vae.encoder.conv_in.bias": torch.randn(8),
    }
    src = str(tmp_path / "fused.pth")
    torch.save(sd, src)
    out = str(tmp_path / "converted")
    from insv2v_tpu.apps import convert_checkpoint

    convert_checkpoint.main(["--fused", src, "--output", out])
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(out)
    assert restored["vae"]["encoder"]["conv_in"]["kernel"].shape == (3, 3, 3, 8)
