"""UNet3D parity vs the torch oracle through the checkpoint converter, plus
structural/behavioral invariants (PE window continuity, motion-param
masking surface, shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
from insv2v_tpu.utils.convert import convert_unet3d_state_dict

from oracles.unet3d_oracle import OracleUNet3D

TINY = UNetConfig.tiny()


def build_pair(seed=0, mutate_motion=True):
    torch.manual_seed(seed)
    oracle = OracleUNet3D()
    if mutate_motion:
        # motion proj_out is zero-init; randomize so parity exercises the
        # temporal path end-to-end rather than multiplying it by zero
        with torch.no_grad():
            for name, p in oracle.named_parameters():
                if "temporal_transformer.proj_out" in name:
                    p.copy_(torch.randn_like(p) * 0.2)
    oracle.eval()
    params = convert_unet3d_state_dict(oracle.state_dict())
    return oracle, UNet3DConditionModel(cfg=TINY), {"params": params}


def to_torch(x_bfhwc):
    return torch.from_numpy(np.asarray(x_bfhwc)).permute(0, 4, 1, 2, 3)


def from_torch(x_bcfhw):
    return x_bcfhw.permute(0, 2, 3, 4, 1).numpy()


def test_param_tree_matches_init():
    oracle, model, variables = build_pair()
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, 12)),
    )
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
    assert ref_shapes == got_shapes


def test_forward_matches_oracle():
    oracle, model, variables = build_pair()
    rs = np.random.RandomState(0)
    sample = rs.randn(1, 2, 8, 8, 8).astype(np.float32)
    context = rs.randn(1, 3, 12).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(to_torch(sample), torch.from_numpy(t), torch.from_numpy(context))
    got = model.apply(variables, jnp.asarray(sample), jnp.asarray(t),
                      jnp.asarray(context))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=5e-4)


def test_forward_matches_oracle_with_start_index():
    oracle, model, variables = build_pair(seed=3)
    rs = np.random.RandomState(1)
    sample = rs.randn(1, 4, 8, 8, 8).astype(np.float32)
    context = rs.randn(1, 3, 12).astype(np.float32)
    t = np.array([10], dtype=np.int64)
    for start in (0, 3, 8):  # 8+4 > max_len 8 -> wraps to phase 0 (guard)
        with torch.no_grad():
            ref = oracle(to_torch(sample), torch.from_numpy(t),
                         torch.from_numpy(context), start=start)
        got = model.apply(variables, jnp.asarray(sample), jnp.asarray(t),
                          jnp.asarray(context), video_start_index=start)
        np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=5e-4,
                                   err_msg=f"start={start}")


def test_zero_init_motion_proj_out():
    """Fresh init: motion proj_out kernels are zero (motion_module.py:68-69),
    so the motion path starts as identity."""
    model = UNet3DConditionModel(cfg=TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, 12)),
    )
    p = variables["params"]["down_blocks_0"]["motion_modules_0"]["proj_out"]["kernel"]
    np.testing.assert_allclose(np.asarray(p), 0.0)


def test_motion_param_subtree_is_identifiable():
    """Trainable-mask surface: every motion param lives under a
    'motion_modules_*' path (mirrors the reference's 'motion' name filter,
    instruct_p2p_video.py:239-241)."""
    model = UNet3DConditionModel(cfg=TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, 12)),
    )
    paths = [
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    ]
    motion = [p for p in paths if "motion_modules_" in p]
    assert len(motion) > 0
    # motion modules appear in all down and up blocks (resolutions 1,2,4,8)
    for blk in ["down_blocks_0", "down_blocks_3", "up_blocks_0", "up_blocks_3"]:
        assert any(p.startswith(blk) and "motion_modules_" in p for p in paths), blk


def test_batch_of_cfg_triple_shapes():
    model = UNet3DConditionModel(cfg=TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((3, 2, 8, 8, 8)), jnp.zeros((3,), jnp.int32),
        jnp.zeros((3, 3, 12)),
    )
    out = model.apply(variables, jnp.zeros((3, 2, 8, 8, 8)),
                      jnp.zeros((3,), jnp.int32), jnp.zeros((3, 3, 12)))
    assert out.shape == (3, 2, 8, 8, 4)


def test_split_skip_path_matches_concat_path(monkeypatch):
    """INSV2V_SPLIT_SKIP (r5 copy-class experiment): the up-block split
    path — combined-moment GN + channel-sliced conv1/conv_shortcut — must
    be numerically equivalent to the materialized concat path and use the
    IDENTICAL param tree (converter/state-dict compatibility)."""
    import insv2v_tpu.models.unet3d as unet3d_mod

    oracle, model, variables = build_pair(seed=5)
    rs = np.random.RandomState(2)
    sample = rs.randn(2, 2, 8, 8, 8).astype(np.float32)
    context = rs.randn(2, 3, 12).astype(np.float32)
    t = np.array([250, 600], dtype=np.int64)
    args = (jnp.asarray(sample), jnp.asarray(t), jnp.asarray(context))

    monkeypatch.setattr(unet3d_mod, "_SPLIT_SKIP", False)
    ref = model.apply(variables, *args)
    monkeypatch.setattr(unet3d_mod, "_SPLIT_SKIP", True)
    init_split = model.init(jax.random.PRNGKey(0), *args)
    got = model.apply(variables, *args)

    # identical param tree under the flag (split uses param-only modules)
    ref_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, init_split["params"])
    assert ref_shapes == got_shapes
    # one-pass vs two-pass GN variance: ~1e-6 relative in f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
