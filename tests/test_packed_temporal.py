"""Packed (block-diagonal) temporal attention vs the per-head einsum.

The TPU path packs heads*frames into one m axis and masks cross-head
logits to -inf (models/unet3d.py VersatileAttention); masked softmax over
m must equal per-head softmax over F up to float association order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.models import unet3d
from insv2v_tpu.models.unet3d import VersatileAttention


def _run(packed: bool, b=2, f=8, p=24, c=16, heads=4, max_len=32):
    old = unet3d._PACKED_TEMPORAL
    unet3d._PACKED_TEMPORAL = "1" if packed else "0"
    try:
        mod = VersatileAttention(heads=heads, head_dim=c // heads,
                                 max_len=max_len)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, f, p, c))
        params = mod.init(jax.random.PRNGKey(1), x, 0)
        return mod.apply(params, x, 2)
    finally:
        unet3d._PACKED_TEMPORAL = old


def test_packed_matches_plain():
    ref = _run(packed=False)
    out = _run(packed=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_packed_matches_plain_full_heads():
    # the production shape class: heads * frames = 128
    ref = _run(packed=False, b=1, f=16, p=8, c=64, heads=8)
    out = _run(packed=True, b=1, f=16, p=8, c=64, heads=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_motion_module_time_minor_matches_plain():
    """The packed path now carries the MotionModule stream as (B, P, F, C)
    (one relayout per module); forced on vs off must agree with the SAME
    params (layouts don't touch param names — last-axis Dense/LN/FF)."""
    from insv2v_tpu.models.unet3d import MotionModule

    def run(packed):
        old = unet3d._PACKED_TEMPORAL
        unet3d._PACKED_TEMPORAL = "1" if packed else "0"
        try:
            mod = MotionModule(heads=4, num_transformer_block=1,
                               attention_block_types=("Temporal_Self",
                                                      "Temporal_Self"),
                               max_len=32, num_groups=4)
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 6, 16))
            params = mod.init(jax.random.PRNGKey(1), x, 0)
            return mod.apply(params, x, 3)
        finally:
            unet3d._PACKED_TEMPORAL = old

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=1e-5, atol=1e-6)


def test_versatile_attention_time_minor_layouts_agree():
    """time_minor=True on transposed input == time_minor=False, both
    packed and per-head einsum paths (same params)."""
    for packed in (False, True):
        old = unet3d._PACKED_TEMPORAL
        unet3d._PACKED_TEMPORAL = "1" if packed else "0"
        try:
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 24, 16))
            ref_mod = VersatileAttention(heads=4, head_dim=4, max_len=32)
            params = ref_mod.init(jax.random.PRNGKey(1), x, 0)
            ref = ref_mod.apply(params, x, 2)
            tm_mod = VersatileAttention(heads=4, head_dim=4, max_len=32,
                                        time_minor=True)
            out = tm_mod.apply(params, x.transpose(0, 2, 1, 3), 2)
            np.testing.assert_allclose(
                np.asarray(out.transpose(0, 2, 1, 3)), np.asarray(ref),
                rtol=1e-5, atol=1e-6, err_msg=f"packed={packed}")
        finally:
            unet3d._PACKED_TEMPORAL = old


def test_spatial_via_dot_matches_dense_path():
    """CrossAttention with INSV2V_SPATIAL_VIA_DOT applies Dense-created
    params through the (B,H,S,d)-direct einsum projections bit-compatibly
    (same param tree; float tolerance only)."""
    from insv2v_tpu.models.unet3d import CrossAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    mod = CrossAttention(heads=4, head_dim=4)
    params = mod.init(jax.random.PRNGKey(2), x, ctx)
    ref_self = mod.apply(params, x)
    ref_cross = mod.apply(params, x, ctx)
    old = unet3d._SPATIAL_VIA_DOT
    unet3d._SPATIAL_VIA_DOT = True
    try:
        out_self = mod.apply(params, x)
        out_cross = mod.apply(params, x, ctx)
    finally:
        unet3d._SPATIAL_VIA_DOT = old
    np.testing.assert_allclose(np.asarray(out_self), np.asarray(ref_self),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_cross), np.asarray(ref_cross),
                               rtol=1e-5, atol=1e-6)


def test_full_unet_tpu_layout_stack_matches_plain():
    """Integration guard: the complete TPU-default layout composition
    (packed temporal + time-minor stream + pack-via-dot projections)
    through the FULL UNet matches the plain per-head path with the same
    params (f32; kernels not dispatched, layouts only)."""
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    model = UNet3DConditionModel(cfg=UNetConfig.tiny(
        block_out_channels=(32, 32, 32, 32), norm_num_groups=8))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 8, 8, 8))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 3, 12))
    params = model.init(jax.random.PRNGKey(1), x, t, ctx)

    def run():
        return model.apply(params, x, t, ctx, video_start_index=2)

    ref = run()
    old_packed, old_viadot = unet3d._PACKED_TEMPORAL, unet3d._PACK_VIA_DOT
    unet3d._PACKED_TEMPORAL, unet3d._PACK_VIA_DOT = "1", True
    try:
        out = run()
    finally:
        unet3d._PACKED_TEMPORAL, unet3d._PACK_VIA_DOT = old_packed, old_viadot
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
