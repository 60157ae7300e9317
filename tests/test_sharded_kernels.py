"""Pallas kernels under a sharded mesh (VERDICT r2 #2).

The r2 caveat: all multi-chip validation ran with the XLA fallback paths,
so the flash-attention and fused-FF kernels were unproven under pjit
batch partitioning — the configuration a real v5e-8 LOVEU run uses (the
reference ran xformers under DDP daily, pl_trainer/instruct_p2p_video.py:27).
Here the kernels run in Pallas interpret mode on the 8-device CPU mesh:

  * directly under ``shard_map`` (guaranteed distributed execution: each
    device runs the kernel on its batch shard), and
  * inside a pjit'd, batch-sharded window-sampler call with the
    INSV2V_FLASH_INTERPRET dispatch override, covering the kernel code
    paths through the full UNet.

Parity target is the plain-XLA path on the unsharded batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from insv2v_tpu.ops import attention as attn_mod
from insv2v_tpu.ops import fused_ff as ff_mod
from insv2v_tpu.parallel.mesh import make_mesh


def test_flash_attention_under_shard_map():
    shard_map = jax.shard_map

    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    b, h, s, d = 8, 2, 384, 40  # production head width, batch-sharded
    q = jax.random.normal(rng, (b, h, s, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, s, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, s, d))

    sharded = jax.jit(shard_map(
        lambda q, k, v: attn_mod.flash_attention(q, k, v, interpret=True),
        mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp")), out_specs=P("dp"), check_vma=False,
    ))(q, k, v)
    ref = attn_mod.attention(q, k, v)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert len(sharded.sharding.device_set) == 8


def test_fused_ff_under_shard_map():
    shard_map = jax.shard_map

    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    rows, c = 8 * 16, 64  # inner=256 (128-aligned streams)
    x = jax.random.normal(rng, (rows, c))
    keys = [jax.random.fold_in(rng, i) for i in range(5)]
    w1 = jax.random.normal(keys[0], (c, 8 * c)) * 0.05
    b1 = jax.random.normal(keys[1], (8 * c,)) * 0.05
    w2 = jax.random.normal(keys[2], (4 * c, c)) * 0.05
    b2 = jax.random.normal(keys[3], (4 * c,))[:c] * 0.05
    sc, bc = jnp.ones((c,)), jnp.zeros((c,))

    sharded = jax.jit(shard_map(
        lambda x: ff_mod.fused_geglu_ff(x, sc, bc, w1, b1, w2, b2,
                                        interpret=True),
        mesh=mesh, in_specs=(P("dp"),), out_specs=P("dp"), check_vma=False,
    ))(x)
    ref = ff_mod.geglu_ff_reference(x, sc, bc, w1, b1, w2, b2)
    # kernel gelu = tanh form (|gelu err| <= ~3e-3 abs vs the
    # reference's exact erf; see INSV2V_FF_GELU in fused_ff.py)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=5e-3, atol=4e-3)
    assert len(sharded.sharding.device_set) == 8


def test_batch_sharded_sampler_runs_kernel_paths(monkeypatch):
    """The full window sampler, pjit-sharded over the dp mesh, with the
    Pallas kernels dispatched (interpret mode) instead of the XLA
    fallbacks — the exact shape of a sharded LOVEU run."""
    from insv2v_tpu.diffusion.samplers import sample_video_window
    from insv2v_tpu.diffusion.schedules import (
        DiffusionSchedule,
        make_sampler_tables,
    )
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    monkeypatch.setattr(attn_mod, "_FLASH_INTERPRET", True)
    monkeypatch.setattr(attn_mod, "_FLASH_MIN_SEQ", 32)
    monkeypatch.setattr(ff_mod, "_PALLAS_INTERPRET", True)

    mesh = make_mesh()
    # widths chosen so the fused-FF width gate (inner % 128 == 0) passes
    # and the spatial seq (8x8=64) crosses the lowered flash min-seq
    model = UNet3DConditionModel(cfg=UNetConfig.tiny(
        block_out_channels=(32, 32, 32, 32), norm_num_groups=8))
    tables = make_sampler_tables(DiffusionSchedule.create(), 2, kind="ddim")

    B = 8
    rngs = jax.random.PRNGKey(0)
    lat = jax.random.normal(rngs, (B, 2, 8, 8, 4))
    cond = jax.random.normal(jax.random.fold_in(rngs, 1), (B, 2, 8, 8, 4))
    tc = jax.random.normal(jax.random.fold_in(rngs, 2), (B, 3, 12))
    tu = jnp.zeros((B, 3, 12))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 8, 8, 8)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 12)))["params"]

    def unet_apply(p, s, t, c, vsi):
        return model.apply({"params": p}, s, t, c, video_start_index=vsi)

    def run(p, lat, cond, tc, tu):
        return sample_video_window(
            unet_apply, p, tables, lat, cond, tc, tu, jax.random.PRNGKey(3),
            text_cfg=4.0, img_cfg=1.3)["latent"]

    batch_sh = NamedSharding(mesh, P("dp"))
    rep_tree = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params)
    sharded = jax.jit(
        run,
        in_shardings=(rep_tree, batch_sh, batch_sh, batch_sh, batch_sh),
        out_shardings=batch_sh,
    )(params, lat, cond, tc, tu)

    # XLA-fallback reference on the unsharded batch
    monkeypatch.setattr(attn_mod, "_FLASH_INTERPRET", False)
    monkeypatch.setattr(ff_mod, "_PALLAS_INTERPRET", False)
    ref = jax.jit(run)(params, lat, cond, tc, tu)
    # kernel-vs-XLA deltas: flash f32-accum reassociation plus the FF
    # tanh-gelu (~3e-3 abs), amplified by two CFG-combined denoise steps
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert len(sharded.sharding.device_set) == 8
