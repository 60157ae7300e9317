"""Remat (activation checkpointing) parity: same outputs and gradients as
the non-remat model — the jax.checkpoint counterpart of the reference's
per-block torch.utils.checkpoint (unet_blocks.py:343-350 etc.)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig


def test_remat_matches_no_remat_forward_and_grad():
    cfg = UNetConfig.tiny()
    model = UNet3DConditionModel(cfg=cfg)
    model_r = UNet3DConditionModel(cfg=dataclasses.replace(cfg, remat=True))

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 8))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 12))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx)["params"]

    out = model.apply({"params": params}, x, t, ctx)
    out_r = model_r.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, x, t, ctx) ** 2)
        return f

    g = jax.grad(loss(model))(params)
    g_r = jax.grad(loss(model_r))(params)
    leaves = zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r))
    for a, b in leaves:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
