"""Fused LN+GEGLU-FF+residual kernel vs the XLA reference path.

The kernel (ops/fused_ff.py) replaces the LayerNorm+FeedForward+residual
composition in models/unet3d.py; these tests pin interpret-mode numerics,
gradients through the custom VJP, and the model-level param-tree
invariance of the FFBlock rewrite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insv2v_tpu.ops.fused_ff import fused_geglu_ff, geglu_ff_reference


def _make(rng, rows, c, mult=4, dtype=jnp.float32):
    ks = jax.random.split(rng, 8)
    inner = c * mult
    x = jax.random.normal(ks[0], (rows, c), dtype)
    ls = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lb = 0.1 * jax.random.normal(ks[2], (c,))
    w1 = jax.random.normal(ks[3], (c, 2 * inner)) * 0.05
    b1 = 0.01 * jax.random.normal(ks[4], (2 * inner,))
    w2 = jax.random.normal(ks[5], (inner, c)) * 0.05
    b2 = 0.01 * jax.random.normal(ks[6], (c,))
    return x, ls, lb, w1, b1, w2, b2


@pytest.mark.parametrize("rows,c,blk_m,blk_n", [
    (256, 128, 128, 128),   # exact tiling
    (200, 128, 128, 128),   # ragged rows -> padded row block
    (384, 256, 256, 256),
])
def test_fused_ff_matches_reference(rows, c, blk_m, blk_n):
    args = _make(jax.random.PRNGKey(0), rows, c)
    ref = geglu_ff_reference(*args)
    out = fused_geglu_ff(*args, blk_m=blk_m, blk_n=blk_n, interpret=True)
    # default kernel gelu is the tanh form (|gelu err| <= ~3e-3 abs vs
    # the reference's exact erf — below the production path's bf16
    # activation quantization; see the INSV2V_FF_GELU table in fused_ff.py)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=4e-3)


def test_erf_poly_accuracy():
    """The in-kernel erf polynomial vs exact erf over the clamp range and
    beyond (clamped tail must stay within the same bound)."""
    import math
    from insv2v_tpu.ops.fused_ff import _erf_poly
    x = jnp.linspace(-6.0, 6.0, 20001)
    approx = np.asarray(_erf_poly(x))
    exact = np.vectorize(math.erf)(np.asarray(x))
    assert np.abs(approx - exact).max() < 3.5e-4


def test_fused_ff_multi_inner_blocks():
    # inner split across several j blocks exercises the accumulator path
    args = _make(jax.random.PRNGKey(1), 128, 64)
    ref = geglu_ff_reference(*args)
    out = fused_geglu_ff(*args, blk_m=128, blk_n=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_ff_3d_input():
    x, *rest = _make(jax.random.PRNGKey(2), 96, 64)
    x3 = x.reshape(4, 24, 64)
    ref = geglu_ff_reference(x3, *rest)
    out = fused_geglu_ff(x3, *rest, blk_m=128, blk_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_geglu_ff_grad_matches_reference():
    # the dispatching wrapper's custom VJP recomputes via the XLA path;
    # on CPU the forward IS the XLA path, so grads must match exactly
    from insv2v_tpu.ops import fused_ff

    args = _make(jax.random.PRNGKey(3), 64, 32)

    def loss_fused(*a):
        return jnp.sum(fused_ff._ff_with_vjp(*a, 1e-5) ** 2)

    def loss_ref(*a):
        return jnp.sum(geglu_ff_reference(*a) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 3, 5))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 3, 5))(*args)
    # the custom VJP recomputes through the exact-erf reference, but the
    # incoming cotangent 2*out carries the forward kernel's tanh-gelu
    # delta (~3e-3 abs), hence the tolerance
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=4e-3)


def test_unet_param_tree_unchanged():
    """The FFBlock rewrite must keep the exact torch-mirroring param paths
    (norm3/ff_norm affines + ff/geglu_proj + ff/proj_out) that
    utils/convert.py targets."""
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet3DConditionModel(cfg=cfg)
    x = jnp.zeros((1, 4, 16, 16, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    params = jax.eval_shape(
        lambda k: model.init(k, x, t, ctx), jax.random.PRNGKey(0))["params"]
    paths = {"/".join(str(getattr(k, "key", k)) for k in p)
             for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    blk = "down_blocks_0/attentions_0/transformer_blocks_0"
    for want in [
        f"{blk}/norm3/scale", f"{blk}/norm3/bias",
        f"{blk}/ff/geglu_proj/kernel", f"{blk}/ff/geglu_proj/bias",
        f"{blk}/ff/proj_out/kernel", f"{blk}/ff/proj_out/bias",
        "down_blocks_0/motion_modules_0/transformer_blocks_0/ff_norm/scale",
        "down_blocks_0/motion_modules_0/transformer_blocks_0/ff/geglu_proj/kernel",
    ]:
        assert want in paths, f"missing param path: {want}"


def test_gelu_flavors_match_reference():
    """Every INSV2V_FF_GELU flavor (except the perf-probe 'linear') stays
    within its documented tolerance of the exact-erf reference."""
    from insv2v_tpu.ops import fused_ff

    args = _make(jax.random.PRNGKey(7), 128, 128)
    ref = geglu_ff_reference(*args)
    tols = {"as": 5e-4, "poly": 1e-3, "tanh": 8e-3}
    old = fused_ff._FF_GELU
    try:
        for flavor, atol in tols.items():
            fused_ff._FF_GELU = flavor
            out = fused_geglu_ff(*args, blk_m=128, blk_n=128, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-2, atol=atol,
                err_msg=f"flavor={flavor}")
    finally:
        fused_ff._FF_GELU = old
