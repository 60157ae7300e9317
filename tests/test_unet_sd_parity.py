"""ModelScope UNetSD parity vs torch oracle through the converter,
including PTP self-attention sharing and (key,value)-tuple contexts."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.models.modelscope_t2v import ModelScopeConfig, UNetSD
from insv2v_tpu.utils.convert import convert_unet_sd_state_dict

from oracles.unet_sd_oracle import OracleUNetSD

CFG = ModelScopeConfig.tiny()  # dim 16, mult (1,2), head_dim 8, attn (1,.5)


def build_pair(seed=0):
    torch.manual_seed(seed)
    oracle = OracleUNetSD()
    with torch.no_grad():  # randomize zero-init heads to exercise all paths
        for name, p in oracle.named_parameters():
            if p.abs().max() == 0:
                p.copy_(torch.randn_like(p) * 0.05)
    oracle.eval()
    params = convert_unet_sd_state_dict(oracle.state_dict(), CFG)
    return oracle, UNetSD(cfg=CFG), {"params": params}


def to_torch(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3)


def from_torch(x):
    return x.permute(0, 2, 3, 4, 1).numpy()


def test_param_tree_matches_init():
    oracle, model, variables = build_pair()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)),
                     jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 12)))
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
    assert ref_shapes == got_shapes


def test_forward_matches_oracle():
    oracle, model, variables = build_pair()
    rs = np.random.RandomState(0)
    x = rs.randn(1, 2, 8, 8, 4).astype(np.float32)
    ctx = rs.randn(1, 5, 12).astype(np.float32)
    t = np.array([321], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(to_torch(jnp.asarray(x)), torch.from_numpy(t),
                     torch.from_numpy(ctx))
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=5e-4)


def test_forward_matches_oracle_kv_tuple():
    oracle, model, variables = build_pair(seed=1)
    rs = np.random.RandomState(1)
    x = rs.randn(1, 2, 8, 8, 4).astype(np.float32)
    kc = rs.randn(1, 5, 12).astype(np.float32)
    vc = rs.randn(1, 5, 12).astype(np.float32)
    t = np.array([10], dtype=np.int64)
    with torch.no_grad():
        ref = oracle(to_torch(jnp.asarray(x)), torch.from_numpy(t),
                     (torch.from_numpy(kc), torch.from_numpy(vc)))
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                      (jnp.asarray(kc), jnp.asarray(vc)))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=5e-4)


def test_forward_matches_oracle_sa_share():
    oracle, model, variables = build_pair(seed=2)
    rs = np.random.RandomState(2)
    x = rs.randn(4, 2, 8, 8, 4).astype(np.float32)  # 4-way PTP batch
    ctx = rs.randn(4, 5, 12).astype(np.float32)
    t = np.array([99] * 4, dtype=np.int64)
    with torch.no_grad():
        ref = oracle(to_torch(jnp.asarray(x)), torch.from_numpy(t),
                     torch.from_numpy(ctx), sa_share=True)
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(ctx), sa_share=True)
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=5e-4)
