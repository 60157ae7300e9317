"""VAE parity vs a torch oracle with the reference's state-dict layout,
through the real checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.models.vae import AutoencoderKL, DiagonalGaussian, VaeConfig
from insv2v_tpu.utils.convert import convert_vae_state_dict

from oracles.vae_oracle import OracleAutoencoderKL

CFG = VaeConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
    in_channels=3, out_ch=3, z_channels=2, embed_dim=2, resolution=16,
)


def build_pair(seed=0):
    torch.manual_seed(seed)
    oracle = OracleAutoencoderKL(ch=8, ch_mult=(1, 2), num_res=1, z=2, embed_dim=2)
    oracle.eval()
    params = convert_vae_state_dict(oracle.state_dict())
    model = AutoencoderKL(cfg=CFG)
    return oracle, model, {"params": params}


def test_converted_params_match_init_structure():
    oracle, model, variables = build_pair()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                     sample_posterior=False)
    ref_paths = set(map(tuple, jax.tree_util.tree_flatten_with_path(ref["params"])[0] and
                        [tuple(str(p) for p in path) for path, _ in
                         jax.tree_util.tree_flatten_with_path(ref["params"])[0]]))
    got_paths = set(tuple(str(p) for p in path) for path, _ in
                    jax.tree_util.tree_flatten_with_path(variables["params"])[0])
    assert ref_paths == got_paths
    # shapes agree too
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
    assert ref_shapes == got_shapes


def test_encode_mode_matches_oracle():
    oracle, model, variables = build_pair()
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle.encode_mode(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = model.apply(variables, jnp.asarray(x), sample_posterior=False,
                      method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def test_decode_matches_oracle():
    oracle, model, variables = build_pair(seed=1)
    z = np.random.RandomState(1).randn(2, 8, 8, 2).astype(np.float32)
    with torch.no_grad():
        ref = oracle.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    got = model.apply(variables, jnp.asarray(z), method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def test_posterior_sampling_stats():
    moments = jnp.concatenate(
        [jnp.full((1, 4, 4, 2), 1.5), jnp.full((1, 4, 4, 2), -2.0)], axis=-1
    )
    post = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(post.mode()), 1.5)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    samples = jax.vmap(post.sample)(keys)
    np.testing.assert_allclose(float(samples.mean()), 1.5, atol=0.02)
    np.testing.assert_allclose(float(samples.std()), np.exp(-1.0), atol=0.02)


def test_logvar_clamped():
    moments = jnp.concatenate(
        [jnp.zeros((1, 2, 2, 1)), jnp.full((1, 2, 2, 1), -100.0)], axis=-1
    )
    post = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(post.logvar), -30.0)
