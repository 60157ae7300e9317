"""RAFT-in-Flax: component math (correlation pyramid, lookup, convex
upsample), end-to-end shapes, and converter structure against the
original princeton-vl checkpoint key layout."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.models.raft import (
    RAFT,
    RaftConfig,
    convex_upsample,
    corr_lookup,
    correlation_pyramid,
)
from insv2v_tpu.utils.convert import convert_raft_state_dict


class TestCorrelation:
    def test_identical_features_peak_at_zero_displacement(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 8))
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # unit features
        pyr = correlation_pyramid(f, f, levels=2)
        # level 0: volume (36, 6, 6); self-corr row i peaks at position i
        vol = np.asarray(pyr[0]).reshape(36, 36)
        assert (vol.argmax(axis=1) == np.arange(36)).all()

    def test_pyramid_shapes(self):
        f = jnp.zeros((2, 8, 12, 4))
        pyr = correlation_pyramid(f, f, levels=3)
        assert pyr[0].shape == (2 * 96, 8, 12)
        assert pyr[1].shape == (2 * 96, 4, 6)
        assert pyr[2].shape == (2 * 96, 2, 3)

    def test_lookup_shapes_and_center_value(self):
        f = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8))
        pyr = correlation_pyramid(f, f, levels=2)
        gy, gx = jnp.meshgrid(jnp.arange(4.0), jnp.arange(4.0), indexing="ij")
        coords = jnp.stack([gx, gy], -1)[None]
        out = corr_lookup(pyr, coords, radius=1)
        assert out.shape == (1, 4, 4, 2 * 9)
        # the center tap of level 0 equals the self-correlation diagonal
        vol0 = np.asarray(pyr[0]).reshape(16, 16)
        center = np.asarray(out[0, :, :, 4]).reshape(16)
        np.testing.assert_allclose(center, np.diag(vol0), atol=1e-4)


class TestConvexUpsample:
    def test_uniform_mask_averages_and_scales(self):
        flow = jnp.ones((1, 4, 4, 2)) * 3.0
        mask = jnp.zeros((1, 4, 4, 64 * 9))  # softmax -> uniform weights
        up = convex_upsample(flow, mask)
        assert up.shape == (1, 32, 32, 2)
        # interior coarse cell (1,1): all 9 neighbors equal 3*8=24 -> 24
        np.testing.assert_allclose(float(up[0, 12, 12, 0]), 24.0, atol=1e-5)
        # corner cell (0,0): only 4 of 9 neighbors valid -> 24*4/9
        np.testing.assert_allclose(float(up[0, 0, 0, 0]), 24.0 * 4 / 9,
                                   atol=1e-5)


class TestEndToEnd:
    def test_forward_shapes_and_scan(self):
        cfg = RaftConfig.tiny()
        model = RAFT(cfg=cfg)
        im1 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 40, 3)) * 0.1
        im2 = jnp.roll(im1, 2, axis=2)
        params = model.init(jax.random.PRNGKey(1), im1, im2)["params"]
        flow = model.apply({"params": params}, im1, im2)
        assert flow.shape == (1, 32, 40, 2)
        assert np.isfinite(np.asarray(flow)).all()


def make_original_raft_state_dict():
    """Synthetic state dict with the exact princeton-vl RAFT key layout
    (raft_large architecture) at full scale shapes."""
    sd = {}

    def conv(name, cout, cin, kh, kw):
        sd[f"{name}.weight"] = torch.randn(cout, cin, kh, kw) * 0.02
        sd[f"{name}.bias"] = torch.zeros(cout)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    for net, has_bn in (("fnet", False), ("cnet", True)):
        conv(f"{net}.conv1", 64, 3, 7, 7)
        if has_bn:
            bn(f"{net}.norm1", 64)
        dims = [(64, 64), (64, 96), (96, 128)]
        for li, (cin, cout) in enumerate(dims, start=1):
            for bi in range(2):
                c_in = cin if bi == 0 else cout
                conv(f"{net}.layer{li}.{bi}.conv1", cout, c_in, 3, 3)
                conv(f"{net}.layer{li}.{bi}.conv2", cout, cout, 3, 3)
                if has_bn:
                    bn(f"{net}.layer{li}.{bi}.norm1", cout)
                    bn(f"{net}.layer{li}.{bi}.norm2", cout)
                if bi == 0 and (cin != cout or li > 1):
                    conv(f"{net}.layer{li}.{bi}.downsample.0", cout, c_in, 1, 1)
                    if has_bn:
                        bn(f"{net}.layer{li}.{bi}.downsample.1", cout)
        conv(f"{net}.conv2", 256, 128, 1, 1)

    conv("update_block.encoder.convc1", 256, 324, 1, 1)
    conv("update_block.encoder.convc2", 192, 256, 3, 3)
    conv("update_block.encoder.convf1", 128, 2, 7, 7)
    conv("update_block.encoder.convf2", 64, 128, 3, 3)
    conv("update_block.encoder.conv", 126, 256, 3, 3)
    for s, ks in (("1", (1, 5)), ("2", (5, 1))):
        for g in ("z", "r", "q"):
            conv(f"update_block.gru.conv{g}{s}", 128, 384, *ks)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3)
    conv("update_block.mask.0", 256, 128, 3, 3)
    conv("update_block.mask.2", 64 * 9, 256, 1, 1)
    return sd


def test_converter_matches_full_size_init_structure():
    sd = make_original_raft_state_dict()
    params = convert_raft_state_dict(sd)
    model = RAFT(cfg=RaftConfig())
    im = jnp.zeros((1, 64, 64, 3))
    ref = jax.eval_shape(
        lambda k: model.init(k, im, im), jax.random.PRNGKey(0))["params"]
    ref_shapes = jax.tree_util.tree_map(lambda s: tuple(s.shape), ref)
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes


def test_full_raft_matches_torch_oracle():
    """Cross-framework parity: the Flax RAFT vs an independent torch
    implementation of the princeton-vl architecture, sharing weights via
    the converter (full-size shapes, 3 iterations, eval-mode BN)."""
    from oracles.raft_oracle import OracleRAFT

    torch.manual_seed(0)
    oracle = OracleRAFT()
    oracle.eval()
    params = convert_raft_state_dict(oracle.state_dict())
    model = RAFT(cfg=RaftConfig(iters=3))

    rs = np.random.RandomState(0)
    # >= 128px so the coarsest corr level is 2x2 (grid_sample in the
    # oracle divides by W-1; original RAFT has the same constraint)
    im1 = rs.randn(1, 128, 128, 3).astype(np.float32) * 0.3
    im2 = np.roll(im1, 3, axis=2)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(im1.transpose(0, 3, 1, 2)),
                     torch.from_numpy(im2.transpose(0, 3, 1, 2)), iters=3)
    got = model.apply({"params": params}, jnp.asarray(im1), jnp.asarray(im2),
                      iters=3)
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1), atol=5e-3)
