"""ModelScope T2V stack: UNetSD shapes/invariants, PTP self-attention
sharing semantics, prompt-diff machinery, OpenCLIP encoder + converter,
and the 3-phase sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.diffusion.ptp_sampler import sample_ptp_pair
from insv2v_tpu.diffusion.schedules import DiffusionSchedule, make_sampler_tables
from insv2v_tpu.models.modelscope_t2v import (
    ModelScopeConfig,
    UNetSD,
    sinusoidal_embedding,
)
from insv2v_tpu.models.openclip_text import OpenClipTextConfig, OpenClipTextEncoder
from insv2v_tpu.text.prompt_diff import (
    Delete,
    Edit,
    Insert,
    Text,
    compute_diff,
    token_alignment,
)
from insv2v_tpu.utils.convert import convert_openclip_text_state_dict

TINY = ModelScopeConfig.tiny()


def tiny_unet():
    unet = UNetSD(cfg=TINY)
    x = jnp.zeros((1, 2, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5, 12))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    return unet, params


class TestUNetSD:
    def test_forward_shape_and_zero_head(self):
        unet, params = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
        out = unet.apply({"params": params}, x, jnp.array([10, 20]), ctx)
        assert out.shape == (2, 2, 8, 8, 4)
        # out conv is zero-init -> fresh model predicts zeros (unet_sd.py:250)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_sinusoid_matches_reference_order(self):
        t = torch.tensor([3.0, 100.0])
        half = 8
        sin = torch.outer(t, torch.pow(
            10000, -torch.arange(half).float().div(half)))
        ref = torch.cat([torch.cos(sin), torch.sin(sin)], dim=1).numpy()
        got = sinusoidal_embedding(jnp.array([3, 100]), 16)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_kv_tuple_context(self):
        unet, params = tiny_unet()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
        key_ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 12))
        val_ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 12))
        out = unet.apply({"params": params}, x, jnp.array([10]),
                         (key_ctx, val_ctx))
        assert out.shape == (1, 2, 8, 8, 4)

    def test_sa_share_makes_new_branch_track_old(self):
        """With shared self-attn maps AND identical latents+contexts, the 4
        branches must produce identical outputs; with different latents the
        old/new pairs still differ (values differ)."""
        unet, params = tiny_unet()
        # give the zero-init heads some signal
        params = jax.tree_util.tree_map(
            lambda p: p + 0.01 * np.float32(1.0), params)
        lat = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 8, 8, 4))
        x4 = jnp.concatenate([lat, lat, lat, lat], axis=0)
        ctx = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 12))
        ctx4 = jnp.concatenate([ctx, ctx, ctx, ctx], axis=0)
        out = unet.apply({"params": params}, x4, jnp.zeros((4,), jnp.int32),
                         ctx4, sa_share=True)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[3]), np.asarray(out[2]),
                                   atol=1e-5)


class TestPromptDiff:
    def test_compute_diff_edit(self):
        pieces = compute_diff("a cat on the mat", "a dog on the mat")
        assert [type(p) for p in pieces] == [Text, Edit, Text]
        assert pieces[1].old == "cat" and pieces[1].new == "dog"

    def test_compute_diff_insert_delete(self):
        pieces = compute_diff("a photo of a cat", "a photo of a fluffy cat")
        kinds = [type(p) for p in pieces]
        assert Insert in kinds
        pieces = compute_diff("a red car on the road", "a car on the road")
        assert any(isinstance(p, Delete) for p in pieces)

    def test_round_trip_prompts(self):
        old, new = "the quick brown fox", "the slow brown wolf jumps"
        pieces = compute_diff(old, new)
        assert " ".join(p.old for p in pieces).split() == old.split()
        assert " ".join(p.new for p in pieces).split() == new.split()

    def test_token_alignment_replace_spreads(self):
        pieces = [Text("a"), Edit(old="big red", new="small"), Text("dog")]
        count = lambda s: len(s.split())
        new_to_old, weights = token_alignment(pieces, count)
        # new tokens: a(0)->0, small->old index 1 (start of 'big red'), dog->3
        assert new_to_old == [0, 1, 3]
        assert weights == [1.0, 1.0, 1.0]

    def test_token_alignment_insert_is_unmapped(self):
        pieces = [Text("a"), Insert("very"), Text("cat")]
        new_to_old, _ = token_alignment(pieces, lambda s: len(s.split()))
        assert new_to_old == [0, -1, 1]


class TestOpenClip:
    def test_matches_torch_packed_attention_reference(self):
        """Build a torch resblock-compatible state dict and compare one
        forward through our encoder vs a manual torch computation."""
        cfg = OpenClipTextConfig(vocab_size=40, width=16, num_layers=2,
                                 num_heads=2, max_positions=10,
                                 penultimate=True)
        model = OpenClipTextEncoder(cfg)
        torch.manual_seed(0)
        sd = {
            "token_embedding.weight": torch.randn(40, 16),
            "positional_embedding": torch.randn(10, 16),
            "ln_final.weight": torch.randn(16).abs() + 0.5,
            "ln_final.bias": torch.randn(16) * 0.1,
        }
        for i in range(2):
            p = f"transformer.resblocks.{i}"
            sd.update({
                f"{p}.ln_1.weight": torch.ones(16), f"{p}.ln_1.bias": torch.zeros(16),
                f"{p}.attn.in_proj_weight": torch.randn(48, 16) * 0.1,
                f"{p}.attn.in_proj_bias": torch.randn(48) * 0.1,
                f"{p}.attn.out_proj.weight": torch.randn(16, 16) * 0.1,
                f"{p}.attn.out_proj.bias": torch.zeros(16),
                f"{p}.ln_2.weight": torch.ones(16), f"{p}.ln_2.bias": torch.zeros(16),
                f"{p}.mlp.c_fc.weight": torch.randn(64, 16) * 0.1,
                f"{p}.mlp.c_fc.bias": torch.zeros(64),
                f"{p}.mlp.c_proj.weight": torch.randn(16, 64) * 0.1,
                f"{p}.mlp.c_proj.bias": torch.zeros(16),
            })
        params = convert_openclip_text_state_dict(sd)
        ids = np.array([[1, 5, 7, 2, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
        got = model.apply({"params": params}, jnp.asarray(ids))

        # torch reference: penultimate -> only resblock 0 runs, then ln_final
        import torch.nn.functional as F

        x = sd["token_embedding.weight"][torch.from_numpy(ids).long()]
        x = x + sd["positional_embedding"][None, :10]
        mask = torch.triu(torch.full((10, 10), float("-inf")), diagonal=1)
        h = F.layer_norm(x, (16,), sd["transformer.resblocks.0.ln_1.weight"],
                         sd["transformer.resblocks.0.ln_1.bias"])
        attn_out, _ = torch.nn.functional.multi_head_attention_forward(
            h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
            16, 2,
            sd["transformer.resblocks.0.attn.in_proj_weight"],
            sd["transformer.resblocks.0.attn.in_proj_bias"],
            None, None, False, 0.0,
            sd["transformer.resblocks.0.attn.out_proj.weight"],
            sd["transformer.resblocks.0.attn.out_proj.bias"],
            attn_mask=mask, need_weights=False)
        x = x + attn_out.transpose(0, 1)
        h = F.layer_norm(x, (16,), sd["transformer.resblocks.0.ln_2.weight"],
                         sd["transformer.resblocks.0.ln_2.bias"])
        h = F.linear(h, sd["transformer.resblocks.0.mlp.c_fc.weight"],
                     sd["transformer.resblocks.0.mlp.c_fc.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd["transformer.resblocks.0.mlp.c_proj.weight"],
                     sd["transformer.resblocks.0.mlp.c_proj.bias"])
        x = x + h
        ref = F.layer_norm(x, (16,), sd["ln_final.weight"], sd["ln_final.bias"])
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


class TestPtpSampler:
    def test_three_phase_runs_and_old_new_diverge(self):
        unet, params = tiny_unet()
        params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
        sched = DiffusionSchedule.create()
        tables = make_sampler_tables(sched, 6, kind="ddim")
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
        mk = lambda s: jax.random.normal(jax.random.PRNGKey(s), (1, 5, 12))
        out = sample_ptp_pair(
            lambda p, x, t, c, share: unet.apply({"params": p}, x, t, c,
                                                 sa_share=share),
            params, tables, lat, mk(1), mk(2), (mk(3), mk(4)), mk(5) * 0,
            jax.random.PRNGKey(9), guidance_scale=7.0,
            sa_end_time=0.34, ca_end_time=0.67,
        )
        assert out["latent"].shape == lat.shape
        assert out["latent_old"].shape == lat.shape
        assert np.abs(np.asarray(out["latent"] - out["latent_old"])).max() > 1e-4

    def test_batched_pairs_match_solo_chains(self):
        """Pair-batching parity (tools/bench_datagen.py's A/B premise):
        B same-prompt pairs with distinct initial latents in ONE chain must
        be per-element equal to B solo chains. Holds because DDIM eta=0
        never adds the per-step noise, every other op is per-batch-element,
        and sa_share's (4, b/4) group reshape is batch-major — group g row
        j pairs with group g-1 row j = the same (element, frame)/(element,
        pixel) at any B (models/modelscope_t2v.py PtpCrossAttention)."""
        unet, params = tiny_unet()
        params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
        sched = DiffusionSchedule.create()
        tables = make_sampler_tables(sched, 6, kind="ddim")
        mk = lambda s, b=1: jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(s), (1, 5, 12)), (b, 5, 12))
        lat2 = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8, 4))

        def run(lat, b):
            return sample_ptp_pair(
                lambda p, x, t, c, share: unet.apply({"params": p}, x, t, c,
                                                     sa_share=share),
                params, tables, lat, mk(1, b), mk(2, b),
                (mk(3, b), mk(4, b)), mk(5, b) * 0,
                jax.random.PRNGKey(9), guidance_scale=7.0,
                sa_steps=2, ca_steps=4)

        batched = run(lat2, 2)
        for i in range(2):
            solo = run(lat2[i: i + 1], 1)
            for key in ("latent", "latent_old"):
                np.testing.assert_allclose(
                    np.asarray(batched[key][i]), np.asarray(solo[key][0]),
                    atol=1e-5, rtol=1e-5, err_msg=f"{key} element {i}")

    def test_v1_staged_copies_old_then_diverges(self):
        """v1 (inference_damo.py:52-157): phase 1 never shares attention and
        copies old->new, so with phase 2 as the only divergent step the pair
        differs iff the kv context differs from the old context."""
        from insv2v_tpu.diffusion.ptp_sampler import sample_ptp_pair_v1

        unet, params = tiny_unet()
        params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
        sched = DiffusionSchedule.create()
        tables = make_sampler_tables(sched, 6, kind="ddim")
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
        mk = lambda s: jax.random.normal(jax.random.PRNGKey(s), (1, 5, 12))

        def apply_no_share(p, x, t, c, share):
            assert share is False, "v1 must never request sa_share"
            return unet.apply({"params": p}, x, t, c, sa_share=share)

        run = lambda ckv: sample_ptp_pair_v1(
            apply_no_share, params, tables, lat, mk(1), mk(2), ckv, mk(5) * 0,
            jax.random.PRNGKey(9), guidance_scale=7.0, sa_steps=5, ca_steps=6)

        # kv == old context: phase 1 copies, phase 2 computes identical eps
        # (kv-tuple path == plain path when k==v==ctx), DDIM eta=0 => exact
        same = run((mk(2), mk(2)))
        np.testing.assert_array_equal(np.asarray(same["latent"]),
                                      np.asarray(same["latent_old"]))
        # distinct kv context: the single phase-2 step diverges the pair
        diff = run((mk(3), mk(4)))
        assert np.abs(np.asarray(diff["latent"] - diff["latent_old"])).max() > 1e-5
        # and v2 with the same inputs behaves differently (joint sa_share
        # phase 1): the wrapper's share-flag assertion must trip
        import pytest

        with pytest.raises(AssertionError, match="sa_share"):
            sample_ptp_pair(
                apply_no_share, params, tables, lat, mk(1), mk(2),
                (mk(3), mk(4)), mk(5) * 0, jax.random.PRNGKey(9),
                guidance_scale=7.0, sa_steps=5, ca_steps=6)
