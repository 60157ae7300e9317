"""Trainer: masked motion-only updates, grad accumulation, dp-mesh sharding
on the 8-device CPU mesh, ZeRO opt-state sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
from insv2v_tpu.parallel.mesh import make_mesh, shard_leaf_spec
from insv2v_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    motion_param_mask,
)


@pytest.fixture(scope="module")
def setup():
    unet = UNet3DConditionModel(cfg=UNetConfig.tiny(in_channels=8, out_channels=4))
    vae = AutoencoderKL(cfg=VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                      z_channels=4, embed_dim=4, resolution=16))
    clip = ClipTextEncoder(ClipTextConfig(vocab_size=50, hidden_size=12,
                                          num_layers=1, num_heads=2,
                                          intermediate_size=24))
    k = jax.random.PRNGKey(0)
    unet_p = unet.init(k, jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 77, 12)))["params"]
    vae_p = vae.init(k, jnp.zeros((1, 16, 16, 3)), sample_posterior=False)["params"]
    clip_p = clip.init(k, jnp.zeros((1, 77), jnp.int32))["params"]
    cfg = TrainConfig(lr=1e-3, accumulate_grad_batches=2)
    trainer = Trainer(unet, vae, clip, cfg, mesh=make_mesh())

    # fresh state per test: the jitted step donates its input state buffers,
    # and device_put aliases already-placed arrays, so deep-copy first
    def make_state():
        copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)
        return trainer.place_state(
            trainer.create_state(copy(unet_p), copy(vae_p), copy(clip_p)))

    return trainer, make_state


def batch(n=16, f=2):
    rs = np.random.RandomState(0)
    return {
        "input_video": jnp.asarray(rs.randn(n, f, 16, 16, 3).astype(np.float32) * 0.1),
        "edited_video": jnp.asarray(rs.randn(n, f, 16, 16, 3).astype(np.float32) * 0.1),
        "prompt_ids": jnp.asarray(rs.randint(0, 50, (n, 77)).astype(np.int32)),
    }


def test_motion_mask_selects_only_motion_params(setup):
    trainer, make_state = setup
    state = make_state()
    mask = motion_param_mask(state.params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, trainable in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        assert trainable == ("motion_modules_" in p), p


def test_train_step_updates_only_motion_params(setup):
    trainer, make_state = setup
    state = make_state()
    step = trainer.jitted_step(state)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, metrics = step(state, batch(), jax.random.PRNGKey(1))
    loss = float(metrics["train_loss"])
    assert np.isfinite(loss) and loss > 0
    mask = motion_param_mask(before)
    after = jax.tree_util.tree_map(np.asarray, new_state.params)

    changed = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()) > 0, before, after)
    flags = jax.tree_util.tree_leaves(changed)
    trainables = jax.tree_util.tree_leaves(mask)
    n_trainable_changed = sum(1 for c, t in zip(flags, trainables) if t and c)
    n_frozen_changed = sum(1 for c, t in zip(flags, trainables) if (not t) and c)
    assert n_frozen_changed == 0
    assert n_trainable_changed > 0
    assert int(new_state.step) == 1
    # second step runs from donated state
    s2, m2 = step(new_state, batch(), jax.random.PRNGKey(2))
    assert int(s2.step) == 2


def test_zero_sharding_spec_shards_divisible_leading_axes(setup):
    trainer, _ = setup
    mesh = trainer.mesh
    leaf8 = jnp.zeros((8, 4))
    leaf7 = jnp.zeros((7, 4))
    scalar = jnp.zeros(())
    assert shard_leaf_spec(leaf8, mesh)[0] == "dp"
    assert shard_leaf_spec(leaf7, mesh) == jax.sharding.PartitionSpec()
    assert shard_leaf_spec(scalar, mesh) == jax.sharding.PartitionSpec()


def test_opt_state_is_materially_zero_sharded(setup):
    """The adam state coming OUT of a step must really be dp-sharded on
    devices — not just spec'd (a silent replication regression would pass
    every loss-finiteness check; VERDICT r4 #7)."""
    from insv2v_tpu.parallel.mesh import assert_zero_sharded

    trainer, make_state = setup
    state = make_state()
    # placed state is already ZeRO-sharded...
    n_dp, n_opt = assert_zero_sharded(state.opt_state, trainer.mesh)
    assert 0 < n_dp <= n_opt
    # ...and so is the state a jitted step emits
    step = trainer.jitted_step(state)
    new_state, _ = step(state, batch(), jax.random.PRNGKey(1))
    n_dp2, _ = assert_zero_sharded(new_state.opt_state, trainer.mesh)
    assert n_dp2 == n_dp
    # the guard actually bites: a replicated tree must fail
    from insv2v_tpu.parallel.mesh import replicated

    rep = jax.device_put(
        jax.tree_util.tree_map(np.asarray, new_state.opt_state),
        replicated(trainer.mesh))
    with pytest.raises(AssertionError):
        assert_zero_sharded(rep, trainer.mesh)


def test_loss_decreases_over_steps(setup):
    trainer, make_state = setup
    state = make_state()
    step = trainer.jitted_step(state)
    b = batch()
    losses = []
    s = state
    for i in range(8):
        s, m = step(s, b, jax.random.PRNGKey(42))  # fixed data + rng
        losses.append(float(m["train_loss"]))
    assert losses[-1] < losses[0]


def test_channel_packed_batch_matches_unpacked(setup):
    """TPU feeding layout: videos as (B, F, H, W*3) — lane-aligned, no
    HBM tile padding at rest (an accum-256 batch in channel-minor layout
    OOMed the v5e on padding alone). Same data packed vs unpacked must
    produce identical loss and parameters."""
    trainer, make_state = setup
    b = batch()
    packed = dict(
        b,
        input_video=b["input_video"].reshape(16, 2, 16, 16 * 3),
        edited_video=b["edited_video"].reshape(16, 2, 16, 16 * 3),
    )
    step = trainer.jitted_step(make_state())
    s1, m1 = step(make_state(), b, jax.random.PRNGKey(7))
    s2, m2 = step(make_state(), packed, jax.random.PRNGKey(7))
    assert np.allclose(float(m1["train_loss"]), float(m2["train_loss"]),
                       rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, c in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_trainer_forces_concat_skip_path(setup):
    """The trainer must pin split_skip=False on its UNet: the split
    up-block path OOM'd the production accum-256 step's HBM by 47 MB
    (PERF.md r5). Inference models keep the env-default (None)."""
    trainer, *_ = setup
    assert trainer.unet.cfg.split_skip is False
    assert UNet3DConditionModel(cfg=UNetConfig.tiny()).cfg.split_skip is None
