"""Data-parallel trainer for the motion modules.

TPU-native replacement for the Lightning/DeepSpeed training stack
(main.py, pl_trainer/diffusion.py, pl_trainer/instruct_p2p_video.py):

  * one pure jitted ``train_step`` over a dp mesh — batch sharded on
    ``dp``, params replicated, adam state ZeRO-2-sharded
    (parallel/mesh.py), gradient mean emitted by XLA;
  * gradient accumulation as a ``lax.scan`` over microbatches inside the
    step (``accumulate_grad_batches: 256``, configs/instruct_v2v.yaml:11);
  * optimizer masking: only params under ``motion_modules_*`` train
    (the reference's 'motion' name filter, instruct_p2p_video.py:239-241),
    via ``optax.masked``;
  * the whole reference preprocessing chain runs on device inside the
    step: sampled VAE encode of both videos, cond-image dropout (10%,
    unscaled ip2p convention), random t, q-sample, channel concat
    (instruct_p2p_video.py:81-137).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from insv2v_tpu.diffusion.schedules import DiffusionSchedule, add_noise
from insv2v_tpu.models.vae import SD_SCALE_FACTOR, AutoencoderKL
from insv2v_tpu.parallel.mesh import (
    batch_sharding,
    constrain_zero_sharding,
    make_mesh,
    replicated,
    zero_sharded_like,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-5
    betas: Tuple[float, float] = (0.9, 0.999)
    optimizer: str = "adam"  # adam | adam8bit (bnb Adam8bit parity)
    loss_type: str = "l2"  # l1 | l2 (diffusion.py get_loss)
    prediction_type: str = "epsilon"  # epsilon | sample (diffusion.py:105-108)
    cond_image_dropout: float = 0.1
    scale_factor: float = SD_SCALE_FACTOR
    accumulate_grad_batches: int = 1
    trainable_pattern: str = "motion_modules_"
    beta_schedule: str = "scaled_linear"
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # full unet params (trainable + frozen)
    opt_state: Any
    # frozen towers
    vae_params: Any = struct.field(pytree_node=True, default=None)
    text_params: Any = struct.field(pytree_node=True, default=None)


def motion_param_mask(params: Any, pattern: str = "motion_modules_") -> Any:
    """True for trainable leaves (path contains the motion marker)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    mask_leaves = [
        any(pattern in str(getattr(k, "key", k)) for k in path)
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def cast_frozen_to_bf16(params: Any, pattern: str = "motion_modules_") -> Any:
    """Store frozen (non-trainable) leaves in bf16, trainable leaves f32.

    The frozen spatial/temporal-free weights are consumed in bf16 by every
    matmul and never receive updates, so keeping an f32 master copy wastes
    ~3.8 GB of HBM at production scale (the difference between fitting and
    faulting a full-size train step on a 16 GB v5e — see bench_train.py).
    Mirrors the reference's DeepSpeed fp16 regime where frozen weights are
    half precision (configs/instruct_v2v.yaml:4-7).
    """
    mask = motion_param_mask(params, pattern)
    return jax.tree_util.tree_map(
        lambda p, m: p if m or not jnp.issubdtype(p.dtype, jnp.floating)
        else p.astype(jnp.bfloat16),
        params, mask)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    mask = motion_param_mask(params, cfg.trainable_pattern)
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask)
    if cfg.optimizer == "adam8bit":
        from insv2v_tpu.training.quantized_adam import adam8bit

        inner = adam8bit(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
    else:
        inner = optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()},
        labels,
    )


def _loss(pred, target, kind):
    err = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.abs(err)) if kind == "l1" else jnp.mean(err * err)


class Trainer:
    """Bundles models + mesh + jitted step. ``batch`` layout:

      input_video:  (B, F, H, W, 3) in [-1, 1]
      edited_video: (B, F, H, W, 3)
      prompt_ids:   (B, 77) int32

    With accumulation, the leading dim is (accum * B) and the step scans
    over ``accum`` microbatches of B.

    Videos may instead arrive CHANNEL-PACKED as (B, F, H, W*3): TPU HBM
    tiles the two minor dims, so a channel-minor (.., W, 3) jit parameter
    is padded ~5x at rest (an accum-256 batch OOMs a 16 GB v5e on padding
    alone — bench_train.py). The packed form is lane-aligned (W*3 is a
    128-multiple for production widths); each microbatch is unpacked
    inside the step right before the VAE, so only one microbatch ever
    exists in the padded layout.
    """

    def __init__(self, unet, vae, text_encoder, cfg: TrainConfig = TrainConfig(),
                 mesh=None):
        if hasattr(getattr(unet, "cfg", None), "split_skip"):
            # the split-skip up-block path is an inference win but keeps
            # extra per-part buffers alive under remat: the production
            # accum-256 step measured 47 MB OVER the 15.75 GiB HBM with it
            # (r5 compile OOM). Param tree is identical, so forcing the
            # concat path here changes nothing about checkpoints.
            import dataclasses as _dc

            unet = _dc.replace(unet, cfg=_dc.replace(unet.cfg,
                                                     split_skip=False))
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.schedule = DiffusionSchedule.create(
            beta_schedule=cfg.beta_schedule,
            num_train_timesteps=cfg.num_train_timesteps,
            beta_start=cfg.beta_start,
            beta_end=cfg.beta_end,
        )
        self._tx: Optional[optax.GradientTransformation] = None
        self._step_fn = None

    # --- state ------------------------------------------------------------

    def create_state(self, unet_params, vae_params, text_params) -> TrainState:
        self._tx = make_optimizer(self.cfg, unet_params)
        opt_state = self._tx.init(unet_params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=unet_params,
            opt_state=opt_state,
            vae_params=vae_params,
            text_params=text_params,
        )

    def state_shardings(self, state: TrainState) -> TrainState:
        """Placement: params/frozen towers replicated, adam state ZeRO-2
        sharded along dp."""
        rep = replicated(self.mesh)
        rep_tree = lambda t: jax.tree_util.tree_map(lambda _: rep, t)
        return TrainState(
            step=rep,
            params=rep_tree(state.params),
            opt_state=zero_sharded_like(state.opt_state, self.mesh),
            vae_params=rep_tree(state.vae_params),
            text_params=rep_tree(state.text_params),
        )

    def place_state(self, state: TrainState) -> TrainState:
        sh = self.state_shardings(state)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, sh,
            is_leaf=lambda x: x is None,
        )

    # --- step -------------------------------------------------------------

    def _microbatch_loss(self, params, state: TrainState, micro: Dict, rng):
        cfg = self.cfg
        r_cond, r_drop, r_eps, r_t, r_enc1, r_enc2 = jax.random.split(rng, 6)
        unpack = lambda v: (  # channel-packed (B,F,H,W*3) -> (B,F,H,W,3)
            v.reshape(v.shape[:3] + (v.shape[3] // 3, 3)) if v.ndim == 4 else v)
        micro = dict(micro,
                     input_video=unpack(micro["input_video"]),
                     edited_video=unpack(micro["edited_video"]))
        b, f = micro["input_video"].shape[:2]
        flat = lambda v: v.reshape((b * f,) + v.shape[2:])
        unflat = lambda v: v.reshape((b, f) + v.shape[1:])

        # frozen encoders, no grad (stop_gradient + frozen params)
        text_emb = self.text_encoder.apply(
            {"params": state.text_params}, micro["prompt_ids"])
        enc = lambda v, r: unflat(self.vae.apply(
            {"params": state.vae_params}, flat(v), r, method=AutoencoderKL.encode))
        # cond latent: unscaled + 10% dropout (instruct_p2p_video.py:81-90)
        cond = enc(micro["input_video"], r_enc1)
        drop = jax.random.bernoulli(r_drop, cfg.cond_image_dropout, (b,))
        cond = jnp.where(drop[:, None, None, None, None], 0.0, cond)
        # diffused target latent: scaled, q-sampled (instruct_p2p_video.py:92-108)
        x0 = enc(micro["edited_video"], r_enc2) * cfg.scale_factor
        eps = jax.random.normal(r_eps, x0.shape, dtype=jnp.float32)
        t = jax.random.randint(r_t, (b,), 0, self.schedule.num_train_timesteps)
        x_t = add_noise(self.schedule, x0, eps, t)
        x_t, eps, t, cond, text_emb = jax.tree_util.tree_map(
            jax.lax.stop_gradient, (x_t, eps, t, cond, text_emb))

        sample = jnp.concatenate([x_t, cond], axis=-1)
        pred = self.unet.apply({"params": params}, sample, t, text_emb)
        target = eps if cfg.prediction_type == "epsilon" else x0
        return _loss(pred, target, cfg.loss_type)

    def _train_step(self, state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        cfg = self.cfg
        accum = cfg.accumulate_grad_batches
        split = lambda v: v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
        micros = jax.tree_util.tree_map(split, batch)

        # Differentiate w.r.t. the trainable (motion) leaves ONLY: the
        # reference optimizes just the 'motion' params
        # (instruct_p2p_video.py:239-241), so carrying a full-tree f32 grad
        # accumulator through the scan would waste ~3.4 GB of HBM on frozen
        # spatial/text weights. The scan carry here is motion-sized, and
        # the backward pass skips frozen-param weight-grad work entirely.
        flat, treedef = jax.tree_util.tree_flatten(state.params)
        mask_flat = jax.tree_util.tree_leaves(
            motion_param_mask(state.params, cfg.trainable_pattern))
        train_idx = [i for i, m in enumerate(mask_flat) if m]

        def loss_of(train_leaves, micro, key):
            leaves = [jax.lax.stop_gradient(p) for p in flat]
            for i, tl in zip(train_idx, train_leaves):
                leaves[i] = tl
            params = jax.tree_util.tree_unflatten(treedef, leaves)
            return self._microbatch_loss(params, state, micro, key)

        grad_fn = jax.value_and_grad(loss_of)
        train_leaves = [flat[i] for i in train_idx]

        def acc_body(carry, inp):
            g_acc, l_acc = carry
            micro, key = inp
            loss, g = grad_fn(train_leaves, micro, key)
            g_acc = [a + b.astype(jnp.float32) for a, b in zip(g_acc, g)]
            return (g_acc, l_acc + loss), None

        zeros = [jnp.zeros(flat[i].shape, jnp.float32) for i in train_idx]
        keys = jax.random.split(jax.random.fold_in(rng, state.step), accum)
        (g_sum, loss_sum), _ = jax.lax.scan(acc_body, (zeros, 0.0), (micros, keys))
        loss = loss_sum / accum

        # expand to a full-tree grads pytree: frozen leaves get broadcast
        # zeros, which the optimizer's set_to_zero branch ignores and
        # XLA's simplifier folds out of apply_updates
        g_iter = iter(g_sum)
        grads_flat = [
            (next(g_iter) / accum) if m else jnp.zeros(p.shape, jnp.float32)
            for p, m in zip(flat, mask_flat)
        ]
        grads = jax.tree_util.tree_unflatten(treedef, grads_flat)

        updates, new_opt = self._tx.update(grads, state.opt_state, state.params)
        new_opt = constrain_zero_sharding(new_opt, self.mesh)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt)
        return new_state, {"train_loss": loss}

    def jitted_step(self, state: TrainState):
        if self._step_fn is None:
            sh = self.state_shardings(state)
            self._step_fn = jax.jit(
                self._train_step,
                in_shardings=(sh, batch_sharding(self.mesh), replicated(self.mesh)),
                out_shardings=(sh, replicated(self.mesh)),
                donate_argnums=(0,),
            )
        return self._step_fn

    def aot_step(self, state: TrainState, example_batch: Dict, example_rng):
        """The jitted step, served from the AOT executable cache when
        ``INSV2V_AOT_TRAIN=1`` (apps/train.py defaults it on).

        The production accum-256 step never hits the persistent XLA
        compile cache (330-360 s of compile on EVERY training launch —
        PERF.md r4); pickling the compiled executable skips trace, lower
        AND compile on warm starts. ``extra`` carries every closure
        constant that shapes the program but is invisible to the key's
        avals: the full TrainConfig (optimizer/loss/lr/accum), the model
        module configs (e.g. ``remat`` changes the program at identical
        avals), and the mesh layout. Falls back to the live jitted step
        on any failure. Example args are only traced/lowered, never
        executed or donated."""
        import os

        step = self.jitted_step(state)
        if os.environ.get("INSV2V_AOT_TRAIN", "0") != "1":
            return step
        from insv2v_tpu.utils.aot_cache import load_or_compile

        extra = (repr(self.cfg), repr(self.unet), repr(self.vae),
                 repr(self.text_encoder),
                 repr(sorted(dict(self.mesh.shape).items())))
        return load_or_compile("train_step", step, state, example_batch,
                               example_rng, extra=extra)
