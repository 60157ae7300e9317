"""Training CLI — the TPU counterpart of the reference main.py:

    python -m insv2v_tpu.apps.train --config configs/instruct_v2v.yaml -r

Builds models/data from the YAML, initializes the UNet from the SD+motion
merge (instruct_p2p_video.py:222-233) when weights are present, and runs
the dp-mesh trainer with grad accumulation, motion-only optimization,
orbax checkpointing and resume, and jsonl metric logging (wandb-compatible
records; wandb itself is optional and absent in this image).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("-r", "--resume", action="store_true",
                   help="resume from the newest checkpoint in the expt dir")
    p.add_argument("--ckpt", default=None, help="explicit checkpoint to resume")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--allow-random-weights", action="store_true")
    p.add_argument("--nnode", type=int, default=1,
                   help="multi-host: run jax.distributed.initialize first "
                        "(TPU-pod auto-detection)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(explicit process group, e.g. CPU/GPU clusters)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frozen-f32", action="store_true",
                   help="keep frozen (non-motion) weights in f32 instead of "
                        "the default bf16 storage (more HBM, no quality "
                        "benefit: they are consumed in bf16 either way)")
    return p


class JsonlLogger:
    """Metric sink: one json record per line (wandb-compatible schema)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.f = open(path, "a")

    def log(self, record: dict):
        self.f.write(json.dumps(record) + "\n")
        self.f.flush()


def batch_iterator(dataset, batch_size: int, prompt_type: str, tokenizer, rng):
    """Host-side loader: random samples -> stacked device-ready batches.

    prompt selection mirrors get_prompt (instruct_p2p_video.py:40-55).
    """
    import numpy as np

    keys = {"output_prompt": "output_prompt", "edit_prompt": "edit_prompt"}
    while True:
        idxs = rng.randint(0, len(dataset), size=batch_size)
        items = [dataset[int(i)] for i in idxs]
        if prompt_type == "mixed_prompt":
            key = "output_prompt" if rng.rand() > 0.5 else "edit_prompt"
        else:
            key = keys[prompt_type]
        prompts = [it[key] for it in items]
        # videos ship CHANNEL-PACKED (B, F, H, W*3) and bf16: the
        # channel-minor (.., W, 3) layout is tile-padded ~5x in device
        # HBM (an accum-256 batch OOMs a v5e on padding alone —
        # trainer.py docstring) and f32 doubles it again for nothing
        # (pixels are 8-bit at source; the VAE casts to bf16 at conv 1).
        # The trainer unpacks per microbatch inside the step.
        import ml_dtypes

        pack = lambda v: v.reshape(
            v.shape[:-2] + (v.shape[-2] * v.shape[-1],)
        ).astype(ml_dtypes.bfloat16)
        yield {
            "input_video": pack(np.stack([it["input_video"] for it in items])),
            "edited_video": pack(np.stack([it["edited_video"] for it in items])),
            "prompt_ids": tokenizer(prompts),
        }


def main(argv=None):
    args = build_parser().parse_args(argv)
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from insv2v_tpu.text.tokenizer import get_tokenizer
    from insv2v_tpu.training.trainer import TrainConfig, Trainer
    from insv2v_tpu.utils.checkpoint import (
        load_pipeline_params,
        restore_train_state,
        save_train_state,
    )
    from insv2v_tpu.utils.config import load_config
    from insv2v_tpu.utils.factory import get_dataset, get_models

    from insv2v_tpu.parallel.mesh import init_distributed, make_global_batch

    if args.coordinator or (args.num_processes or 0) > 1:
        init_distributed(args.coordinator, args.num_processes, args.process_id)
    elif args.nnode > 1:
        init_distributed()  # TPU pod auto-detection
    proc0 = jax.process_index() == 0

    cfg = load_config(args.config)
    tr = cfg["trainer"]
    expt_dir = os.path.join(cfg.get("expt_dir", "experiments"),
                            cfg.get("expt_name", "run"))
    os.makedirs(expt_dir, exist_ok=True)

    models = get_models(cfg, dtype=jnp.bfloat16)
    unet, vae, text = models["unet"], models["vae"], models["text_model"]

    # initial weights (three-source surgery) or random for smoke tests
    init = cfg.get("init_weights", {})
    unet_w = init.get("unet") or [None, None]
    params = load_pipeline_params(
        unet_weights=unet_w[0] if unet_w[0] and os.path.exists(unet_w[0]) else None,
        motion_weights=unet_w[1] if len(unet_w) > 1 and unet_w[1]
        and os.path.exists(unet_w[1]) else None,
        vae_weights=init.get("vae") if init.get("vae")
        and os.path.exists(init.get("vae")) else None,
        text_weights=init.get("text_model") if init.get("text_model")
        and os.path.exists(init.get("text_model")) else None,
    )
    missing = {"unet", "vae", "text"} - set(params)
    if missing and not args.allow_random_weights:
        sys.exit(f"missing init weights for {sorted(missing)}; pass "
                 f"--allow-random-weights for a smoke run")
    k = jax.random.PRNGKey(args.seed)
    lat = 32
    if "unet" not in params:
        params["unet"] = unet.init(
            k, jnp.zeros((1, 2, lat, lat, unet.cfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, unet.cfg.cross_attention_dim)))["params"]
    if "vae" not in params:
        params["vae"] = vae.init(k, jnp.zeros((1, 8 * lat, 8 * lat, 3)),
                                 sample_posterior=False)["params"]
    if "text" not in params:
        params["text"] = text.init(k, jnp.zeros((1, 77), jnp.int32))["params"]

    tcfg = TrainConfig(
        lr=float(tr.get("lr", 1e-5)),
        loss_type=tr.get("loss_fn", "l2"),
        cond_image_dropout=float(tr.get("cond_image_dropout", 0.1)),
        scale_factor=float(tr.get("scale_factor", 0.18215)),
        accumulate_grad_batches=int(tr.get("accumulate_grad_batches", 1)),
        **{k: v for k, v in cfg.get("diffusion", {}).items()
           if k in ("beta_schedule", "num_train_timesteps", "beta_start",
                    "beta_end")},
    )
    trainer = Trainer(unet, vae, text, tcfg)
    if not args.frozen_f32:
        # frozen weights in bf16 (trainable motion stays f32) — the
        # production memory layout; see trainer.cast_frozen_to_bf16
        from insv2v_tpu.training.trainer import cast_frozen_to_bf16

        params["unet"] = cast_frozen_to_bf16(params["unet"],
                                             tcfg.trainable_pattern)
        cast16 = lambda t: jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, t)
        params["vae"] = cast16(params["vae"])
        params["text"] = cast16(params["text"])
    state = trainer.create_state(params["unet"], params["vae"], params["text"])
    if args.ckpt or args.resume:
        try:
            state = restore_train_state(args.ckpt or expt_dir, state)
            print(f"resumed at step {int(state.step)}")
        except FileNotFoundError:
            if args.ckpt:
                raise
            print("no checkpoint found; starting fresh")
    state = trainer.place_state(state)
    # production launches pay 330-360 s of train-step compile otherwise
    # (the accum-256 program misses the persistent compile cache —
    # PERF.md r4); the AOT executable cache loads the pickled compiled
    # step instead. Defaulted on for TPU only: XLA:CPU re-deserialization
    # of a train-step executable in a resumed process can poison output
    # buffers ("Buffer Definition Event ... not found" at materialization
    # — hit by the resume smoke test); INSV2V_AOT_TRAIN=0/1 overrides.
    if jax.default_backend() == "tpu":
        os.environ.setdefault("INSV2V_AOT_TRAIN", "1")
    step_fn = trainer.jitted_step(state)

    train_ds, _ = get_dataset(cfg)
    tokenizer = get_tokenizer()
    micro = int(tr.get("micro_batch_size", 1))
    # each process hosts only its local share of the global batch; the
    # jitted step sees one dp-sharded global array (make_global_batch)
    n_local = jax.local_device_count()
    per_step_local = tcfg.accumulate_grad_batches * micro * n_local
    base_it = batch_iterator(train_ds, per_step_local,
                             tr.get("prompt_type", "edit_prompt"),
                             tokenizer,
                             np.random.RandomState(
                                 args.seed + jax.process_index()))
    from insv2v_tpu.data.native_loader import PrefetchLoader

    it = PrefetchLoader(lambda: next(base_it), depth=2)

    logger = JsonlLogger(os.path.join(expt_dir, "metrics.jsonl"))
    max_steps = args.max_steps or int(tr.get("max_steps", 1000))
    ckpt_every = int(tr.get("checkpoint_every", 1000))
    val_every = int(tr.get("val_every", 0))
    rng = jax.random.PRNGKey(args.seed)

    validate = None
    if val_every:
        from insv2v_tpu.training.validation import (
            make_validation_fn,
            save_preview_grid,
        )

        validate = make_validation_fn(
            trainer, num_steps=int(cfg.get("diffusion", {}).get(
                "ddim_sampling_steps", 20)),
            text_cfg=float(tr.get("text_cfg", 7.5)),
            img_cfg=float(tr.get("img_cfg", 1.2)))

    try:
        _train_loop(args, cfg, tr, tcfg, trainer, state, step_fn, it, logger,
                    max_steps, ckpt_every, val_every, rng, validate, expt_dir,
                    proc0)
    finally:
        it.close()  # stop the prefetch worker (main() may run in-process
        # more than once: resume tests, notebooks)


def _train_loop(args, cfg, tr, tcfg, trainer, state, step_fn, it, logger,
                max_steps, ckpt_every, val_every, rng, validate, expt_dir,
                proc0):
    import time

    import jax
    import numpy as np

    from insv2v_tpu.parallel.mesh import make_global_batch
    from insv2v_tpu.utils.checkpoint import save_train_state
    if validate is not None:
        from insv2v_tpu.training.validation import save_preview_grid

    aot_done = False
    while int(state.step) < max_steps:
        t0 = time.perf_counter()
        local_batch = next(it)
        batch = make_global_batch(trainer.mesh, local_batch)
        if not aot_done:
            # first batch carries the production avals: swap in the
            # AOT-cached executable (no-op when INSV2V_AOT_TRAIN=0;
            # lowering only traces — the example args are not consumed)
            step_fn = trainer.aot_step(state, batch, rng)
            aot_done = True
        state, metrics = step_fn(state, batch, rng)
        loss = float(metrics["train_loss"])
        step = int(state.step)
        dt = time.perf_counter() - t0
        if proc0:
            logger.log({"step": step, "train_loss": loss, "step_time_s": dt})
            print(f"step {step}: loss={loss:.4f} ({dt:.1f}s)")
        if validate is not None and step % val_every == 0 and proc0:
            n = tcfg.accumulate_grad_batches  # one microbatch worth
            unpack = lambda v: (  # channel-packed bf16 -> f32 (B,F,H,W,3)
                v.reshape(v.shape[:3] + (v.shape[3] // 3, 3))
                .astype(np.float32) if v.ndim == 4 else v)
            vb = {k: (unpack(v) if k.endswith("_video") else v)
                  [: max(1, v.shape[0] // n)]
                  for k, v in local_batch.items()}
            out = validate(state, vb, jax.random.fold_in(rng, step))
            path = save_preview_grid(vb, np.asarray(out["pred"]),
                                     os.path.join(expt_dir, "previews"), step,
                                     trajectory=np.asarray(
                                         out.get("trajectory"))
                                     if out.get("trajectory") is not None
                                     else None)
            logger.log({"step": step, "preview": path})
        if (step % ckpt_every == 0 or step >= max_steps) and proc0:
            path = save_train_state(state, expt_dir)
            print(f"checkpointed {path}")


if __name__ == "__main__":
    main()
