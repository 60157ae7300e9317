"""Single-video instruction editing CLI — the video_edit.ipynb /
gradio_demo.py recipe as a command:

    python -m insv2v_tpu.apps.edit_video \
        --video data/car-turn.mp4 --prompt "make it snowy" \
        --output out.gif --ckpt insv2v.pth

Defaults mirror the notebook: 384px, 32 frames @ 8fps sampling, 16-frame
windows with 4 ref frames, DDPM 20 steps, text_cfg 7.5 / video_cfg 1.2,
noise_correct 0.5, motion compensation on.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", required=True, help="input mp4")
    p.add_argument("--prompt", required=True, help="edit instruction")
    p.add_argument("--output", default="edited.gif")
    p.add_argument("--config", default="configs/instruct_v2v.yaml")
    p.add_argument("--ckpt", default=None, help="fused insv2v .pth checkpoint")
    p.add_argument("--image-size", type=int, default=384)
    p.add_argument("--num-frames", type=int, default=32)
    p.add_argument("--sampling-fps", type=int, default=8)
    p.add_argument("--text-cfg", type=float, default=7.5)
    p.add_argument("--video-cfg", type=float, default=1.2)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--scheduler", default="ddpm", choices=["ddpm", "ddim"])
    p.add_argument("--frames-in-batch", type=int, default=16)
    p.add_argument("--num-ref-frames", type=int, default=4)
    p.add_argument("--noise-correct", type=float, default=0.5)
    p.add_argument("--with-optical-flow", action="store_true")
    p.add_argument("--flow-estimator", default="auto",
                   choices=["auto", "farneback", "raft", "zero"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--allow-random-weights", action="store_true",
                   help="run without a checkpoint (smoke tests only)")
    return p


def make_editor(config_path: str, ckpt: str | None, scheduler: str,
                steps: int, allow_random: bool):
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.diffusion.pipeline import VideoEditor
    from insv2v_tpu.utils.checkpoint import load_pipeline_params
    from insv2v_tpu.utils.config import load_config
    from insv2v_tpu.utils.factory import get_models

    cfg = load_config(config_path)
    models = get_models(cfg, dtype=jnp.bfloat16)
    unet, vae, text = models["unet"], models["vae"], models["text_model"]

    from insv2v_tpu.utils.checkpoint import merge_params

    loaded = {}
    if ckpt:
        loaded = load_pipeline_params(fused_ckpt=ckpt)
    missing = {k for k in ("unet", "vae", "text")} - set(loaded)
    if missing and not ckpt and not allow_random:
        sys.exit(f"no checkpoint given; pass --allow-random-weights to "
                 f"smoke-test without weights")
    if missing and ckpt:
        print(f"WARNING: checkpoint lacks {sorted(missing)}; they stay "
              f"random-init (strict=False semantics)", file=sys.stderr)
    k = jax.random.PRNGKey(0)

    def base(name, init_fn):
        # when the checkpoint fully provides a component, materialize the
        # init as zeros via eval_shape (merge overwrites everything) —
        # skips minutes of 0.86B-param random init on CPU hosts. Partial
        # components keep the real random init (strict=False semantics).
        shapes = jax.eval_shape(init_fn, k)
        if name in loaded:
            want = jax.tree_util.tree_structure(shapes)
            have = jax.tree_util.tree_structure(loaded[name])
            if want == have:
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return init_fn(k)

    params = {
        "unet": base("unet", lambda kk: unet.init(
            kk, jnp.zeros((1, 2, 32, 32, unet.cfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, unet.cfg.cross_attention_dim)))["params"]),
        "vae": base("vae", lambda kk: vae.init(
            kk, jnp.zeros((1, 64, 64, 3)), sample_posterior=False)["params"]),
        "text": base("text", lambda kk: text.init(
            kk, jnp.zeros((1, 77), jnp.int32))["params"]),
    }
    params = merge_params(params, loaded)

    return VideoEditor(unet, vae, text, params, scheduler=scheduler,
                       num_steps=steps)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from insv2v_tpu.data.datasets import SingleVideoDataset
    from insv2v_tpu.utils.media import concat_videos, save_gif

    ds = SingleVideoDataset(
        args.video, sampling_fps=args.sampling_fps, num_frames=args.num_frames,
        output_size=(args.image_size, args.image_size))
    frames = ds[0]["frames"]

    editor = make_editor(args.config, args.ckpt, args.scheduler, args.steps,
                         args.allow_random_weights)
    flow_est = None
    if args.with_optical_flow:
        from insv2v_tpu.utils.flow import get_flow_estimator

        flow_est = get_flow_estimator(args.flow_estimator)
    edited = editor(
        frames, args.prompt,
        text_cfg=args.text_cfg, video_cfg=args.video_cfg,
        frames_per_window=args.frames_in_batch,
        num_ref_frames=args.num_ref_frames,
        noise_correct_step=args.noise_correct,
        use_motion_compensation=args.with_optical_flow,
        flow_estimator=flow_est,
        seed=args.seed,
    )
    save_gif(concat_videos([frames, edited]), args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
