"""Synthetic video prompt-to-prompt dataset generator — the TPU port of
video_prompt_to_prompt.py: drives the ModelScope T2V UNet with the
3-phase PTP sampler, decodes both videos, gates on directional CLIP
similarity, and writes the VideoPromptToPrompt folder layout
(``{seed}_{0|1}_{frame:04d}.jpg`` + prompt.json + metadata.jsonl) with
metadata-driven resume.

    python -m insv2v_tpu.apps.generate_dataset --prompts prompts.json \
        --output-dir video_ptp/raw_generated --num-samples 3
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompts", required=True,
                   help="json list of {input, output, edit} prompt triples")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--num-samples", type=int, default=3,
                   help="accepted samples to collect per prompt")
    p.add_argument("--max-attempts", type=int, default=10)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--latent-size", type=int, default=32)
    p.add_argument("--unet-ckpt", default=None,
                   help="ModelScope text2video_pytorch_model.pth")
    p.add_argument("--vae-ckpt", default=None)
    p.add_argument("--clip-ckpt", default=None,
                   help="OpenCLIP ViT-H text tower (conditioning)")
    p.add_argument("--clip-filter-ckpt", default=None,
                   help="HF CLIPModel (ViT-L/14) for the quality gate")
    p.add_argument("--allow-random-weights", action="store_true")
    p.add_argument("--no-clip-filter", action="store_true",
                   help="accept all samples (when no CLIP weights exist)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ptp-version", choices=("v1", "v2"), default="v2",
                   help="PTP sampler variant; the reference's data-gen uses "
                        "v2 (attention-map sharing); v1 is the staged "
                        "copy-old variant (inference_damo.py:52-157)")
    p.add_argument("--tiny", action="store_true",
                   help="fixture-sized models (CI smoke runs only)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from insv2v_tpu.data.datasets import CLIP_SCORE_GATES
    from insv2v_tpu.diffusion.ptp_sampler import (
        frac_phase_steps,
        sample_ptp_pair,
        sample_ptp_pair_v1,
    )
    from insv2v_tpu.diffusion.schedules import (
        DiffusionSchedule,
        make_sampler_tables,
    )
    from insv2v_tpu.models.modelscope_t2v import ModelScopeConfig, UNetSD
    from insv2v_tpu.models.openclip_text import (
        OpenClipTextConfig,
        OpenClipTextEncoder,
    )
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
    from insv2v_tpu.text.prompt_diff import build_ptp_key_value, compute_diff
    from insv2v_tpu.text.tokenizer import get_tokenizer
    from insv2v_tpu.utils.media import save_gif, to_uint8

    with open(args.prompts) as f:
        prompts = json.load(f)
    prompts = prompts[args.start: args.end]

    if args.tiny:
        ms_cfg = ModelScopeConfig.tiny(context_dim=16)
        vae_cfg = VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4, embed_dim=4, resolution=64)
        clip_cfg = OpenClipTextConfig(width=16, num_layers=2, num_heads=2)
    else:
        ms_cfg = ModelScopeConfig()
        vae_cfg = VaeConfig()
        clip_cfg = OpenClipTextConfig.vit_h_14()
    unet = UNetSD(cfg=ms_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(cfg=vae_cfg, dtype=jnp.bfloat16)
    text = OpenClipTextEncoder(clip_cfg, dtype=jnp.bfloat16)
    tokenizer = get_tokenizer()

    k = jax.random.PRNGKey(args.seed)
    hw = args.latent_size
    params = {}
    from insv2v_tpu.utils.checkpoint import load_torch_weights
    from insv2v_tpu.utils.convert import (
        convert_openclip_text_state_dict,
        convert_vae_state_dict,
    )

    if args.vae_ckpt:
        params["vae"] = convert_vae_state_dict(load_torch_weights(args.vae_ckpt))
    if args.clip_ckpt:
        params["text"] = convert_openclip_text_state_dict(
            load_torch_weights(args.clip_ckpt))
    if args.unet_ckpt:
        from insv2v_tpu.utils.convert import convert_unet_sd_state_dict

        params["unet"] = convert_unet_sd_state_dict(
            load_torch_weights(args.unet_ckpt), ms_cfg)
    missing = {"unet", "vae", "text"} - set(params)
    if missing and not args.allow_random_weights:
        raise SystemExit(f"missing weights for {sorted(missing)}; pass "
                         f"--allow-random-weights for a smoke run")
    if "unet" not in params:
        params["unet"] = unet.init(
            k, jnp.zeros((1, 2, hw, hw, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, ms_cfg.context_dim)))["params"]
    if "vae" not in params:
        params["vae"] = vae.init(k, jnp.zeros((1, 64, 64, 3)),
                                 sample_posterior=False)["params"]
    if "text" not in params:
        params["text"] = text.init(k, jnp.zeros((1, 77), jnp.int32))["params"]

    sched = DiffusionSchedule.create(beta_schedule="scaled_linear",
                                     beta_start=0.00085, beta_end=0.012)
    tables = make_sampler_tables(sched, args.steps, kind="ddim")

    encode_text = jax.jit(lambda p, ids: text.apply({"params": p}, ids))
    decode = jax.jit(lambda p, z: vae.apply(
        {"params": p}, z / 0.18215, method=AutoencoderKL.decode))

    def unet_apply(p, x, t, ctx, sa_share):
        return unet.apply({"params": p}, x, t, ctx, sa_share=sa_share)

    # static phase boundaries are quantized to the step grid (integer step
    # counts) before jitting; with the discrete sa/ca draw grids below the
    # compile-variant count is bounded at 4x6=24 (see the draw site)
    sample_fn = sample_ptp_pair if args.ptp_version == "v2" else sample_ptp_pair_v1
    sampler = jax.jit(
        lambda p, lat, cn, co, ckv, cu, rng, gs, sa_steps, ca_steps:
        sample_fn(
            unet_apply, p, tables, lat, cn, co, ckv, cu, rng,
            guidance_scale=gs, sa_steps=sa_steps, ca_steps=ca_steps),
        static_argnames=("sa_steps", "ca_steps"),
    )

    clip_metric = None
    if args.clip_filter_ckpt:
        from insv2v_tpu.utils.clip_metrics import ClipSimilarity
        from insv2v_tpu.utils.convert import convert_clip_model_state_dict

        clip_metric = ClipSimilarity(convert_clip_model_state_dict(
            load_torch_weights(args.clip_filter_ckpt)), tokenizer=tokenizer)
    elif not args.no_clip_filter:
        print("WARNING: no --clip-filter-ckpt given; accepting all samples "
              "(pass --no-clip-filter to silence)")

    rs = np.random.RandomState(args.seed)
    for p_idx, prompt in enumerate(prompts):
        out_dir = os.path.join(args.output_dir, f"sample_{p_idx + args.start:06d}")
        os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
        meta_path = os.path.join(out_dir, "metadata.jsonl")
        accepted = 0
        if os.path.exists(meta_path):  # resume (video_prompt_to_prompt.py:160-168)
            prior_versions = set()
            with open(meta_path) as f:
                for line in f:
                    m = json.loads(line)
                    if m.get("accepted"):
                        accepted += 1
                    prior_versions.add(m.get("ptp_version", "unrecorded"))
            if prior_versions - {args.ptp_version}:
                print(f"WARNING: resuming {out_dir} with --ptp-version "
                      f"{args.ptp_version}, but existing records were "
                      f"generated with {sorted(prior_versions)} — the "
                      "sample set will mix PTP variants", flush=True)
        with open(os.path.join(out_dir, "prompt.json"), "w") as f:
            json.dump(prompt, f)

        attempts = 0
        while accepted < args.num_samples and attempts < args.max_attempts:
            attempts += 1
            seed = int(rs.randint(0, 2**31 - 1))
            # Hyper draws match the reference's discrete grids EXACTLY
            # (video_prompt_to_prompt.py:178-182): guidance/edit_weight are
            # integer randints (traced values — no recompile), sa/ca come
            # from linspace grids of 4 and 6 points. Since the only static
            # jit args are (sa_steps, ca_steps), compile variants are
            # bounded by the 4x6=24 grid combinations (fewer after the
            # int(x*steps) step-grid quantization collapses duplicates).
            guidance = float(rs.randint(5, 13))
            sa_end = round(float(rs.choice(np.linspace(0.3, 0.45, 4))), 2)
            ca_end = round(float(rs.choice(np.linspace(0.6, 0.85, 6))), 2)
            edit_weight = float(rs.randint(1, 6))

            pieces = compute_diff(prompt["input"], prompt["output"])
            for piece in pieces:
                if piece.old != piece.new:
                    piece.weight = edit_weight
            ctx_old = encode_text(params["text"], jnp.asarray(
                tokenizer([prompt["input"]])))
            ctx_new = encode_text(params["text"], jnp.asarray(
                tokenizer([prompt["output"]])))
            ctx_un = encode_text(params["text"], jnp.asarray(tokenizer([""])))
            key_ctx, val_ctx = build_ptp_key_value(
                pieces, tokenizer,
                lambda ids: encode_text(params["text"], jnp.asarray(ids)))

            lat = jax.random.normal(
                jax.random.PRNGKey(seed), (1, args.num_frames, hw, hw, 4))
            # reference boundary semantics (`i < frac*steps`, fractional
            # step included): int(frac*steps) undercounted one step for
            # half the sa/ca grid points (r4 advisor)
            sa_steps = frac_phase_steps(sa_end, args.steps)
            # tiny-step safeguard: at the reference's >=20 steps the sa/ca
            # grids can never collide on the step grid, but smoke runs with
            # steps<=6 can quantize both to the same step count
            ca_steps = min(max(frac_phase_steps(ca_end, args.steps),
                               sa_steps + 1), args.steps)
            out = sampler(params["unet"], lat, ctx_new, ctx_old,
                          (jnp.asarray(key_ctx), jnp.asarray(val_ctx)),
                          ctx_un, jax.random.PRNGKey(seed), guidance,
                          sa_steps, ca_steps)

            frames = {}
            for tag, latv in (("0", out["latent_old"]), ("1", out["latent"])):
                imgs = np.asarray(decode(params["vae"], latv[0]))
                frames[tag] = np.clip(imgs, -1, 1)

            if clip_metric is not None:
                s = clip_metric(frames["0"], frames["1"],
                                [prompt["input"]], [prompt["output"]])
                scores = dict(
                    sim_0=float(np.mean(s["sim_0"])),
                    sim_1=float(np.mean(s["sim_1"])),
                    sim_dir=float(np.mean(s["sim_direction"])),
                    sim_image=float(np.mean(s["sim_image"])),
                )
                ok = (scores["sim_0"] > CLIP_SCORE_GATES["sim_0"]
                      and scores["sim_1"] > CLIP_SCORE_GATES["sim_1"]
                      and scores["sim_dir"] > CLIP_SCORE_GATES["sim_dir"]
                      and scores["sim_image"] > CLIP_SCORE_GATES["sim_image"])
            else:
                scores = dict(sim_0=1.0, sim_1=1.0, sim_dir=1.0, sim_image=1.0)
                ok = True
            record = dict(seed=seed, guidance=guidance, sa_end=sa_end,
                          ca_end=ca_end, edit_weight=edit_weight,
                          ptp_version=args.ptp_version, accepted=ok, **scores)
            with open(meta_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            if ok:
                import cv2

                for tag in ("0", "1"):
                    for i, fr in enumerate(to_uint8(frames[tag])):
                        cv2.imwrite(
                            os.path.join(out_dir, "image",
                                         f"{seed}_{tag}_{i:04d}.jpg"),
                            cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
                save_gif(frames["1"], os.path.join(out_dir, f"{seed}.gif"))
                accepted += 1
        print(f"prompt {p_idx}: accepted {accepted} in {attempts} attempts")


if __name__ == "__main__":
    main()
