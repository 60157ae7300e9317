"""LOVEU-TGVE-2023 benchmark runner — the TPU port of
insv2v_run_loveu_tgve.py: sweeps the CFG-grid product over all videos and
the 4 edit types, with idempotent skip-if-exists resume, GIF + frame
dumps, and optional built-in directional-CLIP scoring + throughput
metrics (which the reference lacked — SURVEY.md §6).

    python -m insv2v_tpu.apps.run_loveu_tgve --ckpt insv2v.pth \
        --data-dir loveu-tgve-2023 --text-cfg 7.5 10 --video-cfg 1.2 1.5
"""

from __future__ import annotations

import argparse
import json
import os
import time
from itertools import product


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text-cfg", nargs="+", type=float, default=[7.5])
    p.add_argument("--video-cfg", nargs="+", type=float, default=[1.8])
    p.add_argument("--num-frames", nargs="+", type=int, default=[32])
    p.add_argument("--image-size", nargs="+", type=int, default=[384])
    p.add_argument("--prompt-source", default="edit",
                   choices=["edit", "original"],
                   help="'edit': per-video edit INSTRUCTIONS from the "
                   "edit-prompt dict (the reference's default and the "
                   "paper's benchmark mode, insv2v_run_loveu_tgve.py:"
                   "100-111); 'original': the CSV's edited-caption "
                   "columns")
    p.add_argument("--edit-prompt-dict", default=None,
                   help="path to loveu_tgve_edit_prompt_dict.json "
                   "(default: <data-dir>/loveu_tgve_edit_prompt_dict."
                   "json, then the copy packaged in insv2v_tpu/data/); "
                   "only used with --prompt-source edit")
    p.add_argument("--ckpt-path", "--ckpt", dest="ckpt_path", default=None)
    p.add_argument("--config-path", default="configs/instruct_v2v.yaml")
    p.add_argument("--data-dir", default="loveu-tgve-2023")
    p.add_argument("--output-dir", default="loveu_outputs")
    p.add_argument("--with_optical_flow", action="store_true")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--scheduler", default="ddpm")
    p.add_argument("--frames-in-batch", type=int, default=16)
    p.add_argument("--num-ref-frames", type=int, default=4)
    p.add_argument("--noise-correct", type=float, default=0.5)
    p.add_argument("--limit-videos", type=int, default=None)
    p.add_argument("--allow-random-weights", action="store_true")
    p.add_argument("--num-shards", type=int, default=1,
                   help="split the sweep across N independent workers "
                   "(one per chip/host); combine with --shard-index")
    p.add_argument("--shard-index", type=int, default=0)
    p.add_argument("--flow-estimator", default="auto",
                   choices=["auto", "farneback", "raft", "zero"])
    p.add_argument("--batch-edits", type=int, default=1,
                   help="how many of a video's edit prompts share one "
                   "denoise chain (they share image conditioning). "
                   "Default 1: v5e A/B showed the chip is saturated at "
                   "the CFG-triple already — batching LOSES 6-17% "
                   "per-frame throughput (PERF.md r3); scale across "
                   "chips with --num-shards instead")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # shard workers pay warmup per process: serve the window samplers
    # from the AOT executable cache (PERF.md r4: 129 s -> ~48 s)
    os.environ.setdefault("INSV2V_AOT_PIPELINE", "1")
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from insv2v_tpu.apps.edit_video import make_editor
    from insv2v_tpu.data.datasets import LoveuTgveVideoDataset
    from insv2v_tpu.utils.media import concat_videos, save_frames, save_gif

    editor = make_editor(args.config_path, args.ckpt_path, args.scheduler,
                         args.steps, args.allow_random_weights)

    # Benchmark prompt mode (insv2v_run_loveu_tgve.py:100-111): 'edit'
    # feeds per-video edit INSTRUCTIONS (edit_prompt_dict[video]['edit_'
    # + key]) — the instruction-tuned model's intended input and the
    # paper's configuration; 'original' feeds the CSV's edited captions.
    edit_prompt_dict = None
    if args.prompt_source == "edit":
        # resolution order: explicit --edit-prompt-dict > a copy in the
        # data dir > the benchmark data file packaged with insv2v_tpu
        # (insv2v_tpu/data/loveu_tgve_edit_prompt_dict.json — the 76x4
        # edit-instruction dict the reference ships, dataset/
        # loveu_tgve_edit_prompt_dict.json), so the paper's benchmark
        # mode works with no extra files
        import insv2v_tpu.data as _data_pkg

        candidates = [args.edit_prompt_dict] if args.edit_prompt_dict else [
            os.path.join(args.data_dir, "loveu_tgve_edit_prompt_dict.json"),
            os.path.join(os.path.dirname(_data_pkg.__file__),
                         "loveu_tgve_edit_prompt_dict.json"),
        ]
        dict_path = next((p for p in candidates if os.path.exists(p)), None)
        if dict_path is not None:
            with open(dict_path) as f:
                edit_prompt_dict = json.load(f)
            print(f"# edit prompts: {dict_path}", flush=True)
        else:
            print(f"WARNING: --prompt-source edit but none of {candidates} "
                  "exist — falling back to the CSV caption columns "
                  "(--prompt-source original semantics)", flush=True)

    def pick_prompt(video_name: str, prompt_key: str, item) -> str:
        if edit_prompt_dict is not None:
            entry = edit_prompt_dict.get(video_name)
            if entry is None or ("edit_" + prompt_key) not in entry:
                print(f"WARNING: no edit prompt for {video_name}/"
                      f"{prompt_key}; using the caption column", flush=True)
                return item[prompt_key]
            return entry["edit_" + prompt_key]
        return item[prompt_key]

    metrics = {"videos": 0, "frames": 0, "seconds": 0.0}
    prompts_used = {}  # tag -> prompt actually fed to the editor
    names = None
    for image_size in args.image_size:
        ds = LoveuTgveVideoDataset(args.data_dir,
                                   image_size=(image_size, image_size))
        names = ds.video_names()
        if args.limit_videos:
            names = names[: args.limit_videos]
        grid = list(product(names, args.text_cfg, args.video_cfg,
                            args.num_frames))
        # static round-robin sweep sharding: the grid cells are independent,
        # so N chips/hosts scale the benchmark embarrassingly (SURVEY §5.8)
        grid = grid[args.shard_index:: args.num_shards]
        flow_est = None
        if args.with_optical_flow:
            from insv2v_tpu.utils.flow import get_flow_estimator

            flow_est = get_flow_estimator(args.flow_estimator)
        for video_name, text_cfg, video_cfg, num_frames in grid:
            item = ds[video_name]
            total = item["frames"].shape[0]
            frame_skip = max(1, total // num_frames)
            frames = item["frames"][::frame_skip][:num_frames]
            # All 4 edit types of a video share its image conditioning, so
            # --batch-edits N>1 runs them as ONE prompt-batched denoise
            # chain (B=N video batch => 3N with the CFG triple) instead of
            # the reference's sequential chains
            # (insv2v_run_loveu_tgve.py:83-101). Measured on the v5e this
            # LOSES 6-19% per-frame throughput (the chip saturates at the
            # CFG triple — PERF.md r3), so the default is the reference's
            # serial order; the batched path exists for pod-slice meshes
            # where per-chip batch shrinks. Partial resumes batch only the
            # missing prompts.
            pending, tags = [], []
            for prompt_key in LoveuTgveVideoDataset.EDIT_KEYS:
                tag = (f"{video_name}-{prompt_key}-tcfg{text_cfg}-"
                       f"vcfg{video_cfg}-f{num_frames}-s{image_size}")
                if os.path.exists(os.path.join(args.output_dir, f"{tag}.gif")):
                    continue  # idempotent resume
                prompt = pick_prompt(video_name, prompt_key, item)
                pending.append(prompt)
                tags.append(tag)
                prompts_used[tag] = prompt
            for i in range(0, len(pending), max(1, args.batch_edits)):
                prompts = pending[i: i + max(1, args.batch_edits)]
                t0 = time.perf_counter()
                edited_b = editor(
                    frames, prompts,
                    text_cfg=text_cfg, video_cfg=video_cfg,
                    frames_per_window=args.frames_in_batch,
                    num_ref_frames=args.num_ref_frames,
                    noise_correct_step=args.noise_correct,
                    use_motion_compensation=args.with_optical_flow,
                    flow_estimator=flow_est,
                )
                dt = time.perf_counter() - t0
                for j, tag in enumerate(tags[i: i + len(prompts)]):
                    edited = edited_b[j]
                    metrics["videos"] += 1
                    metrics["frames"] += int(edited.shape[0])
                    out_gif = os.path.join(args.output_dir, f"{tag}.gif")
                    save_gif(concat_videos([frames, edited]), out_gif)
                    save_frames(edited, os.path.join(args.output_dir, tag))
                metrics["seconds"] += dt
                nf = len(prompts) * frames.shape[0]
                print(f"{tags[i]} (+{len(prompts)-1} batched): {dt:.1f}s "
                      f"({nf / dt:.2f} frames/s)")

    if metrics["seconds"] > 0:
        metrics["frames_per_sec"] = metrics["frames"] / metrics["seconds"]
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "throughput.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    if prompts_used:  # provenance: which prompt each output was edited with
        # per-shard file + atomic replace: N shard workers share one
        # output dir, and a read-merge-write of a single file would race
        # (lost entries / a reader seeing a half-written file)
        fname = ("prompts_used.json" if args.num_shards == 1
                 else f"prompts_used.shard{args.shard_index:02d}.json")
        path = os.path.join(args.output_dir, fname)
        merged = {}
        if os.path.exists(path):  # same-shard resume only
            with open(path) as f:
                merged = json.load(f)
        merged.update(prompts_used)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=2)
        os.replace(tmp, path)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
