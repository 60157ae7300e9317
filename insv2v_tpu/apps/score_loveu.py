"""Directional-CLIP scoring for LOVEU-TGVE outputs — the quantitative
evaluation the reference repo leaves to the paper (SURVEY.md §6): for each
edited GIF produced by ``run_loveu_tgve``, computes sim_0 / sim_1 /
sim_direction / sim_image against the original+edited captions and writes
a summary json.

    python -m insv2v_tpu.apps.score_loveu --outputs loveu_outputs \
        --data-dir loveu-tgve-2023 --clip-ckpt clip_model.bin
"""

from __future__ import annotations

import argparse
import json
import os
import re


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outputs", required=True,
                   help="directory of {video}-{edit}-...gif files")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--clip-ckpt", default=None,
                   help="HF CLIPModel state dict (ViT-L/14)")
    p.add_argument("--frames-per-video", type=int, default=8,
                   help="frames sampled per video for scoring")
    p.add_argument("--allow-random-weights", action="store_true")
    return p


TAG_RE = re.compile(r"^(?P<video>.+?)-(?P<edit>style|object|background|multiple)-")


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from insv2v_tpu.data.datasets import LoveuTgveVideoDataset
    from insv2v_tpu.utils.clip_metrics import ClipSimilarity
    from insv2v_tpu.utils.media import load_gif

    if args.clip_ckpt:
        from insv2v_tpu.utils.checkpoint import load_torch_weights
        from insv2v_tpu.utils.convert import convert_clip_model_state_dict

        params = convert_clip_model_state_dict(
            load_torch_weights(args.clip_ckpt))
        sim = ClipSimilarity(params)
    elif args.allow_random_weights:
        import jax
        import jax.numpy as jnp

        from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
        from insv2v_tpu.models.clip_vision import (
            ClipTextProjection,
            ClipVisionConfig,
            ClipVisionEncoder,
            ClipVisionProjection,
        )

        tc, vc = ClipTextConfig(), ClipVisionConfig()
        k = jax.random.PRNGKey(0)
        params = {
            "text": ClipTextEncoder(tc).init(
                k, jnp.zeros((1, 77), jnp.int32))["params"],
            "vision": ClipVisionEncoder(vc).init(
                k, jnp.zeros((1, 224, 224, 3)))["params"],
            "visual_projection": ClipVisionProjection().init(
                k, jnp.zeros((1, vc.hidden_size)))["params"],
            "text_projection": ClipTextProjection().init(
                k, jnp.zeros((1, tc.hidden_size)))["params"],
        }
        sim = ClipSimilarity(params)
    else:
        raise SystemExit("need --clip-ckpt (or --allow-random-weights to smoke)")

    ds = LoveuTgveVideoDataset(args.data_dir)
    records = []
    for fname in sorted(os.listdir(args.outputs)):
        if not fname.endswith(".gif"):
            continue
        m = TAG_RE.match(fname)
        if not m or m.group("video") not in ds.data:
            continue
        item = ds.data[m.group("video")]
        gif = load_gif(os.path.join(args.outputs, fname))
        # runner saves original|edited side by side — right half is the edit
        w = gif.shape[2] // 2
        orig, edited = gif[:, :, :w], gif[:, :, w:]
        step = max(1, orig.shape[0] // args.frames_per_video)
        orig, edited = orig[::step], edited[::step]
        scores = sim(orig, edited, [item["original"]], [item[m.group("edit")]])
        records.append({
            "file": fname,
            "video": m.group("video"),
            "edit": m.group("edit"),
            **{k: float(np.mean(v)) for k, v in scores.items()},
        })
    summary = {
        "count": len(records),
        **{
            k: float(np.mean([r[k] for r in records])) if records else 0.0
            for k in ("sim_0", "sim_1", "sim_direction", "sim_image")
        },
        "records": records,
    }
    out_path = os.path.join(args.outputs, "clip_scores.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "records"}))


if __name__ == "__main__":
    main()
