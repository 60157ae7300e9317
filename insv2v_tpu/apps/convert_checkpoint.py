"""One-shot torch -> Flax checkpoint conversion CLI.

Converts the reference's weight layouts (fused trainer checkpoint, or the
three-source SD/ip2p + AnimateDiff + vqvae + text surgery,
SURVEY.md §5.4) into an orbax directory that the editor/trainer load
directly — so the torch dependency is only needed once, at conversion
time.

    python -m insv2v_tpu.apps.convert_checkpoint --fused insv2v.pth \
        --output converted/insv2v
    python -m insv2v_tpu.apps.convert_checkpoint \
        --unet diffusion_pytorch_model.bin --motion mm_sd_v15.ckpt \
        --vae vqvae.ckpt --text text.ckpt --output converted/insv2v
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fused", default=None, help="fused insv2v .pth")
    p.add_argument("--unet", default=None, help="SD/ip2p UNet .bin")
    p.add_argument("--motion", default=None, help="AnimateDiff motion .ckpt")
    p.add_argument("--vae", default=None, help="vqvae .ckpt")
    p.add_argument("--text", default=None, help="CLIP text .ckpt")
    p.add_argument("--raft", default=None, help="princeton-vl RAFT .pth")
    p.add_argument("--modelscope-unet", default=None,
                   help="text2video_pytorch_model.pth")
    p.add_argument("--output", required=True, help="orbax output directory")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from insv2v_tpu.utils.checkpoint import load_pipeline_params, load_torch_weights

    params = load_pipeline_params(
        fused_ckpt=args.fused,
        unet_weights=args.unet,
        motion_weights=args.motion,
        vae_weights=args.vae,
        text_weights=args.text,
    )
    if args.raft:
        from insv2v_tpu.utils.convert import convert_raft_state_dict

        params["raft"] = convert_raft_state_dict(load_torch_weights(args.raft))
    if args.modelscope_unet:
        from insv2v_tpu.models.modelscope_t2v import ModelScopeConfig
        from insv2v_tpu.utils.convert import convert_unet_sd_state_dict

        params["modelscope_unet"] = convert_unet_sd_state_dict(
            load_torch_weights(args.modelscope_unet), ModelScopeConfig())
    if not params:
        raise SystemExit("nothing to convert — pass at least one source")

    out = os.path.abspath(args.output)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, jax.tree_util.tree_map(np.asarray, params))
    ckptr.wait_until_finished()
    n = len(jax.tree_util.tree_leaves(params))
    print(f"wrote {sorted(params)} ({n} arrays) -> {out}")


if __name__ == "__main__":
    main()
