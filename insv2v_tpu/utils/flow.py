"""Host-side optical flow estimation for motion-compensated stitching.

The reference uses torchvision RAFT on CUDA (misc_utils/flow_utils.py:134-189)
purely as a per-window preprocessing step — flow is computed once per
window pair, off the denoising hot loop.  TPU-native plan (SURVEY.md §2.3):
keep estimation host-side (OpenCV Farneback by default, RAFT when its
weights are available), and do all per-step *warping* on device in XLA
(ops/resize.py:warp_image).

Estimators return flow in pixels, channels-last (H, W, 2) = (u, v),
mapping query -> ref (backward warp convention of flow_utils.warp_image).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["FarnebackFlow", "ZeroFlow", "get_flow_estimator", "window_flows"]


class FarnebackFlow:
    """cv2.calcOpticalFlowFarneback on grayscale frames — fully offline."""

    def __init__(self, levels: int = 3, winsize: int = 21, iterations: int = 3):
        self.levels = levels
        self.winsize = winsize
        self.iterations = iterations

    def __call__(self, query: np.ndarray, ref: np.ndarray) -> np.ndarray:
        """query/ref: (H, W, 3) in [-1, 1] -> flow (H, W, 2)."""
        import cv2

        to_gray = lambda im: cv2.cvtColor(
            ((np.clip(im, -1, 1) + 1) * 127.5).astype(np.uint8), cv2.COLOR_RGB2GRAY
        )
        return cv2.calcOpticalFlowFarneback(
            to_gray(query), to_gray(ref), None,
            pyr_scale=0.5, levels=self.levels, winsize=self.winsize,
            iterations=self.iterations, poly_n=5, poly_sigma=1.1, flags=0,
        )


class ZeroFlow:
    """Degenerate estimator: zero displacement (equivalent to the
    mean-delta propagation when scenes are static)."""

    def __call__(self, query: np.ndarray, ref: np.ndarray) -> np.ndarray:
        return np.zeros(query.shape[:2] + (2,), dtype=np.float32)


class RaftFlow:
    """On-device RAFT (models/raft.py) — the reference's flow model
    (flow_utils.py:134-189) run as jitted XLA. Weights: a princeton-vl
    raft .pth via ``weights_path`` (or $INSV2V_RAFT_WEIGHTS)."""

    def __init__(self, weights_path: Optional[str] = None, iters: int = 12,
                 cfg=None, allow_random: bool = False):
        import os

        import jax
        import jax.numpy as jnp

        from insv2v_tpu.models.raft import RAFT, RaftConfig

        self.model = RAFT(cfg=cfg if cfg is not None else RaftConfig(iters=iters))
        weights_path = weights_path or os.environ.get("INSV2V_RAFT_WEIGHTS")
        if weights_path:
            from insv2v_tpu.utils.checkpoint import load_torch_weights
            from insv2v_tpu.utils.convert import convert_raft_state_dict

            self.params = convert_raft_state_dict(
                load_torch_weights(weights_path))
        elif allow_random:
            # Structure-testing escape hatch only (tests/test_samplers.py):
            # random-init RAFT flow is numerically meaningless.
            dummy = jnp.zeros((1, 64, 64, 3))
            self.params = self.model.init(
                jax.random.PRNGKey(0), dummy, dummy)["params"]
        else:
            raise ValueError(
                "RaftFlow requires pretrained weights: set "
                "$INSV2V_RAFT_WEIGHTS or pass weights_path= (the reference "
                "always loads pretrained RAFT, flow_utils.py:134-189). "
                "Random-init RAFT produces meaningless flow; pass "
                "allow_random=True only for structure tests, or use "
                "get_flow_estimator('auto') for the Farneback fallback.")
        self._apply = jax.jit(
            lambda p, a, b: self.model.apply({"params": p}, a, b))

    def __call__(self, query: np.ndarray, ref: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        h, w = query.shape[:2]
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        pad = lambda im: np.pad(im, ((0, hp - h), (0, wp - w), (0, 0)))
        flow = self._apply(self.params, jnp.asarray(pad(query))[None],
                           jnp.asarray(pad(ref))[None])
        return np.asarray(flow)[0, :h, :w]


def get_flow_estimator(kind: str = "auto", **kwargs):
    """``auto`` (the default everywhere): RAFT — the reference's motion
    compensator (flow_utils.py:134-189) — when $INSV2V_RAFT_WEIGHTS (or a
    ``weights_path`` kwarg) is set, else Farneback with a loud warning
    that output quality will not match the reference."""
    if kind == "auto":
        import os

        if kwargs.get("weights_path") or os.environ.get("INSV2V_RAFT_WEIGHTS"):
            return RaftFlow(**kwargs)
        import warnings

        warnings.warn(
            "INSV2V_RAFT_WEIGHTS is not set: falling back to Farneback "
            "optical flow. The reference's motion compensation uses RAFT; "
            "Farneback results will NOT reproduce reference quality. "
            "Point INSV2V_RAFT_WEIGHTS at a princeton-vl raft-large .pth.")
        return FarnebackFlow()
    if kind == "farneback":
        return FarnebackFlow(**kwargs)
    if kind == "zero":
        return ZeroFlow()
    if kind == "raft":
        return RaftFlow(**kwargs)
    raise ValueError(f"unknown flow estimator {kind!r}")


def window_flows(
    estimator,
    frames: np.ndarray,
    num_ref: int,
    latent_hw: tuple,
) -> np.ndarray:
    """Per-window flow stack for the sampler: frames (F, H, W, 3) where the
    first ``num_ref`` are refs; returns (F, R, h, w, 2) at latent
    resolution (rows < num_ref are zero — those frames use their direct
    delta, cf. inference.py:374)."""
    from insv2v_tpu.ops.resize import resize_flow
    import jax.numpy as jnp

    f = frames.shape[0]
    h, w = latent_hw
    flows = np.zeros((f, num_ref, h, w, 2), dtype=np.float32)
    for q in range(num_ref, f):
        for r in range(num_ref):
            fl = estimator(frames[q], frames[r])[None]  # (1, H, W, 2)
            flows[q, r] = np.asarray(resize_flow(jnp.asarray(fl), h, w))[0]
    return flows
