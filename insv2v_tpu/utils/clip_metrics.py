"""Directional CLIP similarity — the repo's quality metric and data filter.

Re-implements misc_utils/clip_similarity.py:10-47 on our Flax CLIP towers:
  sim_0   = cos(image_0, text_0)
  sim_1   = cos(image_1, text_1)
  sim_dir = cos(image_1 - image_0, text_1 - text_0)
  sim_img = cos(image_0, image_1)
Used as the data-gen acceptance gate (video_prompt_to_prompt.py:216) and
as the LOVEU evaluation score.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from insv2v_tpu.models.clip_vision import (
    ClipVisionConfig,
    ClipVisionEncoder,
    ClipTextProjection,
    ClipVisionProjection,
    preprocess_frames,
)


def _norm(x, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def cosine(a, b):
    return jnp.sum(_norm(a) * _norm(b), axis=-1)


class ClipSimilarity:
    """Holds CLIP towers + projections and computes the 4-score suite.

    ``params`` keys: 'vision', 'visual_projection', 'text',
    'text_projection'. The text pooled feature is the final-LN hidden at
    the EOT (max-id) token, matching HF/openai CLIP.
    """

    def __init__(
        self,
        params: Dict,
        tokenizer=None,
        text_cfg: ClipTextConfig = ClipTextConfig(),
        vision_cfg: ClipVisionConfig = ClipVisionConfig(),
    ):
        self.params = params
        if tokenizer is None:
            from insv2v_tpu.text.tokenizer import get_tokenizer

            tokenizer = get_tokenizer()
        self.tokenizer = tokenizer
        self.text_model = ClipTextEncoder(text_cfg)
        self.vision_model = ClipVisionEncoder(vision_cfg)
        self.vis_proj = ClipVisionProjection(vision_cfg.projection_dim)
        self.txt_proj = ClipTextProjection(vision_cfg.projection_dim)
        self._eot_id = getattr(tokenizer, "eot_id", None)

        @jax.jit
        def embed_image(p, frames):
            pooled = self.vision_model.apply(
                {"params": p["vision"]},
                preprocess_frames(frames, vision_cfg.image_size))
            return self.vis_proj.apply({"params": p["visual_projection"]}, pooled)

        @jax.jit
        def embed_text(p, ids):
            hidden = self.text_model.apply({"params": p["text"]}, ids)
            # pooled = hidden at the first EOT position (argmax of ids works
            # for CLIP because EOT is the largest id)
            pos = jnp.argmax(ids, axis=-1)
            pooled = jnp.take_along_axis(
                hidden, pos[:, None, None], axis=1)[:, 0]
            return self.txt_proj.apply({"params": p["text_projection"]}, pooled)

        self._embed_image = embed_image
        self._embed_text = embed_text

    def image_features(self, frames: np.ndarray) -> jnp.ndarray:
        return self._embed_image(self.params, jnp.asarray(frames))

    def text_features(self, texts: List[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(texts))
        return self._embed_text(self.params, ids)

    def __call__(
        self,
        frames_0: np.ndarray,
        frames_1: np.ndarray,
        text_0: List[str],
        text_1: List[str],
    ) -> Dict[str, np.ndarray]:
        """frames: (N, H, W, 3) in [-1, 1]; texts broadcast over N."""
        i0 = self.image_features(frames_0)
        i1 = self.image_features(frames_1)
        t0 = self.text_features(text_0)
        t1 = self.text_features(text_1)
        return {
            "sim_0": np.asarray(cosine(i0, t0)),
            "sim_1": np.asarray(cosine(i1, t1)),
            "sim_direction": np.asarray(cosine(i1 - i0, t1 - t0)),
            "sim_image": np.asarray(cosine(i0, i1)),
        }
