"""CLIP vision tower + directional similarity vs HF CLIPModel (tiny,
offline, random weights) through the converter."""

import numpy as np
import pytest
import torch

from insv2v_tpu.models.clip_text import ClipTextConfig
from insv2v_tpu.models.clip_vision import ClipVisionConfig
from insv2v_tpu.utils.clip_metrics import ClipSimilarity
from insv2v_tpu.utils.convert import convert_clip_model_state_dict


class IdTokenizer:
    """Deterministic toy tokenizer for metric tests; EOT is max id."""

    eot_id = 31

    def __call__(self, texts, max_length=16):
        out = np.full((len(texts), max_length), self.eot_id, np.int32)
        for i, t in enumerate(texts):
            ids = [30] + [sum(map(ord, w)) % 29 for w in t.split()][:14] + [31]
            out[i, : len(ids)] = ids
        return out


@pytest.fixture(scope="module")
def pair():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HT, \
        CLIPVisionConfig as HV

    hf_cfg = CLIPConfig.from_text_vision_configs(
        HT(vocab_size=32, hidden_size=16, intermediate_size=32,
           num_hidden_layers=2, num_attention_heads=2,
           max_position_embeddings=16, hidden_act="quick_gelu",
           bos_token_id=30, eos_token_id=31),
        HV(hidden_size=24, intermediate_size=48, num_hidden_layers=2,
           num_attention_heads=2, image_size=32, patch_size=8,
           hidden_act="quick_gelu"),
        projection_dim=20,
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg)
    hf.eval()
    params = convert_clip_model_state_dict(hf.state_dict())
    sim = ClipSimilarity(
        params,
        tokenizer=IdTokenizer(),
        text_cfg=ClipTextConfig(vocab_size=32, hidden_size=16, num_layers=2,
                                num_heads=2, intermediate_size=32,
                                max_positions=16),
        vision_cfg=ClipVisionConfig(hidden_size=24, num_layers=2, num_heads=2,
                                    intermediate_size=48, image_size=32,
                                    patch_size=8, projection_dim=20),
    )
    return hf, sim


def test_image_features_match_hf(pair):
    hf, sim = pair
    # bypass preprocessing: feed already-normalized 32x32 inputs
    import jax.numpy as jnp
    import insv2v_tpu.models.clip_vision as cv

    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    pooled = sim.vision_model.apply({"params": sim.params["vision"]},
                                    jnp.asarray(x))
    feats = sim.vis_proj.apply({"params": sim.params["visual_projection"]}, pooled)
    with torch.no_grad():
        ref = hf.get_image_features(
            pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(feats), ref.numpy(), atol=2e-5)


def test_text_features_match_hf(pair):
    hf, sim = pair
    ids = IdTokenizer()(["a cat on a mat", "snowy street"])
    feats = sim._embed_text(sim.params, np.asarray(ids))
    with torch.no_grad():
        ref = hf.get_text_features(input_ids=torch.from_numpy(ids).long())
    np.testing.assert_allclose(np.asarray(feats), ref.numpy(), atol=2e-5)


def test_similarity_suite_properties(pair):
    _, sim = pair
    rs = np.random.RandomState(1)
    f0 = np.clip(rs.randn(3, 32, 32, 3) * 0.3, -1, 1).astype(np.float32)
    f1 = np.clip(f0 + rs.randn(*f0.shape) * 0.05, -1, 1).astype(np.float32)
    scores = sim(f0, f1, ["a cat"] * 1, ["a dog"] * 1)
    for k in ("sim_0", "sim_1", "sim_direction", "sim_image"):
        assert scores[k].shape == (3,)
        assert np.all(np.abs(scores[k]) <= 1.0 + 1e-5)
    # identical images => sim_image == 1
    same = sim(f0, f0, ["a"], ["a"])
    np.testing.assert_allclose(same["sim_image"], 1.0, atol=1e-5)
