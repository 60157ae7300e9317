"""T5 text encoder parity vs HF T5EncoderModel (offline tiny config), plus
ClassEmbedder and ClipT5Encoder behavior (modules/openclip/modules.py:25-49,
58-85, 200-215)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.models.t5_text import (
    ClassEmbedder,
    ClipT5Encoder,
    T5Config,
    T5TextEncoder,
    relative_position_bucket,
)
from insv2v_tpu.utils.convert import convert_t5_state_dict


def tiny_hf_t5():
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=128, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg)
    model.eval()
    return model, T5Config.tiny()


class TestT5:
    def test_last_hidden_state_matches_hf(self):
        hf, cfg = tiny_hf_t5()
        params = convert_t5_state_dict(hf.state_dict())
        ids = np.random.RandomState(0).randint(0, 128, (2, 77)).astype(np.int32)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids).long()).last_hidden_state
        got = T5TextEncoder(cfg).apply({"params": params}, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   atol=3e-5, rtol=1e-4)

    def test_bucket_function_matches_hf(self):
        from transformers.models.t5.modeling_t5 import T5Attention

        rel = np.arange(-200, 201).reshape(1, -1)
        ours = np.asarray(relative_position_bucket(jnp.asarray(rel)))
        ref = T5Attention._relative_position_bucket(
            torch.from_numpy(rel), bidirectional=True, num_buckets=32,
            max_distance=128).numpy()
        np.testing.assert_array_equal(ours, ref)


class TestClassEmbedder:
    def test_shapes_and_ucg(self):
        emb = ClassEmbedder(embed_dim=8, n_classes=10, ucg_rate=1.0)
        ids = jnp.array([0, 1, 2, 3])
        params = emb.init(jax.random.PRNGKey(0), ids, disable_dropout=True)
        out = emb.apply(params, ids, disable_dropout=True)
        assert out.shape == (4, 1, 8)
        # ucg_rate=1 -> every sample becomes the unconditional class
        dropped = emb.apply(params, ids, rng=jax.random.PRNGKey(1))
        uncond = emb.apply(params, emb.unconditional_ids(4),
                           disable_dropout=True)
        np.testing.assert_allclose(np.asarray(dropped), np.asarray(uncond))


class TestClipT5:
    def test_returns_both_embeddings(self):
        from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder

        clip = ClipTextEncoder(ClipTextConfig(
            vocab_size=64, hidden_size=12, num_layers=1, num_heads=2,
            intermediate_size=24))
        clip_p = clip.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 77), jnp.int32))["params"]
        t5 = T5TextEncoder(T5Config.tiny())
        t5_p = t5.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 77), jnp.int32))["params"]
        enc = ClipT5Encoder(clip, clip_p, t5, t5_p)
        clip_z, t5_z = enc(jnp.zeros((2, 77), jnp.int32),
                           jnp.zeros((2, 77), jnp.int32))
        assert clip_z.shape == (2, 77, 12) and t5_z.shape == (2, 77, 16)
