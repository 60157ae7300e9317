"""CLIP text encoder parity vs HF transformers (offline tiny config) and
tokenizer parity vs HF CLIPTokenizer over a synthetic BPE vocab."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from insv2v_tpu.text.tokenizer import ClipTokenizer, HashTokenizer, bytes_to_unicode
from insv2v_tpu.utils.convert import convert_clip_text_state_dict


def tiny_hf_model():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg)
    model.eval()
    cfg = ClipTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_positions=77,
    )
    return model, cfg


class TestModel:
    def test_last_hidden_state_matches_hf(self):
        hf, cfg = tiny_hf_model()
        params = convert_clip_text_state_dict(hf.state_dict())
        ids = np.random.RandomState(0).randint(0, 100, size=(2, 77)).astype(np.int32)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids).long()).last_hidden_state.numpy()
        got = ClipTextEncoder(cfg).apply({"params": params}, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_causality(self):
        _, cfg = tiny_hf_model()
        import jax

        model = ClipTextEncoder(cfg)
        ids = np.ones((1, 10), dtype=np.int32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
        out1 = model.apply(variables, jnp.asarray(ids))
        ids2 = ids.copy()
        ids2[0, 5] = 7  # change position 5: outputs before 5 must not change
        out2 = model.apply(variables, jnp.asarray(ids2))
        np.testing.assert_allclose(np.asarray(out1[:, :5]), np.asarray(out2[:, :5]),
                                   atol=1e-6)
        assert np.abs(np.asarray(out1[:, 5:]) - np.asarray(out2[:, 5:])).max() > 1e-4


def build_tiny_vocab(tmp_path):
    """A miniature CLIP-style BPE vocab covering lowercase words."""
    btu = bytes_to_unicode()
    base = [btu[b] for b in range(256)]
    vocab = {}
    for tok in base:
        vocab[tok] = len(vocab)
    for tok in base:
        vocab[tok + "</w>"] = len(vocab)
    merges = [
        ("c", "a"), ("ca", "t</w>"), ("t", "h"), ("th", "e</w>"),
        ("d", "o"), ("do", "g</w>"), ("a", "t</w>"),
    ]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(vp), str(mp), vocab, merges


class TestTokenizer:
    @pytest.mark.parametrize(
        "text",
        ["the cat", "a dog at the   door", "The CAT!", "cat & dog, 42 times"],
    )
    def test_matches_hf_clip_tokenizer(self, tmp_path, text):
        from transformers import CLIPTokenizer as HFTok

        vp, mp, _, _ = build_tiny_vocab(tmp_path)
        hf = HFTok(vocab_file=vp, merges_file=mp)
        ours = ClipTokenizer.from_files(vp, mp)
        ref = hf([text], padding="max_length", max_length=77, truncation=True)[
            "input_ids"
        ][0]
        got = ours([text])[0]
        np.testing.assert_array_equal(got, np.asarray(ref))

    def test_truncation_and_padding(self, tmp_path):
        vp, mp, vocab, _ = build_tiny_vocab(tmp_path)
        ours = ClipTokenizer.from_files(vp, mp)
        long = "cat " * 200
        ids = ours([long])
        assert ids.shape == (1, 77)
        assert ids[0, 0] == vocab["<|startoftext|>"]
        assert ids[0, -1] == vocab["<|endoftext|>"]

    def test_decode_roundtrip(self, tmp_path):
        vp, mp, _, _ = build_tiny_vocab(tmp_path)
        ours = ClipTokenizer.from_files(vp, mp)
        ids = ours.tokenize("the cat at the dog")
        assert ours.decode(ids) == "the cat at the dog"

    def test_hash_tokenizer_deterministic(self):
        t = HashTokenizer()
        a = t(["make it van gogh style"])
        b = t(["make it van gogh style"])
        np.testing.assert_array_equal(a, b)
        assert a.shape == (1, 77)
        assert a[0, 0] == t.sot_id
