"""CLIP tokenizer + text tower tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.clip import (
    CLIPTextEmbedding,
    ClipBPETokenizer,
    ClipTextEncoder,
    Tokenize,
)
from text_to_sound_synthesis_tpu.models.clip.tokenizer import byte_unicode_table


def _tok():
    try:
        return ClipBPETokenizer()
    except FileNotFoundError:
        pytest.skip("BPE merge table artifact not available")


def test_byte_unicode_table_reversible():
    t = byte_unicode_table()
    assert len(t) == 256 and len(set(t.values())) == 256
    assert t[ord("a")] == "a"
    assert t[ord(" ")] != " "  # whitespace remapped


def test_tokenizer_vocab_structure():
    tok = _tok()
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406 and tok.eot_id == 49407
    # derivable structural golden: 'a</w>' is alphabet entry 64 in the </w> block
    assert tok.encoder["a</w>"] == 256 + (ord("a") - ord("!"))


def test_tokenizer_known_ids():
    tok = _tok()
    # canonical CLIP example: single-word whole-token ids
    assert tok.encode("a") == [320]          # 'a</w>' = 320
    ids = tok.encode("a photo of a cat")
    assert ids[0] == 320 and ids[3] == 320
    assert all(0 <= i < 49408 for i in ids)
    assert len(ids) == 5  # all five words are single CLIP tokens


def test_tokenizer_roundtrip():
    tok = _tok()
    # decode() space-separates every token (CLIP convention), so compare on the
    # punctuation-insensitive word sequence.
    import re
    for text in ["a dog barks loudly", "rain falls on a tin roof!", "engine revving, then stops"]:
        ids = tok.encode(text)
        back = tok.decode(ids)
        assert re.findall(r"\w+", back) == re.findall(r"\w+", text.lower())


def test_tokenize_codec_pad_and_mask():
    _tok()
    codec = Tokenize(context_length=77, add_start_and_end=True, with_mask=True, pad_value=0)
    out = codec.get_tokens(["a dog barks", "water"])
    assert out["token"].shape == (2, 77)
    assert out["mask"].shape == (2, 77)
    assert out["token"][0, 0] == 49406  # SOT
    row = out["token"][0]
    n = out["mask"][0].sum()
    assert row[n - 1] == 49407  # EOT just before padding
    assert (row[n:] == 0).all()


def test_tokenize_codec_truncation_keeps_eot():
    _tok()
    codec = Tokenize(context_length=10, add_start_and_end=True, with_mask=True)
    out = codec.get_tokens(["word " * 50])
    assert out["token"].shape == (1, 10)
    assert out["token"][0, -1] == 49407
    assert out["mask"].all()


def test_text_encoder_shapes_and_causality(rng):
    enc = ClipTextEncoder(vocab_size=100, context_length=16, width=32, layers=2, heads=4)
    tokens = jnp.asarray(rng.integers(0, 100, (2, 16)), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), tokens)
    out = enc.apply(params, tokens)
    assert out.shape == (2, 16, 32)

    # causality: changing a later token must not affect earlier positions
    tokens2 = np.asarray(tokens).copy()
    tokens2[:, 10] = (tokens2[:, 10] + 1) % 100
    out2 = enc.apply(params, jnp.asarray(tokens2))
    np.testing.assert_allclose(np.asarray(out)[:, :10], np.asarray(out2)[:, :10], atol=1e-5)
    assert not np.allclose(np.asarray(out)[:, 10:], np.asarray(out2)[:, 10:])


def test_clip_text_embedding_normalized(rng):
    emb = CLIPTextEmbedding(num_embed=100, normalize=True, pick_last_embedding=False, embed_dim=512)
    # shrink the tower for test speed by monkeypatching? instead use full width
    # but tiny vocab; 12 layers x 512 is ~40 MB params, fine on CPU once.
    tokens = jnp.asarray(rng.integers(0, 100, (1, 77)), jnp.int32)
    params = emb.init(jax.random.PRNGKey(0), tokens)
    out = emb.apply(params, tokens)
    assert out.shape == (1, 77, 512)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
