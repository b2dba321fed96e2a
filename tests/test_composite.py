"""Diffsound composite tests: config building (ours + reference YAML),
permuters, end-to-end tiny text->mel generation."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.models.diffsound import Diffsound, build_model, parse_sample_type
from text_to_sound_synthesis_tpu.ops import permuter as P
from text_to_sound_synthesis_tpu.utils.config import load_yaml_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _has_bpe():
    from text_to_sound_synthesis_tpu.models.clip.tokenizer import find_default_bpe
    try:
        find_default_bpe()
        return True
    except FileNotFoundError:
        return False


# ---------------------------------------------------------------------------
# permuters
# ---------------------------------------------------------------------------

def test_column_major_roundtrip(rng):
    p = P.ColumnMajor(5, 53)
    x = jnp.asarray(rng.integers(0, 256, (2, 265)), jnp.int32)
    y = p(x)
    back = p(y, reverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_column_major_order():
    # grid [[0,1,2],[3,4,5]] (H=2, W=3) -> time-major [0,3,1,4,2,5]
    p = P.ColumnMajor(2, 3)
    x = jnp.arange(6)[None, :]
    np.testing.assert_array_equal(np.asarray(p(x))[0], [0, 3, 1, 4, 2, 5])


def test_subsample_and_zcurve_roundtrip(rng):
    for cls, hw in [(P.Subsample, (4, 4)), (P.ZCurve, (4, 8))]:
        p = cls(*hw)
        x = jnp.asarray(rng.integers(0, 99, (1, hw[0] * hw[1])), jnp.int32)
        np.testing.assert_array_equal(np.asarray(p(p(x), reverse=True)), np.asarray(x))


def test_spiral_random_alternate_roundtrip(rng):
    for cls, hw in [
        (P.SpiralOut, (8, 8)),
        (P.SpiralIn, (8, 8)),
        (P.Random, (5, 53)),
        (P.AlternateParsing, (5, 53)),
    ]:
        p = cls(*hw)
        fwd = np.asarray(p.forward_idx)
        assert sorted(fwd.tolist()) == list(range(hw[0] * hw[1]))
        x = jnp.asarray(rng.integers(0, 99, (2, hw[0] * hw[1])), jnp.int32)
        np.testing.assert_array_equal(np.asarray(p(p(x), reverse=True)), np.asarray(x))


def test_alternate_parsing_order():
    # grid [[0,1,2],[3,4,5],[6,7,8]] -> snake [0,1,2,5,4,3,6,7,8]
    p = P.AlternateParsing(3, 3)
    np.testing.assert_array_equal(
        np.asarray(p.forward_idx), [0, 1, 2, 5, 4, 3, 6, 7, 8])


def test_spiral_out_starts_at_center():
    # 4x4: reference walk starts at (2,1)=9, ring-1 runs are length 1/1 then 2/2
    p = P.SpiralOut(4, 4)
    fwd = np.asarray(p.forward_idx)
    np.testing.assert_array_equal(fwd[:6], [9, 5, 6, 10, 14, 13])
    # SpiralIn is exactly the reversed path (permuter.py:226)
    np.testing.assert_array_equal(np.asarray(P.SpiralIn(4, 4).forward_idx), fwd[::-1])


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")
def test_permuter_order_parity_vs_reference():
    """Exact order parity vs the reference's own permuters (permuter.py:117-269)."""
    import sys
    torch = pytest.importorskip("torch")
    sys.path.append("/root/reference/Codebook")
    from specvqgan.modules.transformer.permuter import (
        SpiralOut as RSpiralOut, SpiralIn as RSpiralIn, Random as RRandom,
        AlternateParsing as RAlt, ZCurve as RZCurve, Subsample as RSub,
    )
    pairs = [
        (P.SpiralOut(8, 8), RSpiralOut(8, 8)),
        (P.SpiralIn(8, 8), RSpiralIn(8, 8)),
        (P.Random(5, 53), RRandom(5, 53)),
        (P.AlternateParsing(5, 53), RAlt(5, 53)),
        (P.ZCurve(4, 4), RZCurve(4, 4)),
        (P.Subsample(4, 4), RSub(4, 4)),
    ]
    for ours, ref in pairs:
        np.testing.assert_array_equal(
            np.asarray(ours.forward_idx), ref.forward_shuffle_idx.numpy(),
            err_msg=type(ours).__name__)


def test_parse_sample_type():
    fn, skip, q = parse_sample_type("top0.85r")
    assert fn is not None and skip == 0 and q == 0.0
    fn, skip, q = parse_sample_type("top0.85r,fast2")
    assert skip == 2
    fn, skip, q = parse_sample_type("top0.85r,q0.5")
    assert q == 0.5
    fn, skip, q = parse_sample_type("top100p")
    assert fn is not None
    with pytest.raises(ValueError):
        parse_sample_type("topXq")


# ---------------------------------------------------------------------------
# config -> model building
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not _has_bpe(), reason="BPE artifact unavailable")
def test_build_model_from_our_config():
    cfg = load_yaml_config(os.path.join(REPO, "configs", "diffsound_audiocaps.yaml"))
    model = build_model(cfg)
    assert isinstance(model, Diffsound)
    assert model.token_hw == (5, 53)
    assert model.diffusion.num_classes == 257
    assert model.diffusion.content_seq_len == 265


@pytest.mark.skipif(not _has_bpe(), reason="BPE artifact unavailable")
def test_build_model_from_reference_yaml():
    """The reference's own caps.yaml builds our TPU-native model via aliases."""
    path = "/root/reference/Diffsound/configs/caps.yaml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    model = build_model(load_yaml_config(path))
    assert isinstance(model, Diffsound)
    assert model.diffusion.num_classes == 257
    toks = model.text_to_tokens(["a dog barks"])
    assert toks["token"].shape == (1, 77)


# ---------------------------------------------------------------------------
# tiny end-to-end
# ---------------------------------------------------------------------------

TINY_MODEL_CFG = {
    "target": "text_to_sound_synthesis_tpu.models.Diffsound",
    "params": {
        "content_codec_config": {
            "target": "text_to_sound_synthesis_tpu.models.vqgan.VQModel",
            "params": {
                "embed_dim": 16, "n_embed": 10,
                "ddconfig": dict(double_z=False, z_channels=16, resolution=16,
                                 in_channels=1, out_ch=1, ch=8, ch_mult=[1, 2],
                                 num_res_blocks=1, attn_resolutions=[8], dropout=0.0),
            },
        },
        "first_stage_permuter_config": {
            "target": "text_to_sound_synthesis_tpu.ops.permuter.ColumnMajor",
            "params": {"H": 2, "W": 8},
        },
        "condition_codec_config": {
            "target": "text_to_sound_synthesis_tpu.models.clip.Tokenize",
            "params": {"context_length": 12},
        },
        "diffusion_config": {
            "target": "text_to_sound_synthesis_tpu.models.diffusion.DiscreteDiffusion",
            "params": {
                "diffusion_step": 4,
                "auxiliary_loss_weight": 5e-4,
                "transformer_config": {
                    "target": "text_to_sound_synthesis_tpu.models.diffusion.Text2SpecTransformer",
                    "params": dict(n_layer=1, n_embd=16, n_head=2, content_seq_len=16,
                                   condition_dim=8, content_spatial_size=(2, 8)),
                },
                "condition_emb_config": {
                    "target": "text_to_sound_synthesis_tpu.models.clip.CLIPTextEmbedding",
                    "params": dict(num_embed=49408, embed_dim=8, width=8, layers=1,
                                   heads=2, context_length=12),
                },
                "content_emb_config": {
                    "target": "text_to_sound_synthesis_tpu.models.diffusion.ContentEmbedding",
                    "params": dict(num_embed=10, embed_dim=16, spatial_size=(2, 8)),
                },
            },
        },
    },
}


@pytest.fixture(scope="module")
def tiny_diffsound():
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    return build_model(TINY_MODEL_CFG)


def test_tiny_diffsound_loss_and_generate(tiny_diffsound, rng):
    model = tiny_diffsound
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, mel_shape=(1, 4, 16, 1))

    toks = model.text_to_tokens(["a dog barks", "rain falls"])
    cond_tokens = jnp.asarray(toks["token"][:, :12])

    mel = jnp.asarray(rng.standard_normal((2, 4, 16, 1)).astype(np.float32))
    t = jnp.asarray([0, 2], jnp.int32)
    pt = jnp.full((2,), 0.25)
    out = model.loss(params, key, mel, cond_tokens, t, pt)
    assert np.isfinite(float(out.loss))

    gen = model.generate(params, key, cond_tokens, sample_type="top0.85r")
    assert gen.shape == (2, 4, 16, 1)

    rec = model.reconstruct(params, mel)
    assert rec.shape == mel.shape


@pytest.mark.slow
def test_sample_grid(tiny_diffsound, rng):
    """DALLE.sample-equivalent visualization grid over filter ratios."""
    model = tiny_diffsound
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, mel_shape=(1, 4, 16, 1))
    mel = jnp.asarray(rng.standard_normal((1, 4, 16, 1)).astype(np.float32))
    toks = jnp.asarray(model.text_to_tokens(["a dog barks"])["token"][:, :12])
    out = model.sample_grid(params, key, mel, toks, filter_ratios=(0.0, 0.5))
    assert set(out) == {"input_image", "reconstruction_image",
                        "cond1_cont1.0_fr0.0_image", "cond1_cont1.0_fr0.5_image"}
    for v in out.values():
        assert v.shape == mel.shape
