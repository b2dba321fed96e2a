"""Numerical parity: converted torch weights reproduce reference-module outputs.

These tests import the READ-ONLY reference implementation as an oracle (never
shipped): build a reference torch module with random weights, convert its
state_dict with our converter, and require matching outputs from the flax
module to float32 tolerance. This is the checkpoint-conversion guarantee of
SURVEY.md §7 phase 0/1.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _ref_available():
    import os
    return os.path.isdir(REF)


pytestmark = pytest.mark.skipif(not _ref_available(), reason="reference not mounted")


def _add_ref_paths():
    for p in (f"{REF}/Codebook", f"{REF}/Diffsound"):
        if p not in sys.path:
            sys.path.append(p)


# ---------------------------------------------------------------------------
# SpecVQGAN encoder/decoder/quantizer
# ---------------------------------------------------------------------------

SMALL_DD = dict(double_z=False, z_channels=16, resolution=32, in_channels=1,
                out_ch=1, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[16], dropout=0.0)


@pytest.fixture(scope="module")
def ref_vq_modules():
    _add_ref_paths()
    from specvqgan.modules.diffusionmodules.model import Decoder as TDecoder
    from specvqgan.modules.diffusionmodules.model import Encoder as TEncoder
    from specvqgan.modules.vqvae.quantize import VectorQuantizer as TQuant

    torch.manual_seed(0)
    enc = TEncoder(**SMALL_DD).eval()
    dec = TDecoder(**SMALL_DD).eval()
    quant = TQuant(8, 16, beta=0.25).eval()
    qconv = torch.nn.Conv2d(16, 16, 1)
    pqconv = torch.nn.Conv2d(16, 16, 1)
    return enc, dec, quant, qconv, pqconv


def test_vqmodel_conversion_parity(ref_vq_modules, rng):
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_vqgan
    from text_to_sound_synthesis_tpu.models.vqgan import VQModel

    enc, dec, quant, qconv, pqconv = ref_vq_modules
    sd = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec), ("quantize", quant),
                        ("quant_conv", qconv), ("post_quant_conv", pqconv)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()

    model = VQModel(ddconfig=SMALL_DD, n_embed=8, embed_dim=16)
    # NHWC: (freq=8, time=32); 'resolution' tracks the time axis
    x = rng.standard_normal((2, 8, 32, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_vqgan(sd, params)

    # reference pipeline in torch (vqgan.py:54-65)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        h = qconv(enc(xt))
        zq_t, _, (_, _, idx_t) = quant(h)
        rec_t = dec(pqconv(zq_t))

    xrec, vq = model.apply(params, jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(vq.indices).ravel(), idx_t.numpy().ravel()
    )
    np.testing.assert_allclose(
        np.asarray(xrec), np.transpose(rec_t.numpy(), (0, 2, 3, 1)), atol=2e-4
    )


# ---------------------------------------------------------------------------
# CLIP residual block + full text tower
# ---------------------------------------------------------------------------

def _load_module_from_file(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clip_text_tower_parity(rng):
    clip_model = _load_module_from_file(
        "ref_clip_model",
        f"{REF}/Diffsound/sound_synthesis/modeling/modules/clip/model.py",
    )
    TBlock = clip_model.ResidualAttentionBlock
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_clip_text
    from text_to_sound_synthesis_tpu.models.clip.text_model import CLIPTextEmbedding

    width, heads, layers, ctx, vocab = 32, 4, 2, 8, 50

    torch.manual_seed(1)
    L = ctx
    mask = torch.full((L, L), float("-inf")).triu(1)
    blocks = torch.nn.ModuleList([TBlock(width, heads, mask) for _ in range(layers)])
    tok_emb = torch.nn.Embedding(vocab, width)
    pos_emb = torch.nn.Parameter(torch.randn(ctx, width) * 0.01)
    ln_final = torch.nn.LayerNorm(width)

    sd = {"token_embedding.weight": tok_emb.weight.detach().numpy(),
          "positional_embedding": pos_emb.detach().numpy(),
          "ln_final.weight": ln_final.weight.detach().numpy(),
          "ln_final.bias": ln_final.bias.detach().numpy()}
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            sd[f"transformer.resblocks.{i}.{k}"] = v.numpy()

    ours = CLIPTextEmbedding(num_embed=vocab, width=width, layers=layers,
                             heads=heads, context_length=ctx, embed_dim=width,
                             normalize=False, pick_last_embedding=False)
    tokens = rng.integers(0, vocab, (2, ctx))
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(tokens, jnp.int32))
    params = convert_clip_text(sd, params)

    with torch.no_grad():
        x = tok_emb(torch.from_numpy(tokens)) + pos_emb
        x = x.permute(1, 0, 2)  # NLD -> LND
        for b in blocks:
            x = b(x)
        x = x.permute(1, 0, 2)
        want = ln_final(x).numpy()

    got = np.asarray(ours.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# MelGAN generator (weight-norm folding)
# ---------------------------------------------------------------------------

def _import_ref_melgan():
    # vocoder/modules.py imports librosa at module scope; stub the single
    # function it uses (the mel filterbank we re-implement ourselves).
    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(sr, n_fft, n_mels, fmin, fmax):  # positional signature used there
            from text_to_sound_synthesis_tpu.ops.signal import mel_filterbank
            return mel_filterbank(sr, n_fft, n_mels, fmin or 0.0, fmax)

        filters.mel = mel
        lib.filters = filters
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = filters
    _add_ref_paths()
    sys.path.append(f"{REF}/Diffsound")
    from vocoder.modules import Generator as TGen
    return TGen


def test_melgan_generator_parity(rng):
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
        convert_melgan_generator,
    )
    from text_to_sound_synthesis_tpu.models.melgan import MelGANGenerator

    TGen = _import_ref_melgan()
    torch.manual_seed(2)
    tg = TGen(input_size=20, ngf=4, n_residual_layers=1).eval()
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}

    ours = MelGANGenerator(input_size=20, ngf=4, n_residual_layers=1)
    mel = rng.standard_normal((1, 10, 20)).astype(np.float32)  # NWC
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    params = convert_melgan_generator(sd, params, n_residual_layers=1)

    with torch.no_grad():
        want = tg(torch.from_numpy(np.transpose(mel, (0, 2, 1)))).numpy()

    got = np.asarray(ours.apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5)


# ---------------------------------------------------------------------------
# Diffusion transformer block stack
# ---------------------------------------------------------------------------

def test_diffusion_backbone_parity(rng):
    _add_ref_paths()
    from sound_synthesis.modeling.transformers.transformer_utils import Block as TBlock
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_diffusion
    from text_to_sound_synthesis_tpu.models.diffusion import DiscreteDiffusion

    n_embd, n_head, L, S, D, T, n_layer = 32, 4, 12, 6, 16, 10, 2
    num_embed = 9

    torch.manual_seed(3)
    tblocks = torch.nn.ModuleList([
        TBlock(condition_seq_len=S, n_embd=n_embd, n_head=n_head, seq_len=L,
               attn_pdrop=0.0, resid_pdrop=0.0, mlp_hidden_times=4,
               activate="GELU2", attn_type="selfcross", condition_dim=D,
               diffusion_step=T, timestep_type="adalayernorm", mlp_type="fc")
        for _ in range(n_layer)
    ]).eval()
    t_content_emb = torch.nn.Embedding(num_embed + 1, n_embd)
    t_h_emb = torch.nn.Embedding(3, n_embd)
    t_w_emb = torch.nn.Embedding(4, n_embd)
    t_ln_out = torch.nn.LayerNorm(n_embd)
    t_head = torch.nn.Linear(n_embd, num_embed)

    sd = {"transformer.transformer.content_emb.emb.weight": t_content_emb.weight.detach().numpy(),
          "transformer.transformer.content_emb.height_emb.weight": t_h_emb.weight.detach().numpy(),
          "transformer.transformer.content_emb.width_emb.weight": t_w_emb.weight.detach().numpy(),
          "transformer.transformer.to_logits.0.weight": t_ln_out.weight.detach().numpy(),
          "transformer.transformer.to_logits.0.bias": t_ln_out.bias.detach().numpy(),
          "transformer.transformer.to_logits.1.weight": t_head.weight.detach().numpy(),
          "transformer.transformer.to_logits.1.bias": t_head.bias.detach().numpy()}
    for i, b in enumerate(tblocks):
        for k, v in b.state_dict().items():
            sd[f"transformer.transformer.blocks.{i}.{k}"] = v.numpy()

    model = DiscreteDiffusion(
        transformer_config={"params": dict(
            n_layer=n_layer, n_embd=n_embd, n_head=n_head, content_seq_len=L,
            condition_dim=D, content_spatial_size=(3, 4), block_activate="GELU2")},
        content_emb_config={"params": dict(num_embed=num_embed, embed_dim=n_embd,
                                           spatial_size=(3, 4))},
        diffusion_step=T,
    )
    tokens = rng.integers(0, num_embed + 1, (2, L))
    cond = rng.standard_normal((2, S, D)).astype(np.float32)
    tstep = np.asarray([1, 7])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens, jnp.int32),
                        jnp.asarray(cond), jnp.asarray(tstep, jnp.int32))
    params = convert_diffusion(sd, params)

    # reference forward (Text2ImageTransformer.forward minus the .cuda() call)
    with torch.no_grad():
        idx = torch.from_numpy(tokens)
        emb = t_content_emb(idx)
        h_e = t_h_emb(torch.arange(3)).unsqueeze(1)   # H x 1 x D
        w_e = t_w_emb(torch.arange(4)).unsqueeze(0)   # 1 x W x D
        pos = (h_e + w_e).reshape(1, 12, n_embd)
        emb = emb + pos
        tt = torch.from_numpy(tstep)
        for b in tblocks:
            emb, _ = b(emb, torch.from_numpy(cond), tt)
        want = t_head(t_ln_out(emb)).numpy()  # (B, L, C)

    got = np.asarray(model.apply(params, jnp.asarray(tokens, jnp.int32),
                                 jnp.asarray(cond), jnp.asarray(tstep, jnp.int32),
                                 method=model.backbone_logits))
    np.testing.assert_allclose(got, want, atol=3e-5)


# ---------------------------------------------------------------------------
# VGGishish (LPAPS feature net + classifier flatten permutation)
# ---------------------------------------------------------------------------

def test_vggishish_conversion_parity(rng):
    _add_ref_paths()
    from specvqgan.modules.losses.vggishish.model import VGGishish as TVGG
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_vggishish
    from text_to_sound_synthesis_tpu.models.lpaps import VGGishish

    conv_layers = [64, 64, 'MP', 128, 128, 'MP', 256, 256, 256, 'MP',
                   512, 512, 512, 'MP', 512, 512, 512]
    torch.manual_seed(4)
    tm = TVGG(conv_layers, use_bn=False, num_classes=5).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    ours = VGGishish(num_classes=5)
    x = rng.standard_normal((1, 80, 96)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_vggishish(sd, params)

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3)

    # feature taps match the torch slices numerically: compare relu5_3
    with torch.no_grad():
        feats_t = tm.features(torch.from_numpy(x).unsqueeze(1)).numpy()
    feats_j = ours.apply(params, jnp.asarray(x), return_features=True)
    np.testing.assert_allclose(
        np.asarray(feats_j[-1]).transpose(0, 3, 1, 2), feats_t, atol=1e-3
    )


# ---------------------------------------------------------------------------
# PatchGAN discriminator variants (discriminator/model.py:98,149,205)
# ---------------------------------------------------------------------------

def _disc_parity(ref_model, ours, x_torch, x_jax, atol=2e-5):
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(x_torch).numpy()
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_discriminator

    variables = ours.init(jax.random.PRNGKey(0), x_jax, train=False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_discriminator(sd, variables)
    got = np.asarray(ours.apply(variables, x_jax, train=False))
    assert got.shape[:1] == want.shape[:1]
    np.testing.assert_allclose(got.squeeze(), want.squeeze(), atol=atol)


def _randomize_bn(model, gen):
    """Give BatchNorms non-trivial affine + running stats so parity exercises
    the normalization, not just the convs."""
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=gen) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.2)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_discriminator_2d_conversion_parity(rng):
    _add_ref_paths()
    from specvqgan.modules.discriminator.model import NLayerDiscriminator as TDisc

    from text_to_sound_synthesis_tpu.models.discriminator import NLayerDiscriminator

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(0)
    ref = TDisc(input_nc=1, ndf=16, n_layers=3)
    _randomize_bn(ref, gen)
    x = rng.standard_normal((2, 1, 40, 64)).astype(np.float32)
    _disc_parity(ref, NLayerDiscriminator(input_nc=1, ndf=16, n_layers=3),
                 torch.from_numpy(x), jnp.asarray(np.transpose(x, (0, 2, 3, 1))))


def test_discriminator_1d_feats_conversion_parity(rng):
    _add_ref_paths()
    from specvqgan.modules.discriminator.model import (
        NLayerDiscriminator1dFeats as TDisc,
    )

    from text_to_sound_synthesis_tpu.models.discriminator import (
        NLayerDiscriminator1dFeats,
    )

    torch.manual_seed(1)
    gen = torch.Generator().manual_seed(1)
    ref = TDisc(input_nc=64, ndf=16, n_layers=3)
    _randomize_bn(ref, gen)
    x = rng.standard_normal((2, 64, 53)).astype(np.float32)  # (B, C=feat, L)
    _disc_parity(ref, NLayerDiscriminator1dFeats(input_nc=64, ndf=16, n_layers=3),
                 torch.from_numpy(x), jnp.asarray(np.transpose(x, (0, 2, 1))))


def test_discriminator_1d_specs_conversion_parity(rng):
    _add_ref_paths()
    from specvqgan.modules.discriminator.model import (
        NLayerDiscriminator1dSpecs as TDisc,
    )

    from text_to_sound_synthesis_tpu.models.discriminator import (
        NLayerDiscriminator1dSpecs,
    )

    torch.manual_seed(2)
    gen = torch.Generator().manual_seed(2)
    ref = TDisc(input_nc=80, ndf=16, n_layers=3)
    _randomize_bn(ref, gen)
    # reference forward takes (B, 1, C=80, L) and squeezes the 1-dim
    x = rng.standard_normal((2, 1, 80, 96)).astype(np.float32)
    _disc_parity(ref, NLayerDiscriminator1dSpecs(input_nc=80, ndf=16, n_layers=3),
                 torch.from_numpy(x),
                 jnp.asarray(np.transpose(x[:, 0], (0, 2, 1))))


# ---------------------------------------------------------------------------
# CLIP vision tower (model.py VisualTransformer:201-236)
# ---------------------------------------------------------------------------

def test_clip_vision_tower_parity(rng):
    clip_model = _load_module_from_file(
        "ref_clip_model_vis",
        f"{REF}/Diffsound/sound_synthesis/modeling/modules/clip/model.py",
    )
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_clip_vision
    from text_to_sound_synthesis_tpu.models.clip import ClipVisionEncoder

    res, patch, width, layers, heads, out_dim = 16, 8, 32, 2, 4, 24
    torch.manual_seed(5)
    tm = clip_model.VisualTransformer(
        input_resolution=res, patch_size=patch, width=width, layers=layers,
        heads=heads, output_dim=out_dim).eval()
    sd = {f"visual.{k}": v.numpy() for k, v in tm.state_dict().items()}

    ours = ClipVisionEncoder(input_resolution=res, patch_size=patch, width=width,
                             layers=layers, heads=heads, output_dim=out_dim)
    imgs = rng.standard_normal((2, res, res, 3)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    params = convert_clip_vision(sd, params)

    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(imgs)))
    # conv-stem accumulation-order noise: measured max delta 6.7e-5
    np.testing.assert_allclose(got, want, atol=2e-4)
