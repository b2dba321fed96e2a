"""Numeric GAN train-step parity vs the reference's own torch code (VERDICT r3 #3).

Fixed seed, tiny geometry, identical converted init: run 3 optimizer steps of

* the reference ``VQLPAPSWithDiscriminator`` adversarial stage-1 step
  (``Codebook/specvqgan/modules/losses/vqperceptual.py:255``, adaptive weight
  ``:287-298``, orchestrated like ``VQModel.training_step`` /
  ``configure_optimizers``, ``vqgan.py:88-144``) against
  ``make_vqgan_train_step`` — per-step total/nll/g/d losses AND the adaptive
  discriminator weight must match;
* the reference MelGAN hinge + feature-matching step
  (``Diffsound/vocoder/scripts/train.py:144-176``) against
  ``make_vocoder_train_step`` — per-step D/G/feat losses must match.

The learning-based gates (test_vqgan_training / test_vocoder_learning) prove
the systems learn; these gates pin the step MATH trajectory, where silent
drift (optimizer wiring, stale-vs-fresh discriminator features, adaptive
weight scaling, warm-start boundary) would otherwise hide.

Torch-side notes:
* LPAPS normally downloads weights (``lpaps.py:33-47``); here its loaders are
  monkeypatched to random init + a synthetic mean/std file, and those SAME
  weights/stats are converted to our LPAPS — parity of math, not artifacts.
* MelGAN weight norm is removed on the torch side
  (``torch.nn.utils.remove_weight_norm``, what ``mel2wav/interface.py`` does
  for inference) so both frameworks train the plain conv weights; the
  reference's weight-norm reparameterization changes optimizer geometry and is
  folded at conversion by design (convert_melgan_generator).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]


def _add_ref_paths():
    for p in (f"{REF}/Codebook", f"{REF}/Diffsound"):
        if p not in sys.path:
            sys.path.append(p)


# ---------------------------------------------------------------------------
# Stage-1 VQGAN adversarial step
# ---------------------------------------------------------------------------

MEL_HW = (16, 16)          # freq >= 16 so the VGG16 slices survive 4 maxpools
DD = dict(double_z=False, z_channels=16, resolution=16, in_channels=1,
          out_ch=1, ch=32, ch_mult=[1, 2], num_res_blocks=1,
          attn_resolutions=[8], dropout=0.0)
N_EMBED, EMBED_DIM = 10, 16
DISC_NDF, DISC_LAYERS = 8, 2
LR = 1e-3


def _build_torch_vq(monkeypatch, tmp_path, rng):
    _add_ref_paths()
    import specvqgan.modules.losses.lpaps as RL
    from specvqgan.modules.diffusionmodules.model import Decoder as TDecoder
    from specvqgan.modules.diffusionmodules.model import Encoder as TEncoder
    from specvqgan.modules.losses.vqperceptual import VQLPAPSWithDiscriminator
    from specvqgan.modules.vqvae.quantize import VectorQuantizer as TQuant

    # offline LPAPS: synthetic per-bin stats + random (but shared) weights
    stats = np.stack([rng.uniform(0.3, 0.7, MEL_HW[0]),
                      rng.uniform(0.5, 1.5, MEL_HW[0])], axis=1).astype(np.float32)
    stats_path = tmp_path / "means_stds.txt"
    np.savetxt(stats_path, stats)
    monkeypatch.setattr(RL, "get_ckpt_path",
                        lambda name, root=None, check=False: str(stats_path))
    monkeypatch.setattr(
        RL.vggishish16, "vggishish16",
        lambda self, pretrained=True: RL.VGGishish(
            [64, 64, 'MP', 128, 128, 'MP', 256, 256, 256, 'MP',
             512, 512, 512, 'MP', 512, 512, 512],
            use_bn=False, num_classes=309),
    )
    monkeypatch.setattr(RL.LPAPS, "load_from_pretrained",
                        lambda self, name="lpaps": None)

    torch.manual_seed(0)
    enc = TEncoder(**DD)
    dec = TDecoder(**DD)
    quant = TQuant(N_EMBED, EMBED_DIM, beta=0.25)
    qconv = torch.nn.Conv2d(DD["z_channels"], EMBED_DIM, 1)
    pqconv = torch.nn.Conv2d(EMBED_DIM, DD["z_channels"], 1)
    loss = VQLPAPSWithDiscriminator(
        disc_start=2, codebook_weight=1.0, disc_in_channels=1,
        disc_num_layers=DISC_LAYERS, disc_ndf=DISC_NDF, disc_factor=1.0,
        disc_weight=0.8, perceptual_weight=1.0, use_actnorm=False,
        min_adapt_weight=0.0, max_adapt_weight=1e4)
    # constructed in train mode except LPAPS (.eval() in the loss ctor):
    # dropout off in the lin heads, discriminator BN on batch statistics —
    # never call .train() on the assembly (PL would; see module docstring)
    return enc, dec, quant, qconv, pqconv, loss, stats


def _torch_vq_forward(mods, x):
    enc, dec, quant, qconv, pqconv = mods
    h = qconv(enc(x))
    zq, qloss, _ = quant(h)
    return dec(pqconv(zq)), qloss


def test_vqgan_adversarial_step_parity(monkeypatch, tmp_path, rng):
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
        convert_discriminator,
        convert_lpaps,
        convert_vqgan,
    )
    from text_to_sound_synthesis_tpu.engine.vqgan_solver import (
        VQGANLossConfig,
        VQGANTrainState,
        build_gan_optimizer,
        make_vqgan_train_step,
    )
    from text_to_sound_synthesis_tpu.models.discriminator import NLayerDiscriminator
    from text_to_sound_synthesis_tpu.models.lpaps import LPAPS
    from text_to_sound_synthesis_tpu.models.vqgan import VQModel

    enc, dec, quant, qconv, pqconv, loss, stats = _build_torch_vq(
        monkeypatch, tmp_path, rng)
    ae_mods = (enc, dec, quant, qconv, pqconv)

    # ---- convert every torch weight to our trees ---------------------------
    sd = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec), ("quantize", quant),
                        ("quant_conv", qconv), ("post_quant_conv", pqconv)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()

    codec = VQModel(ddconfig=DD, n_embed=N_EMBED, embed_dim=EMBED_DIM)
    x0 = jnp.zeros((2, *MEL_HW, 1), jnp.float32)
    ae_params = convert_vqgan(sd, codec.init(jax.random.PRNGKey(0), x0))

    lp = LPAPS(n_mels=MEL_HW[0])
    lp_params = convert_lpaps(
        {k: v.detach().numpy() for k, v in loss.perceptual_loss.state_dict().items()},
        lp.init(jax.random.PRNGKey(1), x0, x0), stats=stats)

    disc = NLayerDiscriminator(input_nc=1, ndf=DISC_NDF, n_layers=DISC_LAYERS)
    disc_vars = convert_discriminator(
        {k: v.detach().numpy() for k, v in loss.discriminator.state_dict().items()},
        disc.init(jax.random.PRNGKey(2), x0), prefix="main.")

    # ---- optimizers (vqgan.py:133-144: Adam(0.5, 0.9) both) ----------------
    ae_tparams = [p for m in ae_mods for p in m.parameters()]
    opt_ae = torch.optim.Adam(ae_tparams, lr=LR, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(loss.discriminator.parameters(), lr=LR, betas=(0.5, 0.9))

    tx_ae = build_gan_optimizer(LR)
    tx_disc = build_gan_optimizer(LR)
    cfg = VQGANLossConfig(disc_start=2, disc_weight=0.8, perceptual_weight=1.0,
                          min_adapt_weight=0.0, max_adapt_weight=1e4)
    step = make_vqgan_train_step(codec, lp, disc, tx_ae, tx_disc, cfg, donate=False)
    state = VQGANTrainState.create(
        ae_params, jax.tree_util.tree_map(jnp.asarray, disc_vars), tx_ae, tx_disc)
    lp_params = jax.tree_util.tree_map(jnp.asarray, lp_params)

    batches = rng.uniform(-1, 1, (3, 2, *MEL_HW, 1)).astype(np.float32)

    for i in range(3):
        x_np = batches[i]
        xt = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))

        # torch: PL optimizer loop — idx 0 (AE), then idx 1 on a FRESH forward
        xrec, qloss = _torch_vq_forward(ae_mods, xt)
        aeloss, log0 = loss(qloss, xt, xrec, 0, global_step=i,
                            last_layer=dec.conv_out.weight)
        opt_ae.zero_grad(); aeloss.backward(); opt_ae.step()

        xrec2, qloss2 = _torch_vq_forward(ae_mods, xt)
        dloss, log1 = loss(qloss2, xt, xrec2, 1, global_step=i)
        opt_d.zero_grad(); dloss.backward(); opt_d.step()

        state, m = step(state, lp_params, jnp.asarray(x_np), LR)

        want = {
            "total_loss": float(aeloss), "nll_loss": float(log0["train/nll_loss"]),
            "g_loss": float(log0["train/g_loss"]),
            "d_weight": float(log0["train/d_weight"]),
            "quant_loss": float(log0["train/quant_loss"]),
            "disc_loss": float(dloss),
        }
        for k, w in want.items():
            got = float(m[k])
            assert got == pytest.approx(w, rel=2e-3, abs=2e-4), (
                f"step {i}: {k} ours={got} torch={w}")
        # warm-start boundary: disc engages exactly at disc_start=2
        assert float(m["disc_factor"]) == (0.0 if i < 2 else 1.0)

    # after 3 steps the updated decoder weights still agree leaf-for-leaf
    w_t = dec.conv_out.weight.detach().numpy()          # (out, in, kh, kw)
    w_j = np.asarray(state.ae_params["params"]["decoder"]["conv_out"]["kernel"])
    np.testing.assert_allclose(w_j, np.transpose(w_t, (2, 3, 1, 0)), atol=5e-4)


# ---------------------------------------------------------------------------
# MelGAN vocoder step
# ---------------------------------------------------------------------------

def _strip_weight_norm(module):
    for m in module.modules():
        try:
            torch.nn.utils.remove_weight_norm(m)
        except (ValueError, RuntimeError):
            pass


def test_melgan_train_step_parity(rng):
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
        convert_melgan_discriminator,
        convert_melgan_generator,
    )
    from text_to_sound_synthesis_tpu.engine.vocoder_solver import (
        VocoderTrainState,
        make_vocoder_train_step,
        mel_for_vocoder,
    )
    from text_to_sound_synthesis_tpu.models.melgan import (
        MelGANDiscriminator,
        MelGANGenerator,
    )

    _add_ref_paths()
    # vocoder/modules.py imports librosa at module top for Audio2Mel (unused
    # here); stub it — the image has no librosa (CLAUDE.md)
    if "librosa" not in sys.modules:
        import types

        fake = types.ModuleType("librosa")
        fake.filters = types.ModuleType("librosa.filters")

        def _no_librosa(*a, **k):
            raise RuntimeError("librosa stubbed out in tests")

        fake.filters.mel = _no_librosa
        sys.modules["librosa"] = fake
        sys.modules["librosa.filters"] = fake.filters
    from vocoder.modules import Discriminator as TDisc
    from vocoder.modules import Generator as TGen

    # geometry: channel counts must SATURATE at 1024 before the second-to-last
    # conv — the reference reuses a stale nf_prev there (modules.py:164-166)
    # and only builds at saturating widths (the production ndf=16/n_layers=4
    # hits 1024 twice); ndf=256/n_layers=2/df=4 is the smallest such config
    NUM_D, NDF, NL, DF = 2, 256, 2, 4
    NGF, NRES = 8, 1
    T = 1024  # 4 mel frames * 256 hop

    torch.manual_seed(0)
    netG = TGen(80, NGF, NRES)
    netD = TDisc(NUM_D, NDF, NL, DF)
    _strip_weight_norm(netG)
    _strip_weight_norm(netD)

    gen = MelGANGenerator(input_size=80, ngf=NGF, n_residual_layers=NRES)
    disc = MelGANDiscriminator(num_D=NUM_D, ndf=NDF, n_layers=NL,
                               downsampling_factor=DF)
    wav0 = jnp.zeros((2, T), jnp.float32)
    g_params = convert_melgan_generator(
        {k: v.detach().numpy() for k, v in netG.state_dict().items()},
        gen.init(jax.random.PRNGKey(0), mel_for_vocoder(wav0)),
        n_residual_layers=NRES)
    d_params = convert_melgan_discriminator(
        {k: v.detach().numpy() for k, v in netD.state_dict().items()},
        disc.init(jax.random.PRNGKey(1), wav0[..., None]))

    # Adam(1e-4, (0.5, 0.9)) — train.py:107-108
    optG = torch.optim.Adam(netG.parameters(), lr=1e-4, betas=(0.5, 0.9))
    optD = torch.optim.Adam(netD.parameters(), lr=1e-4, betas=(0.5, 0.9))
    tx_g = optax.adam(1e-4, b1=0.5, b2=0.9)
    tx_d = optax.adam(1e-4, b1=0.5, b2=0.9)
    step = make_vocoder_train_step(gen, disc, tx_g, tx_d, lambda_feat=10.0,
                                   n_layers_D=NL, num_D=NUM_D, donate=False)
    state = VocoderTrainState.create(
        jax.tree_util.tree_map(jnp.asarray, g_params),
        jax.tree_util.tree_map(jnp.asarray, d_params), tx_g, tx_d)

    wavs = (rng.uniform(-1, 1, (3, 2, T)) * 0.5).astype(np.float32)
    feat_wt = (4.0 / (NL + 1)) * (1.0 / NUM_D)

    for i in range(3):
        wav_np = wavs[i]
        # identical mel inputs by construction (wav->mel parity is pinned
        # separately in test_signal.py)
        s_t = torch.from_numpy(
            np.asarray(mel_for_vocoder(jnp.asarray(wav_np))).transpose(0, 2, 1))
        x_t = torch.from_numpy(wav_np[:, None, :])

        # ---- reference loop, train.py:144-176 ------------------------------
        x_pred_t = netG(s_t)
        D_fake_det = netD(x_pred_t.detach())
        D_real = netD(x_t)
        loss_D = sum(torch.nn.functional.relu(1 + s[-1]).mean() for s in D_fake_det)
        loss_D = loss_D + sum(torch.nn.functional.relu(1 - s[-1]).mean() for s in D_real)
        optD.zero_grad(); loss_D.backward(); optD.step()

        D_fake = netD(x_pred_t)
        loss_G = sum(-s[-1].mean() for s in D_fake)
        loss_feat = sum(
            feat_wt * torch.nn.functional.l1_loss(D_fake[k][j], D_real[k][j].detach())
            for k in range(NUM_D) for j in range(len(D_fake[k]) - 1))
        optG.zero_grad(); (loss_G + 10.0 * loss_feat).backward(); optG.step()

        state, m = step(state, jnp.asarray(wav_np))

        # tolerances ~3x measured cross-framework noise (rel 1.3e-4 / abs
        # 1.1e-3 / rel 6.9e-4 over 3 steps). loss_G needs an ABSOLUTE bound:
        # it is -E[D(fake)] right after a first Adam step, which moves each
        # weight by ~lr*sign(grad) — f32 noise flips near-zero-grad signs, an
        # ~1e-3 absolute wobble on a near-zero mean. The structural bug this
        # gate exists for (fresh- instead of stale-D feature-matching
        # targets, train.py:145,161-173) measures at rel 8.7e-3 on loss_feat
        # — 13x the noise floor, well outside the 3e-3 gate.
        assert float(m["loss_D"]) == pytest.approx(float(loss_D), rel=1e-3), i
        assert float(m["loss_G"]) == pytest.approx(float(loss_G), abs=5e-3), i
        assert float(m["loss_feat"]) == pytest.approx(float(loss_feat), rel=3e-3), i
