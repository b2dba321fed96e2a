"""Released-checkpoint parity gate — PROXY edition.

The released artifacts (HF Dongchao/Diffsound ``.pth``, SpecVQGAN ``.ckpt``,
``best_netG.pt``, melception, lpaps) are NOT present in this zero-egress
environment, so the real-weight gate of VERDICT.md #1 cannot run literally.
This file builds the closest available proxy: a real reference-FORMAT
checkpoint file assembled from the reference's OWN torch modules at tiny
scale, saved with ``torch.save`` in the exact ``{'model': ..., 'ema': ...}``
layout the Stage-2 solver writes and ``generate_samples_batch.py:57-87``
loads. The file is then driven through OUR full product path:

  convert_diffsound_checkpoint (the tools/convert_checkpoints.py core)
    -> codec / cond / diffusion trees (EMA preferred for the transformer)
    -> forward parity vs the torch modules at every stage
    -> tools/generate.py CLI directly on the .pth
    -> evaluation metrics vs the reference's own metric code
       (Codebook/evaluation/metrics/{fid,kl}.py) on identical features.

When the real artifacts become available, point tools/convert_checkpoints.py
at them — every code path exercised here is the one that will run.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _add_ref_paths():
    for p in (f"{REF}/Codebook", f"{REF}/Diffsound"):
        if p not in sys.path:
            sys.path.append(p)


def _load_module_from_file(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# proxy geometry: everything consistent end to end ---------------------------
MEL_H, MEL_W = 4, 16          # tiny spec; codec downsamples once -> 2 x 8 grid
GRID_H, GRID_W = 2, 8
SEQ = GRID_H * GRID_W
N_EMBED = 10                  # codebook size -> K = 11 diffusion classes
CTX = 12                      # CLIP context length
WIDTH, HEADS, VOCAB = 8, 2, 49408
N_EMBD, N_HEAD, N_LAYER, T_STEPS = 16, 2, 1, 4

# ch=32: the reference's GroupNorm is hard-coded to 32 groups
DD = dict(double_z=False, z_channels=16, resolution=MEL_W, in_channels=1,
          out_ch=1, ch=32, ch_mult=[1, 2], num_res_blocks=1,
          attn_resolutions=[8], dropout=0.0)

MODEL_CFG = {
    "target": "text_to_sound_synthesis_tpu.models.Diffsound",
    "params": {
        "content_codec_config": {
            "target": "text_to_sound_synthesis_tpu.models.vqgan.VQModel",
            "params": {"embed_dim": 16, "n_embed": N_EMBED, "ddconfig": DD},
        },
        "first_stage_permuter_config": {
            "target": "text_to_sound_synthesis_tpu.ops.permuter.ColumnMajor",
            "params": {"H": GRID_H, "W": GRID_W},
        },
        "condition_codec_config": {
            "target": "text_to_sound_synthesis_tpu.models.clip.Tokenize",
            "params": {"context_length": CTX},
        },
        "diffusion_config": {
            "target": "text_to_sound_synthesis_tpu.models.diffusion.DiscreteDiffusion",
            "params": {
                "diffusion_step": T_STEPS,
                "transformer_config": {
                    "target": "text_to_sound_synthesis_tpu.models.diffusion.Text2SpecTransformer",
                    "params": dict(n_layer=N_LAYER, n_embd=N_EMBD, n_head=N_HEAD,
                                   content_seq_len=SEQ, condition_dim=WIDTH,
                                   content_spatial_size=(GRID_H, GRID_W),
                                   block_activate="GELU2"),
                },
                "condition_emb_config": {
                    "target": "text_to_sound_synthesis_tpu.models.clip.CLIPTextEmbedding",
                    "params": dict(num_embed=VOCAB, embed_dim=WIDTH, width=WIDTH,
                                   layers=1, heads=HEADS, context_length=CTX),
                },
                "content_emb_config": {
                    "target": "text_to_sound_synthesis_tpu.models.diffusion.ContentEmbedding",
                    "params": dict(num_embed=N_EMBED, embed_dim=N_EMBD,
                                   spatial_size=(GRID_H, GRID_W)),
                },
            },
        },
    },
}


def _has_bpe():
    from text_to_sound_synthesis_tpu.models.clip.tokenizer import find_default_bpe
    try:
        find_default_bpe()
        return True
    except FileNotFoundError:
        return False


@pytest.fixture(scope="module")
def proxy(tmp_path_factory):
    """Assemble the torch reference modules + the reference-format .pth."""
    _add_ref_paths()
    from specvqgan.modules.diffusionmodules.model import Decoder as TDecoder
    from specvqgan.modules.diffusionmodules.model import Encoder as TEncoder
    from specvqgan.modules.vqvae.quantize import VectorQuantizer as TQuant
    from sound_synthesis.modeling.transformers.transformer_utils import Block as TBlock

    clip_model = _load_module_from_file(
        "ref_clip_model_gate",
        f"{REF}/Diffsound/sound_synthesis/modeling/modules/clip/model.py")

    torch.manual_seed(11)
    tm = {}
    # -- content codec (SpecVQGAN VQModel layout: vqgan.py state dict) -------
    tm["enc"] = TEncoder(**DD).eval()
    tm["dec"] = TDecoder(**DD).eval()
    tm["quant"] = TQuant(N_EMBED, 16, beta=0.25).eval()
    tm["qconv"] = torch.nn.Conv2d(16, 16, 1)
    tm["pqconv"] = torch.nn.Conv2d(16, 16, 1)

    # -- CLIP text tower (clip_text_embedding.py attribute layout) -----------
    mask = torch.full((CTX, CTX), float("-inf")).triu(1)
    tm["clip_blocks"] = torch.nn.ModuleList(
        [clip_model.ResidualAttentionBlock(WIDTH, HEADS, mask)]).eval()
    tm["tok_emb"] = torch.nn.Embedding(VOCAB, WIDTH)
    tm["pos_emb"] = torch.nn.Parameter(torch.randn(CTX, WIDTH) * 0.01)
    tm["ln_final"] = torch.nn.LayerNorm(WIDTH)
    tm["text_proj"] = torch.nn.Parameter(torch.randn(WIDTH, WIDTH) * 0.1)

    # -- denoiser backbone: 'model' weights + a DISTINCT 'ema' copy ----------
    def make_backbone(seed):
        g = torch.Generator().manual_seed(seed)
        torch.manual_seed(seed)
        return dict(
            blocks=torch.nn.ModuleList([
                TBlock(condition_seq_len=CTX, n_embd=N_EMBD, n_head=N_HEAD,
                       seq_len=SEQ, attn_pdrop=0.0, resid_pdrop=0.0,
                       mlp_hidden_times=4, activate="GELU2",
                       attn_type="selfcross", condition_dim=WIDTH,
                       diffusion_step=T_STEPS,
                       timestep_type="adalayernorm", mlp_type="fc")
                for _ in range(N_LAYER)]).eval(),
            content_emb=torch.nn.Embedding(N_EMBED + 1, N_EMBD),
            h_emb=torch.nn.Embedding(GRID_H, N_EMBD),
            w_emb=torch.nn.Embedding(GRID_W, N_EMBD),
            ln_out=torch.nn.LayerNorm(N_EMBD),
            head=torch.nn.Linear(N_EMBD, N_EMBED),
        )

    tm["bb_model"] = make_backbone(21)
    tm["bb_ema"] = make_backbone(22)   # EMA weights differ on purpose

    # TRAIN the torch reference modules briefly (VERDICT #1: "a tiny torch
    # reference model trained in-repo, converted, and matched through the full
    # generate->evaluate path") — the converted weights are then optimizer
    # artifacts with realistic statistics, not init noise.
    g = torch.Generator().manual_seed(33)
    codec_params = (list(tm["enc"].parameters()) + list(tm["dec"].parameters())
                    + list(tm["quant"].parameters()) + list(tm["qconv"].parameters())
                    + list(tm["pqconv"].parameters()))
    opt_c = torch.optim.Adam(codec_params, lr=1e-3)
    for _ in range(8):  # stage-1 proxy: VQ reconstruction on random mels
        x = torch.randn(2, 1, MEL_H, MEL_W, generator=g)
        h = tm["qconv"](tm["enc"](x))
        zq, emb_loss, _ = tm["quant"](h)
        rec = tm["dec"](tm["pqconv"](zq))
        loss = torch.mean(torch.abs(rec - x)) + emb_loss
        opt_c.zero_grad(); loss.backward(); opt_c.step()
    for m in codec_params:  # freeze gradients state out of the snapshot
        m.grad = None

    def train_backbone(bb, seed):  # stage-2 proxy: CE to random targets
        gen2 = torch.Generator().manual_seed(seed)
        ps = list(bb["blocks"].parameters()) + list(bb["content_emb"].parameters()) \
            + list(bb["h_emb"].parameters()) + list(bb["w_emb"].parameters()) \
            + list(bb["ln_out"].parameters()) + list(bb["head"].parameters())
        opt = torch.optim.AdamW(ps, lr=3e-4)
        for _ in range(12):
            toks = torch.randint(0, N_EMBED + 1, (2, SEQ), generator=gen2)
            cond = torch.randn(2, CTX, WIDTH, generator=gen2)
            tt = torch.randint(0, T_STEPS, (2,), generator=gen2)
            emb = bb["content_emb"](toks)
            h_e = bb["h_emb"](torch.arange(GRID_H)).unsqueeze(1)
            w_e = bb["w_emb"](torch.arange(GRID_W)).unsqueeze(0)
            h = emb + (h_e + w_e).reshape(1, SEQ, N_EMBD)
            for blk in bb["blocks"]:
                h, _ = blk(h, cond, tt)
            logits = bb["head"](bb["ln_out"](h))
            target = torch.randint(0, N_EMBED, (2, SEQ), generator=gen2)
            loss = torch.nn.functional.cross_entropy(
                logits.reshape(-1, N_EMBED), target.reshape(-1))
            opt.zero_grad(); loss.backward(); opt.step()
        for m in ps:
            m.grad = None

    train_backbone(tm["bb_model"], 41)
    train_backbone(tm["bb_ema"], 42)

    # -- the checkpoint file, exactly as the Stage-2 solver writes it --------
    sd = {}
    for prefix, mod in [("content_codec.encoder", tm["enc"]),
                        ("content_codec.decoder", tm["dec"]),
                        ("content_codec.quantize", tm["quant"]),
                        ("content_codec.quant_conv", tm["qconv"]),
                        ("content_codec.post_quant_conv", tm["pqconv"])]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.clone()
    ce = "transformer.condition_emb"
    sd[f"{ce}.token_embedding.weight"] = tm["tok_emb"].weight.detach().clone()
    sd[f"{ce}.positional_embedding"] = tm["pos_emb"].detach().clone()
    sd[f"{ce}.ln_final.weight"] = tm["ln_final"].weight.detach().clone()
    sd[f"{ce}.ln_final.bias"] = tm["ln_final"].bias.detach().clone()
    sd[f"{ce}.text_projection"] = tm["text_proj"].detach().clone()
    for i, b in enumerate(tm["clip_blocks"]):
        for k, v in b.state_dict().items():
            sd[f"{ce}.transformer.resblocks.{i}.{k}"] = v.clone()

    def backbone_sd(bb, prefix):
        out = {}
        for i, b in enumerate(bb["blocks"]):
            for k, v in b.state_dict().items():
                out[f"{prefix}.blocks.{i}.{k}"] = v.clone()
        out[f"{prefix}.content_emb.emb.weight"] = bb["content_emb"].weight.detach().clone()
        out[f"{prefix}.content_emb.height_emb.weight"] = bb["h_emb"].weight.detach().clone()
        out[f"{prefix}.content_emb.width_emb.weight"] = bb["w_emb"].weight.detach().clone()
        out[f"{prefix}.to_logits.0.weight"] = bb["ln_out"].weight.detach().clone()
        out[f"{prefix}.to_logits.0.bias"] = bb["ln_out"].bias.detach().clone()
        out[f"{prefix}.to_logits.1.weight"] = bb["head"].weight.detach().clone()
        out[f"{prefix}.to_logits.1.bias"] = bb["head"].bias.detach().clone()
        return out

    sd.update(backbone_sd(tm["bb_model"], "transformer.transformer"))
    # EMA keys are DiffusionTransformer-relative (dalle_spec.py:68-69):
    # 'transformer.<backbone key>'
    ema = backbone_sd(tm["bb_ema"], "transformer")

    path = tmp_path_factory.mktemp("ckpt") / "proxy_diffsound.pth"
    torch.save({"model": sd, "ema": ema, "epoch": 3, "iteration": 77}, path)

    from text_to_sound_synthesis_tpu.models.diffsound import build_model

    model = build_model(MODEL_CFG) if _has_bpe() else None
    return tm, str(path), model


@pytest.fixture(scope="module")
def converted(proxy):
    tm, path, model = proxy
    if model is None:
        pytest.skip("BPE artifact unavailable")
    from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
        convert_diffsound_checkpoint,
    )

    template = model.init_params(jax.random.PRNGKey(0),
                                 mel_shape=(1, MEL_H, MEL_W, 1))
    params = convert_diffsound_checkpoint(path, model, template, prefer_ema=True)
    return tm, path, model, params


def test_codec_roundtrip_parity(converted, rng):
    """content_codec.* from the FILE: encode indices + decode parity."""
    tm, _, model, params = converted
    x = rng.standard_normal((2, MEL_H, MEL_W, 1)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        h = tm["qconv"](tm["enc"](xt))
        zq, _, (_, _, idx_t) = tm["quant"](h)
        rec_t = tm["dec"](tm["pqconv"](zq)).numpy()

    codec = model.codec
    xrec, vq = codec.apply(params["codec"], jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(vq.indices).ravel(),
                                  idx_t.numpy().ravel())
    np.testing.assert_allclose(np.asarray(xrec),
                               np.transpose(rec_t, (0, 2, 3, 1)), atol=2e-4)


def test_cond_tower_parity(converted, rng):
    """condition_emb.* from the FILE: encode_text parity incl. L2 normalize
    (clip_text_embedding.py:46-80, pick_last_embedding=False)."""
    tm, _, model, params = converted
    tokens = rng.integers(0, VOCAB, (2, CTX)).astype(np.int64)
    tokens[:, -1] = VOCAB - 1  # EOT-ish high id (argmax position)

    with torch.no_grad():
        x = tm["tok_emb"](torch.from_numpy(tokens)) + tm["pos_emb"]
        x = x.permute(1, 0, 2)
        for b in tm["clip_blocks"]:
            x = b(x)
        x = x.permute(1, 0, 2)
        x = tm["ln_final"](x)
        want = (x / x.norm(dim=-1, keepdim=True)).numpy()

    got = np.asarray(model.embed_condition(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_denoiser_logits_parity_ema_preferred(converted, rng):
    """transformer.* from the FILE: backbone logits match the EMA weights
    (generate_samples_batch.py:82-86 prefers EMA), not the raw model."""
    tm, _, model, params = converted

    tokens = rng.integers(0, N_EMBED + 1, (2, SEQ))
    cond = rng.standard_normal((2, CTX, WIDTH)).astype(np.float32)
    tstep = np.asarray([1, 3])

    def torch_logits(bb):
        with torch.no_grad():
            emb = bb["content_emb"](torch.from_numpy(tokens))
            h_e = bb["h_emb"](torch.arange(GRID_H)).unsqueeze(1)
            w_e = bb["w_emb"](torch.arange(GRID_W)).unsqueeze(0)
            pos = (h_e + w_e).reshape(1, SEQ, N_EMBD)
            h = emb + pos
            for b in bb["blocks"]:
                h, _ = b(h, torch.from_numpy(cond), torch.from_numpy(tstep))
            return bb["head"](bb["ln_out"](h)).numpy()

    got = np.asarray(model.diffusion.apply(
        params["diffusion"], jnp.asarray(tokens, jnp.int32), jnp.asarray(cond),
        jnp.asarray(tstep, jnp.int32), method=model.diffusion.backbone_logits))

    np.testing.assert_allclose(got, torch_logits(tm["bb_ema"]), atol=3e-5)
    # and it must NOT match the non-EMA weights
    assert np.abs(got - torch_logits(tm["bb_model"])).max() > 1e-3


@pytest.mark.slow
def test_generate_cli_on_proxy_pth(proxy, tmp_path, monkeypatch):
    """tools/generate.py runs straight off the reference-format .pth."""
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    import yaml

    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        return o

    _, path, _ = proxy
    cfg_path = tmp_path / "proxy.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": plain(MODEL_CFG)}, f)
    outdir = tmp_path / "samples"

    import generate as gen_cli

    monkeypatch.setattr(
        sys, "argv",
        ["generate.py", "--config_file", str(cfg_path), "--ckpt", path,
         "--caption", "a dog barks", "--outdir", str(outdir),
         "--replicate", "2", "--batch", "2", "--sample_type", "top0.85r"])
    gen_cli.main()

    files = sorted(os.listdir(outdir))
    assert files == ["caption0_sample_0.npy", "caption0_sample_1.npy"]
    spec = np.load(outdir / files[0])
    assert spec.shape == (MEL_H, MEL_W)
    assert np.isfinite(spec).all()


@pytest.mark.slow
def test_run_parity_gate_one_command(proxy, tmp_path, rng):
    """tools/run_parity_gate.py (VERDICT r2 #7): the whole convert ->
    roundtrip -> logit-parity -> generate -> metrics sequence as ONE command,
    here on the reference-FORMAT proxy .pth. When the released artifacts
    land, the identical invocation (plus --melception/--vocoder) is the
    real gate."""
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    import yaml

    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        return o

    _, path, _ = proxy
    cfg_path = tmp_path / "proxy.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": plain(MODEL_CFG)}, f)
    gt = tmp_path / "gt_mels"
    gt.mkdir()
    for i in range(3):
        np.save(gt / f"clip{i}_mel.npy",
                rng.random((MEL_H, MEL_W)).astype(np.float32))

    import run_parity_gate as gate

    out = tmp_path / "gate_out"
    # no --melception: the metrics step records SKIP (its machinery is
    # exercised by test_evaluate_cli_smoke + test_metric_parity_vs_reference_
    # code; compiling Inception on CPU here would dominate the suite)
    rc = gate.main(["--config_file", str(cfg_path), "--ckpt", path,
                    "--gt_mels", str(gt),
                    "--caption", "a dog barks", "--outdir", str(out),
                    "--replicate", "2", "--batch", "2",
                    "--num_classes", "9"])
    assert rc == 0

    report = (out / "PARITY_GATE.md").read_text()
    for step in ("convert", "roundtrip", "logit_parity", "generate", "metrics"):
        assert step in report
    assert "FAIL" not in report
    # the three torch-parity steps all measured real agreement
    assert report.count("PASS") >= 4
    assert "indices EXACT" in report
    assert len(list((out / "samples").glob("*.npy"))) == 2


def test_metric_parity_vs_reference_code(rng):
    """Our FID/KL == the reference's own metric code on identical features
    (Codebook/evaluation/metrics/{fid,kl}.py)."""
    _add_ref_paths()
    from evaluation.metrics.fid import calculate_fid as ref_fid
    from evaluation.metrics.kl import calculate_kl as ref_kl

    from text_to_sound_synthesis_tpu.evaluation.metrics import (
        calculate_fid,
        calculate_kl,
    )

    f1 = rng.standard_normal((64, 16)).astype(np.float64)
    f2 = (rng.standard_normal((48, 16)) + 0.3).astype(np.float64)
    want = ref_fid({"2048": torch.from_numpy(f1)}, {"2048": torch.from_numpy(f2)},
                   "2048")
    got = calculate_fid(f1, f2)
    np.testing.assert_allclose(got["frechet_inception_distance"],
                               want["frechet_inception_distance"], rtol=1e-6)

    # KL: 2 samples per clip in fakes, 1 real each; caps shared-key grouping
    names = [f"clip{i}" for i in range(8)]
    paths_fake = [f"/fake/{n}_sample_{j}.npy" for n in names for j in (0, 1)]
    paths_real = [f"/real/{n}_mel.npy" for n in names]
    l_fake = rng.standard_normal((len(paths_fake), 9)).astype(np.float64)
    l_real = rng.standard_normal((len(paths_real), 9)).astype(np.float64)
    want = ref_kl({"logits": torch.from_numpy(l_fake), "file_path_": paths_fake},
                  {"logits": torch.from_numpy(l_real), "file_path_": paths_real},
                  "logits", "caps")
    got = calculate_kl(l_fake, paths_fake, l_real, paths_real, "caps")
    np.testing.assert_allclose(got["kullback_leibler_divergence"],
                               want["kullback_leibler_divergence"], rtol=1e-5)


def test_run_parity_gate_real_mode_discovery(proxy, tmp_path, rng):
    """--real dry-verified on the proxy bundle (VERDICT r3 #7): artifacts
    placed under one root are auto-discovered via the manifest; a missing
    required artifact is a FAIL row and a non-zero exit, not a skip."""
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")
    import shutil

    import yaml

    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        return o

    _, path, _ = proxy
    cfg_path = tmp_path / "proxy.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": plain(MODEL_CFG)}, f)

    root = tmp_path / "artifacts"
    (root / "gt_mels").mkdir(parents=True)
    # 80-bin gt mels: the tiny codec is fully convolutional so the roundtrip
    # step still runs, and the (random-weight, SKIP-path) metrics step gets a
    # Melception probe geometry that compiles quickly on CPU — a (4, 16)
    # probe hangs XLA's Inception compile for tens of minutes
    for i in range(2):
        np.save(root / "gt_mels" / f"clip{i}_mel.npy",
                rng.random((80, 64)).astype(np.float32))
    shutil.copy(path, root / "diffsound_audiocaps_proxy.pth")
    with open(root / "audiocaps_val.csv", "w") as f:
        f.write("clip0,a dog barks\nclip1,rain falls\n")

    import run_parity_gate as gate

    # melception + vocoder absent -> discovery FAILs them, gate rc=1
    out = tmp_path / "gate_real_missing"
    rc = gate.main(["--real", str(root), "--config_file", str(cfg_path),
                    "--outdir", str(out)])
    assert rc == 1
    report = (out / "PARITY_GATE.md").read_text()
    assert "melception MISSING" in report
    assert "vocoder MISSING" in report
    assert "diffsound_ckpt" in report and "diffsound_audiocaps_proxy.pth" in report

    # explicit overrides satisfy the missing slots -> discovery passes and the
    # full gate runs on the discovered ckpt/csv/gt_mels
    import orbax.checkpoint as ocp

    from text_to_sound_synthesis_tpu.models.melgan import MelGANGenerator

    voc = tmp_path / "voc"
    voc.mkdir()
    with open(voc / "args.yml", "w") as f:
        yaml.safe_dump({"n_mel_channels": MEL_H, "ngf": 4,
                        "n_residual_layers": 1}, f)
    vgen = MelGANGenerator(input_size=MEL_H, ngf=4, n_residual_layers=1)
    vparams = vgen.init(jax.random.PRNGKey(0),
                        np.zeros((1, 10, MEL_H), np.float32))
    ocp.PyTreeCheckpointer().save(str(voc / "melgan_params"),
                                  jax.device_get(vparams))

    out2 = tmp_path / "gate_real_overridden"
    rc2 = gate.main(["--real", str(root), "--config_file", str(cfg_path),
                     "--melception", "random", "--vocoder", str(voc),
                     "--outdir", str(out2), "--replicate", "1", "--batch", "2",
                     "--num_classes", "9", "--limit", "2"])
    assert rc2 == 0
    report2 = (out2 / "PARITY_GATE.md").read_text()
    assert "artifact" in report2 and "gt_mels" in report2
    assert "FAIL" not in report2
    for step in ("convert", "roundtrip", "logit_parity", "generate"):
        assert step in report2
    # the generate step consumed the DISCOVERED csv (2 rows x replicate 1)
    assert len(list((out2 / "samples").glob("*.npy"))) == 2
