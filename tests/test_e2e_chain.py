"""One-command end-to-end CLI chain (VERDICT r4 #4).

The reference's documented workflow (``readme.md:21-43``,
``Codebook/readme.md:48-79``) is a pipeline of separate entry points handing
artifacts through the filesystem. This test drives OUR chain the same way, at
tiny geometry, with every handoff via the real paths/configs:

  synthetic wavs
    -> tools/prepare_data.py        (wav -> canonical mel .npy)
    -> tools/train_vqgan.py         (stage-1 codebook, orbax ckpt)
    -> tools/train_diffsound.py     (stage-2 CLI; codec loaded from the
                                     stage-1 ckpt via ckpt_path; --auto_resume
                                     and the dotlist opts remainder exercised)
    -> tools/generate.py            (samples from the Solver checkpoint,
                                     EMA-preferred like the reference)
    -> tools/evaluate.py            (Melception metrics gen vs ground truth)
    -> tools/eval_captions.py       (ACT caption metrics on the samples)

Any CLI-interface drift between tools now breaks loudly.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

# 80-bin mels (so the real Melception/ACT eval geometry works), 64-frame crop,
# 8x time-downsampling codec -> (10, 8) = 80 tokens
MEL_BINS = 80
CROP = 64
DDCONFIG = dict(double_z=False, z_channels=16, resolution=64, in_channels=1,
                out_ch=1, ch=8, ch_mult=[1, 2, 2, 4], num_res_blocks=1,
                attn_resolutions=[8], dropout=0.0)
N_EMBED = 10
TOKEN_HW = (10, 8)
CAPTIONS = ["a dog barks loudly", "rain falls on a roof",
            "an engine hums", "birds chirp in trees"]


def _diffsound_cfg(codec_ckpt, data_root):
    return {
        "model": {
            "target": "text_to_sound_synthesis_tpu.models.Diffsound",
            "params": {
                "content_codec_config": {
                    "target": "text_to_sound_synthesis_tpu.models.vqgan.VQModel",
                    "params": {"embed_dim": 16, "n_embed": N_EMBED,
                               "ddconfig": dict(DDCONFIG),
                               "ckpt_path": str(codec_ckpt)},
                },
                "first_stage_permuter_config": {
                    "target": "text_to_sound_synthesis_tpu.ops.permuter.ColumnMajor",
                    "params": {"H": TOKEN_HW[0], "W": TOKEN_HW[1]},
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
                            "params": dict(n_layer=1, n_embd=16, n_head=2,
                                           content_seq_len=80, condition_dim=8,
                                           content_spatial_size=list(TOKEN_HW)),
                        },
                        "condition_emb_config": {
                            "target": "text_to_sound_synthesis_tpu.models.clip.CLIPTextEmbedding",
                            "params": dict(num_embed=49408, embed_dim=8, width=8,
                                           layers=1, heads=2, context_length=12),
                        },
                        "content_emb_config": {
                            "target": "text_to_sound_synthesis_tpu.models.diffusion.ContentEmbedding",
                            "params": dict(num_embed=N_EMBED, embed_dim=16,
                                           spatial_size=list(TOKEN_HW)),
                        },
                    },
                },
            },
        },
        "dataloader": {
            "batch_size": 2,
            "train_datasets": [{
                "target": "text_to_sound_synthesis_tpu.data.CapsDataset",
                "params": {"data_root": str(data_root), "phase": "train",
                           "mel_num": MEL_BINS, "spec_crop_len": CROP},
            }],
            "validation_datasets": [{
                "target": "text_to_sound_synthesis_tpu.data.CapsDataset",
                "params": {"data_root": str(data_root), "phase": "val",
                           "mel_num": MEL_BINS, "spec_crop_len": CROP},
            }],
        },
        "solver": {
            "base_lr": 1e-3, "adjust_lr": "none", "max_epochs": 1,
            "save_epochs": 1, "validation_epochs": 1, "sample_iterations": 1000,
            "ema": {"decay": 0.9, "update_interval": 1},
            "clip_grad_norm": {
                "target": "text_to_sound_synthesis_tpu.engine.ClipGradNorm",
                "params": {"start_iteration": 0, "end_iteration": 100,
                           "max_norm": 0.5},
            },
            "optimizers_and_schedulers": [{
                "name": "none",
                "optimizer": {"target": "adamw", "params": {"weight_decay": 0.01}},
                "scheduler": {
                    "step_iteration": 1,
                    "target": "text_to_sound_synthesis_tpu.engine.ReduceLROnPlateauWithWarmup",
                    "params": {"factor": 0.5, "patience": 100, "min_lr": 1e-6,
                               "warmup_lr": 2e-3, "warmup": 2},
                },
            }],
        },
    }


@pytest.mark.slow
def test_cli_chain(tmp_path, monkeypatch, capsys):
    from tests.test_composite import _has_bpe
    if not _has_bpe():
        pytest.skip("BPE artifact unavailable")

    import yaml

    from text_to_sound_synthesis_tpu.utils.io import write_wav

    # ---- 0. synthetic wavs --------------------------------------------------
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(22050, dtype=np.float32) / 22050.0
    for i in range(len(CAPTIONS)):
        y = (0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        write_wav(str(wav_dir / f"clip{i}.wav"), 22050, y)

    # ---- 1. prepare_data: wav -> canonical mel .npy -------------------------
    import prepare_data as prep_cli

    root = tmp_path / "data"
    for phase in ("train", "val"):
        out = root / "features" / phase / "melspec_10s_22050hz"
        out.mkdir(parents=True)
        monkeypatch.setattr(sys, "argv", [
            "prepare_data.py", "-i", str(wav_dir), "-o", str(out),
            "-l", "22050", "-n", "1"])
        prep_cli.main()
        mels = sorted(os.listdir(out))
        assert mels == [f"clip{i}_mel.npy" for i in range(len(CAPTIONS))]
        m = np.load(out / mels[0])
        assert m.shape[0] == MEL_BINS and m.shape[1] >= CROP
        assert 0.0 <= m.min() and m.max() <= 1.0  # canonical [0,1] domain

    # caption manifests for stage 2 (CapsDataset layout)
    for phase in ("train", "val"):
        (root / phase).mkdir()
        names = [f"clip{i}" for i in range(len(CAPTIONS))]
        (root / phase / "filenames.txt").write_text("\n".join(names) + "\n")
        tdir = root / "text" / phase
        tdir.mkdir(parents=True)
        for n, c in zip(names, CAPTIONS):
            (tdir / f"{n}.txt").write_text(c + "\n")

    # stage-1 split files over the same mels (class = the wildcard component)
    split_base = tmp_path / "split"
    with open(f"{split_base}_train.txt", "w") as f:
        f.write("\n".join(f"train/clip{i}" for i in range(len(CAPTIONS))) + "\n")
    with open(f"{split_base}_valid.txt", "w") as f:
        f.write("\n".join(f"val/clip{i}" for i in range(len(CAPTIONS))) + "\n")

    # ---- 2. train_vqgan: stage-1 codebook -----------------------------------
    import train_vqgan as vq_cli

    spec_wildcard = str(root / "features" / "*" / "melspec_10s_22050hz")
    vq_cfg = {
        "model": {"base_learning_rate": 1e-4, "params": {
            "embed_dim": 16, "n_embed": N_EMBED, "ddconfig": dict(DDCONFIG),
            "lossconfig": {"params": {"disc_start": 100, "disc_in_channels": 1,
                                      "disc_num_layers": 2, "disc_ndf": 8,
                                      "perceptual_weight": 0.0}},
        }},
        "dataloader": {"batch_size": 2, "train_datasets": [{
            "target": "text_to_sound_synthesis_tpu.data.SpecsDataset",
            "params": {"split": "train", "spec_dir_path": spec_wildcard,
                       "split_path": f"{split_base}_train.txt",
                       "mel_num": MEL_BINS, "spec_crop_len": CROP}}],
            "validation_datasets": [{
            "target": "text_to_sound_synthesis_tpu.data.SpecsDataset",
            "params": {"split": "valid", "spec_dir_path": spec_wildcard,
                       "split_path": f"{split_base}_valid.txt",
                       "mel_num": MEL_BINS, "spec_crop_len": CROP}}],
        },
    }
    vq_cfg_path = tmp_path / "vqgan.yaml"
    with open(vq_cfg_path, "w") as f:
        yaml.safe_dump(vq_cfg, f)
    out1 = tmp_path / "out_vqgan"
    monkeypatch.setattr(sys, "argv", [
        "train_vqgan.py", "-b", str(vq_cfg_path), "--output", str(out1),
        "--max_steps", "2"])
    vq_cli.main()
    codec_ckpt = out1 / "vqgan" / "checkpoint" / "last"
    assert codec_ckpt.is_dir()

    # ---- 3. train_diffsound: stage-2 CLI over the stage-1 ckpt --------------
    import train_diffsound as ds_cli

    cfg = _diffsound_cfg(codec_ckpt, root)
    cfg_path = tmp_path / "diffsound.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out2 = tmp_path / "out_diffsound"
    monkeypatch.setattr(sys, "argv", [
        "train_diffsound.py", "--config_file", str(cfg_path),
        "--name", "run", "--output", str(out2), "--seed", "0"])
    ds_cli.main()
    ds_ckpt = out2 / "run" / "checkpoint" / "last"
    assert ds_ckpt.is_dir()

    # resume + dotlist opts remainder (train one more epoch)
    monkeypatch.setattr(sys, "argv", [
        "train_diffsound.py", "--config_file", str(cfg_path),
        "--name", "run", "--output", str(out2), "--seed", "0",
        "--auto_resume", "solver.max_epochs", "2"])
    ds_cli.main()

    # the trained codec weights were actually loaded (not random-init): the
    # frozen codec in the solver ckpt == the stage-1 checkpoint's ae_params
    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(str(ds_ckpt))
    vq_raw = ocp.PyTreeCheckpointer().restore(str(codec_ckpt))
    a = raw["frozen"]["codec"]["params"]["quantize"]["codebook"]
    b = vq_raw["state"]["ae_params"]["params"]["quantize"]["codebook"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ---- 4. generate from the Solver checkpoint ------------------------------
    # via the val csv, like the reference (generate_samples_batch.py:143-187):
    # sample names must match the ground-truth clip names for the KL grouping
    import generate as gen_cli

    val_csv = tmp_path / "val.csv"
    val_csv.write_text(f"clip0,{CAPTIONS[0]}\nclip1,{CAPTIONS[1]}\n")
    samples = tmp_path / "samples"
    monkeypatch.setattr(sys, "argv", [
        "generate.py", "--config_file", str(cfg_path), "--ckpt", str(ds_ckpt),
        "--csv", str(val_csv),
        "--outdir", str(samples), "--replicate", "2", "--batch", "2",
        "--sample_type", "top0.85r"])
    gen_cli.main()
    files = sorted(os.listdir(samples))
    assert files == ["clip0_sample_0.npy", "clip0_sample_1.npy",
                     "clip1_sample_0.npy", "clip1_sample_1.npy"]
    spec = np.load(samples / files[0])
    assert spec.shape == (MEL_BINS, CROP)
    assert np.isfinite(spec).all()

    # ---- 5. evaluate: Melception metrics gen vs ground truth ----------------
    import evaluate as eval_cli

    ref_dir = tmp_path / "gt"
    ref_dir.mkdir()
    src = root / "features" / "val" / "melspec_10s_22050hz"
    for i in range(len(CAPTIONS)):
        m = np.load(src / f"clip{i}_mel.npy")[:, :CROP]
        np.save(ref_dir / f"clip{i}_mel.npy", m.astype(np.float32))
    monkeypatch.setattr(sys, "argv", [
        "evaluate.py", f"input1.path={samples}", f"input2.path={ref_dir}",
        "num_classes=9", "batch=4", "have_kid=false", "have_fid=false"])
    eval_cli.main()

    # ---- 6. eval_captions: ACT caption metrics on the samples ---------------
    import json

    import jax

    import eval_captions as cap_cli
    from text_to_sound_synthesis_tpu.models.captioner import ACTCaptioner

    tiny = dict(nhid=16, nhead=2, nlayers=1, dim_feedforward=32,
                encoder_num_classes=12, encoder_depth=1, max_len=6,
                sos_id=0, eos_id=9)
    vocab = [f"w{i}" for i in range(20)]
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(vocab) + "\n")
    act = ACTCaptioner(ntoken=len(vocab), **tiny)
    act_params = act.init(jax.random.PRNGKey(0),
                          np.zeros((1, 848, 80), np.float32),
                          np.zeros((1, 2), np.int32))
    act_ckpt = tmp_path / "act_params"
    ocp.PyTreeCheckpointer().save(str(act_ckpt), jax.device_get(act_params))
    refs = tmp_path / "refs.csv"
    refs.write_text(f"clip0,{CAPTIONS[0]}\nclip1,{CAPTIONS[1]}\n")
    monkeypatch.setattr(sys, "argv", [
        "eval_captions.py", "--samples_dir", str(samples), "--refs", str(refs),
        "--ckpt", str(act_ckpt), "--vocab", str(vocab_path), "--beam", "2",
        "--model_json", json.dumps(tiny)])
    capsys.readouterr()
    cap_cli.main()
    out = capsys.readouterr().out
    assert "cider" in out
