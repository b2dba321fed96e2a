#!/usr/bin/env python
"""Codebook visualizer: wav -> tokens -> reconstruction + bitrate report.

Parity target: ``Codebook/vis_codebook.py:17-60`` + the bitrate helper
(``feature_extraction/demo_utils.py:401``): encode a wav through the trained
codec, print the 5x53 token grid, decode back, report the codebook bitrate,
and (optionally) vocode the reconstruction.

Usage:
  python tools/vis_codebook.py --wav clip.wav --config configs/diffsound_audiocaps.yaml \
      --ckpt converted/vqgan [--vocoder vocoder_logs/] [--outdir vis/]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", required=True)
    p.add_argument("--config", default="configs/diffsound_audiocaps.yaml")
    p.add_argument("--ckpt", required=True, help="orbax VQModel tree or torch .ckpt")
    p.add_argument("--vocoder", default=None)
    p.add_argument("--outdir", default="vis")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.vqgan import VQModel
    from text_to_sound_synthesis_tpu.ops.signal import wav_to_mel_np
    from text_to_sound_synthesis_tpu.utils.config import load_yaml_config
    from text_to_sound_synthesis_tpu.utils.io import read_wav, write_wav

    cfg = load_yaml_config(args.config)
    mp = cfg["model"]["params"]
    ccfg = mp.get("content_codec_config", {"params": mp})["params"]
    codec = VQModel(ddconfig=ccfg["ddconfig"], n_embed=ccfg["n_embed"],
                    embed_dim=ccfg["embed_dim"])
    params = codec.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, ccfg["ddconfig"]["resolution"], 1)))
    if args.ckpt.endswith((".ckpt", ".pth", ".pt")):
        from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
            convert_vqgan,
            load_torch_state_dict,
        )

        params = convert_vqgan(load_torch_state_dict(args.ckpt), params)
    else:
        import orbax.checkpoint as ocp

        params = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt),
                                                  item=jax.device_get(params))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    wav, sr = read_wav(args.wav, 22050)
    length = 22050 * 10
    y = np.zeros(length, np.float32)
    y[: min(len(wav), length)] = wav[:length]
    spec = wav_to_mel_np(y)[:, :ccfg["ddconfig"]["resolution"]]  # (80, 848)
    mel = jnp.asarray(2 * spec - 1)[None, :, :, None]

    quant, vq = codec.apply(params, mel, method=codec.encode)
    tokens = np.asarray(vq.indices)[0]  # (5, 53)
    rec = np.asarray(codec.apply(params, quant, method=codec.decode))[0, :, :, 0]
    rec01 = np.clip((rec + 1) / 2, 0, 1)

    print("token grid (5 x 53):")
    for row in tokens:
        print(" ".join(f"{t:4d}" for t in row))

    # bitrate: tokens_per_second * log2(K) (demo_utils.calculate_codebook_bitrate)
    duration_s = spec.shape[1] * 256 / 22050
    bits = tokens.size * math.log2(ccfg["n_embed"])
    print(f"codebook bitrate: {bits / duration_s:.1f} bit/s "
          f"({tokens.size} tokens x log2({ccfg['n_embed']}) / {duration_s:.2f}s)")
    l1 = float(np.abs(rec01 - spec).mean())
    print(f"reconstruction L1: {l1:.5f}")

    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, "tokens.npy"), tokens)
    np.save(os.path.join(args.outdir, "reconstruction.npy"), rec01)
    if args.vocoder:
        from text_to_sound_synthesis_tpu.models.melgan.interface import load_vocoder

        voc = load_vocoder(args.vocoder)
        write_wav(os.path.join(args.outdir, "reconstruction.wav"), 22050,
                  voc(rec01[None])[0])
        write_wav(os.path.join(args.outdir, "original.wav"), 22050, y)


if __name__ == "__main__":
    main()
