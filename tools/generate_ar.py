#!/usr/bin/env python
"""AR-baseline sampling CLI (text-feature-conditioned Net2Net GPT).

Parity target: ``Codebook/evaluation/generate_samples_caps.py`` (top-k=100
multinomial sampling of 265 tokens per sample, ``<vid>_sample_<i>.npy``/``.wav``
outputs) — with the KV-cached fused sampler instead of 265 full forwards.

Usage:
  python tools/generate_ar.py --config configs/ar_audiocaps.yaml \
      --ckpt net2net.ckpt --feats_dir cls_token_512/ --outdir samples_ar/ \
      [--vocoder vocoder_logs/] [--samples_per_video 10] [--top_k 100]
"""

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True, help="orbax dir with {'codec','gpt'}")
    p.add_argument("--feats_dir", required=True,
                   help="dir of per-clip text-feature .txt vectors (CLIP 512-d)")
    p.add_argument("--outdir", default="samples_ar")
    p.add_argument("--vocoder", default=None)
    p.add_argument("--samples_per_video", type=int, default=2)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    return run(p.parse_args())


def run(args):
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.gpt import Net2NetTransformer
    from text_to_sound_synthesis_tpu.utils.config import (
        instantiate_from_config,
        load_yaml_config,
    )
    from text_to_sound_synthesis_tpu.utils.io import write_wav

    cfg = load_yaml_config(args.config)
    model: Net2NetTransformer = instantiate_from_config(cfg["model"])
    # feature width from the config (512 for the CLIP-feature baseline) — the
    # init template must match the checkpoint's embedder, not a hardcoded 512
    fcfg = cfg["model"]["params"]["transformer_config"]["params"]
    feat_dim = int(fcfg["feat_embedding_config"]["params"]["in_channels"])

    import orbax.checkpoint as ocp

    template = model.init_params(jax.random.PRNGKey(args.seed),
                                 cond_shape=(1, feat_dim, 1))
    params = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt),
                                              item=jax.device_get(template))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    vocoder = None
    if args.vocoder:
        from text_to_sound_synthesis_tpu.models.melgan.interface import load_vocoder

        vocoder = load_vocoder(args.vocoder)

    # token grid: from the permuter when it carries a real shape (ColumnMajor
    # et al.); the default Identity permuter is shapeless (H=W=1), so fall
    # back to the codec's flagship 16x-downsampled latent (80/16, 848/16)
    hw = (model.permuter.H, model.permuter.W)
    if hw[0] * hw[1] <= 1:
        hw = (5, 53)
        print(f"[generate_ar] permuter has no grid shape; assuming {hw}",
              file=sys.stderr)
    feat_files = sorted(glob(os.path.join(args.feats_dir, "*.txt")))
    os.makedirs(args.outdir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    @jax.jit
    def sample(params, key, feats):
        return model.sample(params, key, feats, hw, top_k=args.top_k,
                            temperature=args.temperature)

    for start in range(0, len(feat_files), args.batch):
        chunk = feat_files[start : start + args.batch]
        feats = np.stack([
            np.loadtxt(f, dtype=np.float32).reshape(-1)[:feat_dim] for f in chunk
        ])[:, :, None]  # (B, feat_dim, 1)
        for s in range(args.samples_per_video):
            key, k = jax.random.split(key)
            mel = np.asarray(sample(params, k, jnp.asarray(feats)))
            spec = (mel[..., 0] + 1.0) / 2.0
            for i, f in enumerate(chunk):
                vid = os.path.splitext(os.path.basename(f))[0]
                base = os.path.join(args.outdir, f"{vid}_sample_{s}")
                np.save(base + ".npy", spec[i])
                if vocoder is not None:
                    write_wav(base + ".wav", 22050, vocoder(spec[i : i + 1])[0])
        print(f"[{start + len(chunk)}/{len(feat_files)}]")


if __name__ == "__main__":
    main()
