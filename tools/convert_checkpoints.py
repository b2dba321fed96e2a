#!/usr/bin/env python
"""Convert released reference artifacts (torch) to orbax param trees.

Artifacts (HF: Dongchao/Diffsound + SpecVQGAN releases, reference readme.md:3):
  * diffsound .pth      -> codec + clip + diffusion trees (EMA preferred)
  * SpecVQGAN .ckpt     -> VQModel tree
  * best_netG.pt        -> MelGAN generator tree (weight norm folded)
  * melception .pt      -> Melception tree (BN folded)
  * lin_vgg.pth (+vggishish, +mean/std txt) -> LPAPS tree

Usage examples:
  python tools/convert_checkpoints.py diffsound --ckpt diffsound_audiocaps.pth \
      --config configs/diffsound_audiocaps.yaml --out converted/diffsound
  python tools/convert_checkpoints.py vqgan --ckpt last.ckpt \
      --config configs/diffsound_audiocaps.yaml --out converted/vqgan
  python tools/convert_checkpoints.py melgan --ckpt vocoder_logs/ --out converted/melgan
  python tools/convert_checkpoints.py melception --ckpt melception.pt --out converted/melception
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save(out: str, tree) -> None:
    import jax
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(os.path.abspath(out), jax.device_get(tree), force=True)
    print(f"saved {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["diffsound", "vqgan", "melgan", "melception", "lpaps"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--config", default="configs/diffsound_audiocaps.yaml")
    p.add_argument("--out", required=True)
    p.add_argument("--vggishish", default=None, help="classifier ckpt for lpaps")
    p.add_argument("--stats", default=None, help="mean/std txt for lpaps scaling")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.convert import torch_to_jax as C
    from text_to_sound_synthesis_tpu.utils.config import load_yaml_config

    if args.kind == "diffsound":
        from text_to_sound_synthesis_tpu.models.diffsound import build_model

        model = build_model(load_yaml_config(args.config))
        # the .pth embeds the codec — skip the config's stage-1 restore
        template = model.init_params(jax.random.PRNGKey(0), load_codec=False)
        save(args.out, C.convert_diffsound_checkpoint(args.ckpt, model, template))
    elif args.kind == "vqgan":
        from text_to_sound_synthesis_tpu.models.vqgan import VQModel

        cfg = load_yaml_config(args.config)
        mp = cfg["model"]["params"]
        ccfg = mp.get("content_codec_config", {"params": mp}).get("params", mp)
        codec = VQModel(ddconfig=ccfg["ddconfig"], n_embed=ccfg["n_embed"],
                        embed_dim=ccfg["embed_dim"])
        params = codec.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 80, ccfg["ddconfig"]["resolution"], 1)))
        sd = C.load_torch_state_dict(args.ckpt)
        save(args.out, C.convert_vqgan(sd, params))
    elif args.kind == "melgan":
        from text_to_sound_synthesis_tpu.models.melgan.interface import load_vocoder

        voc = load_vocoder(args.ckpt)
        save(args.out, voc.params)
    elif args.kind == "melception":
        from text_to_sound_synthesis_tpu.models.melception import Melception

        model = Melception(num_classes=309)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 848)))
        sd = C.load_torch_state_dict(args.ckpt, key="model")
        save(args.out, C.convert_melception(sd, params))
    elif args.kind == "lpaps":
        import numpy as np

        from text_to_sound_synthesis_tpu.models.lpaps import LPAPS

        lp = LPAPS()
        x0 = jnp.zeros((1, 80, 848, 1))
        params = lp.init(jax.random.PRNGKey(0), x0, x0)
        vgg_sd = C.load_torch_state_dict(args.vggishish, key="model") if args.vggishish else None
        stats = np.loadtxt(args.stats, dtype=np.float32) if args.stats else None
        save(args.out, C.convert_lpaps(args.ckpt, params, vgg_sd=vgg_sd, stats=stats))


if __name__ == "__main__":
    main()
