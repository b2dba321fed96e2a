#!/usr/bin/env python
"""Fidelity evaluation CLI: FID / ISc / KID / KL on Melception features.

Parity target: ``Codebook/evaluate.py`` (OmegaConf CLI ``key=value`` overrides;
config schema of ``evaluation/configs/eval_melception_caps.yaml``). Compares a
directory of generated ``.npy`` mels against ground-truth mels.

Usage:
  python tools/evaluate.py input1.path=samples/ input2.path=gt_mels/ \
      melception_ckpt=melception-21-05-10T09-28-40.pt \
      [stats=melception_means_stds.txt] [dataset=caps] [batch=16]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_cli(argv):
    cfg = {
        "config": None,
        "input1.path": None, "input2.path": None, "melception_ckpt": None,
        "stats": None, "dataset": "caps", "batch": 16, "num_classes": 309,
        "have_fid": True, "have_isc": True, "have_kid": True, "have_kl": True,
        "kid_subset_size": 1000,
    }

    def set_key(k, v):
        if k not in cfg:
            raise SystemExit(f"unknown key {k!r}; known: {sorted(cfg)}")
        cur = cfg[k]
        if isinstance(cur, bool) and isinstance(v, str):
            v = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int) and not isinstance(cur, bool) and isinstance(v, str):
            v = int(v)
        cfg[k] = v

    pairs = []
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got {arg!r}")
        pairs.append(arg.split("=", 1))
    # a config file (eval_melception_caps.yaml-style) seeds the defaults;
    # explicit CLI keys override it (reference: evaluate.py:27-44 CLI patching)
    for k, v in pairs:
        if k == "config":
            from text_to_sound_synthesis_tpu.utils.config import load_yaml_config
            for fk, fv in load_yaml_config(v).items():
                if fk != "config" and fv is not None:
                    set_key(fk, fv)
    for k, v in pairs:
        if k != "config":
            set_key(k, v)
    return cfg


def main():
    cfg = parse_cli(sys.argv[1:])
    if not cfg["input1.path"] or not cfg["input2.path"]:
        raise SystemExit("input1.path and input2.path are required")

    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.evaluation.features import evaluate_folders
    from text_to_sound_synthesis_tpu.models.melception import Melception

    model = Melception(num_classes=cfg["num_classes"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 848)))
    if cfg["melception_ckpt"]:
        from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
            convert_melception,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(cfg["melception_ckpt"], key="model")
        params = convert_melception(sd, params)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        print("WARNING: random Melception weights — metrics are NOT comparable",
              file=sys.stderr)

    means = stds = None
    if cfg["stats"]:
        means, stds = np.loadtxt(cfg["stats"], dtype=np.float32).T

    out = evaluate_folders(
        model, params, cfg["input1.path"], cfg["input2.path"],
        dataset_name=cfg["dataset"], batch_size=cfg["batch"], means=means, stds=stds,
        have_fid=cfg["have_fid"], have_isc=cfg["have_isc"],
        have_kid=cfg["have_kid"], have_kl=cfg["have_kl"],
        kid_subset_size=cfg["kid_subset_size"],
    )
    for k, v in out.items():
        print(f"{k}: {v:.6f}")


if __name__ == "__main__":
    main()
