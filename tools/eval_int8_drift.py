#!/usr/bin/env python
"""Quantify int8-serving drift end to end: FID/ISc between bf16-generated and
int8-generated sample sets, against the seed-to-seed noise floor.

The int8 engine (models/diffusion/int8_runtime.py) is gated numerically by
kernel-vs-oracle and logit-agreement tests; this tool closes the loop at the
DISTRIBUTION level, the same way the paper's metrics would see it:

  1. generate N clips with the bf16 path (seed A),
  2. generate N clips with the int8 engine (seed A'),
  3. generate N clips with the bf16 path again (seed B),
  4. extract Melception features for all three sets,
  5. report FID(bf16_A, int8) vs the floor FID(bf16_A, bf16_B).

int8 drift is acceptable when row 5's two numbers are comparable — the
quantization then moves the sample distribution no further than resampling
does. With no released checkpoint the tool runs on random weights (still a
valid relative comparison); pass --ckpt/--melception for the real gate.

Usage:
  python tools/eval_int8_drift.py --config_file configs/diffsound_audiocaps.yaml \
      [--ckpt converted/diffsound] [--melception converted/melception] \
      [--clips 64] [--batch 8] [--captions caps.txt]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_CAPTIONS = [
    "a dog barks in the distance", "rain falls on a tin roof",
    "a car engine starts and idles", "waves crash against the shore",
    "a crowd applauds loudly", "birds chirp in the morning",
    "a train passes blowing its horn", "thunder rumbles during a storm",
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--ckpt", default="random")
    p.add_argument("--melception", default=None,
                   help="converted melception orbax dir (default: random init)")
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--captions", default=None, help="txt file, one caption/line")
    p.add_argument("--sample_type", default="top0.85r")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--static", action="store_true",
                   help="calibrate static activation scales on the first "
                        "caption batch and evaluate the static-quant engine")
    p.add_argument("--w4", action="store_true",
                   help="nibble-packed W4A8 weight storage (round-5 serving "
                        "default candidate; coarser weight grid than int8)")
    p.add_argument("--train_steps", type=int, default=0,
                   help="briefly train the denoiser on synthetic batches "
                        "first (random init draws near-degenerate samples; "
                        "a few dozen optimizer steps give the weights "
                        "realistic statistics). Uses the bench_train recipe "
                        "(batch 20, AdamW) so the compile cache is shared.")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from generate import load_params  # tools/generate.py
    from text_to_sound_synthesis_tpu.evaluation.features import extract_features
    from text_to_sound_synthesis_tpu.evaluation.metrics import (
        calculate_fid,
        calculate_isc,
    )
    from text_to_sound_synthesis_tpu.models.diffsound import build_model
    from text_to_sound_synthesis_tpu.models.melception import Melception
    from text_to_sound_synthesis_tpu.utils.config import load_yaml_config

    # TPU only: cached CPU AOT artifacts can target another machine config
    # (SIGILL risk + per-load warnings, CLAUDE.md)
    if jax.default_backend() == "tpu":
        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        except Exception:
            pass

    model = build_model(load_yaml_config(args.config_file))
    params = load_params(model, args.ckpt, args.seed)

    if args.train_steps:
        # bench_train's exact recipe (same optimizer/batch -> shared compile)
        from text_to_sound_synthesis_tpu.engine.clip_grad import ClipGradNorm
        from text_to_sound_synthesis_tpu.engine.optimizers import build_optimizer
        from text_to_sound_synthesis_tpu.engine.train_state import (
            DiffusionTrainState,
            make_train_step,
        )

        rng = np.random.default_rng(args.seed)
        tx = build_optimizer({"target": "adamw",
                              "params": {"betas": (0.9, 0.96),
                                         "weight_decay": 0.045}}, 3e-6)
        step = make_train_step(model, tx, ClipGradNorm(0, 5000, 0.5),
                               ema_decay=0.99, ema_interval=25)
        frozen = {"codec": params["codec"], "cond": params["cond"]}
        state = DiffusionTrainState.create(params["diffusion"], tx,
                                           num_timesteps=model.diffusion.diffusion_step)
        batch = {
            "image": jnp.asarray(rng.standard_normal((20, 80, 848, 1)), jnp.float32),
            "condition_token": jnp.asarray(rng.integers(0, 49408, (20, 77)), jnp.int32),
        }
        t0 = time.time()
        for i in range(args.train_steps):
            state, _ = step(state, frozen, batch, jax.random.PRNGKey(1000 + i),
                            3e-6)
        params = dict(params, diffusion=state.params)
        print(f"trained {args.train_steps} steps in {time.time() - t0:.0f}s",
              file=sys.stderr)

    qp = model.quantize_for_serving(params, weight_bits=4 if args.w4 else 8)

    caps = DEFAULT_CAPTIONS
    if args.captions:
        with open(args.captions) as f:
            caps = [ln.strip() for ln in f if ln.strip()]

    if args.static:
        calib_caps = [caps[j % len(caps)] for j in range(args.batch)]
        calib_toks = jnp.asarray(model.text_to_tokens(calib_caps)["token"])
        t0 = time.time()
        qp = model.calibrate_serving_engine(
            params, qp, jax.random.PRNGKey(args.seed + 777), calib_toks,
            sample_type=args.sample_type)
        print(f"static calibration in {time.time() - t0:.0f}s", file=sys.stderr)

    # separate small jits (cond embed / sampler / decode) instead of one
    # monolithic generate: each compiles fast through the relay and the
    # sampler HLOs match the benchmark suite's cached executables
    from text_to_sound_synthesis_tpu.models.diffusion.int8_runtime import (
        sample_tokens_int8,
    )
    from text_to_sound_synthesis_tpu.models.diffusion.process import (
        sample_tokens_fused,
    )

    from text_to_sound_synthesis_tpu.models.diffsound import parse_sample_type

    # one parser for the whole flag (validates the head); the raw samplers
    # here only take a truncation ratio, so reject non-top-r heads up front
    _, skip_step, _ = parse_sample_type(args.sample_type)
    head = args.sample_type.split(",")[0]
    if not (head.startswith("top") and head.endswith("r")):
        raise SystemExit(f"drift eval supports top-r heads, got {head!r}")
    r = float(head[3:-1])
    sched = model.diffusion.schedule()

    embed = jax.jit(lambda params, toks: model.embed_condition(params, toks))

    @jax.jit
    def toks_bf16(params, key, cond_emb):
        return sample_tokens_fused(model.diffusion, params["diffusion"], key,
                                   cond_emb, truncation_r=r, skip_step=skip_step)

    @jax.jit
    def toks_int8(qp, key, cond_emb):
        return sample_tokens_int8(qp, sched, key, cond_emb, truncation_r=r,
                                  skip_step=skip_step)

    @jax.jit
    def decode(params, tokens):
        return model.decode_tokens(params, tokens)

    def sample_set(int8, seed):
        key = jax.random.PRNGKey(seed)
        specs = []
        i = 0
        while len(specs) < args.clips:
            batch_caps = [caps[(i + j) % len(caps)] for j in range(args.batch)]
            i += args.batch
            toks = jnp.asarray(model.text_to_tokens(batch_caps)["token"])
            cond_emb = embed(params, toks)
            key, k = jax.random.split(key)
            if int8:
                tokens = toks_int8(qp, k, cond_emb)
            else:
                tokens = toks_bf16(params, k, cond_emb)
            mel = np.asarray(decode(params, tokens))
            specs.extend((mel[j, :, :, 0] + 1.0) / 2.0 for j in range(mel.shape[0]))
        return specs[: args.clips]

    t0 = time.time()
    sets = {
        "bf16_a": sample_set(False, 100),
        "int8": sample_set(True, 200),
        "bf16_b": sample_set(False, 300),
    }
    print(f"generated 3x{args.clips} clips in {time.time() - t0:.0f}s",
          file=sys.stderr)

    mel_model = Melception(num_classes=309)
    spec0 = sets["bf16_a"][0]
    if args.melception:
        import orbax.checkpoint as ocp

        template = mel_model.init(jax.random.PRNGKey(0), jnp.asarray(spec0[None]))
        mparams = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.melception), item=jax.device_get(template))
        mparams = jax.tree_util.tree_map(jnp.asarray, mparams)
    else:
        mparams = mel_model.init(jax.random.PRNGKey(1), jnp.asarray(spec0[None]))
        print("WARNING: random Melception (relative comparison only)",
              file=sys.stderr)

    feats = {
        name: extract_features(
            mel_model, mparams,
            [(s, f"mem://{name}/{i}") for i, s in enumerate(specs)],
            batch_size=min(16, args.clips))
        for name, specs in sets.items()
    }

    out = {
        "clips_per_set": args.clips,
        "fid_bf16_vs_int8": calculate_fid(
            feats["bf16_a"]["2048"], feats["int8"]["2048"])["frechet_inception_distance"],
        "fid_bf16_seed_floor": calculate_fid(
            feats["bf16_a"]["2048"], feats["bf16_b"]["2048"])["frechet_inception_distance"],
        "isc_bf16": calculate_isc(feats["bf16_a"]["logits"],
                                  splits=2)["inception_score_mean"],
        "isc_int8": calculate_isc(feats["int8"]["logits"],
                                  splits=2)["inception_score_mean"],
    }
    out["drift_ratio"] = (out["fid_bf16_vs_int8"]
                          / max(out["fid_bf16_seed_floor"], 1e-9))
    print(json.dumps({k: float(f"{v:.3e}") if isinstance(v, float) else v
                      for k, v in out.items()}))
    return out


if __name__ == "__main__":
    main()
