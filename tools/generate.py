#!/usr/bin/env python
"""Text-to-sound generation CLI.

Parity target: ``Diffsound/evaluation/generate_samples_batch.py`` (class
``Diffsound:42-205``): read an AudioCaps-val CSV of (filename, caption), batch
captions, generate ``replicate`` samples each with ``top0.85r`` truncation
(optionally ``,fastN``), save the [0,1] mel as ``<name>_sample_<i>.npy`` and the
MelGAN-vocoded PCM_24 wav at 22 050 Hz. EMA weights preferred automatically by
the converter.

Usage:
  python tools/generate.py --config_file configs/diffsound_audiocaps.yaml \
      --ckpt diffsound_ckpt.pth --vocoder vocoder_logs_dir --csv val.csv \
      --outdir samples/ [--replicate 2] [--sample_type top0.85r] [--batch 5]
Or ad-hoc captions:
  python tools/generate.py ... --caption "a dog barks while rain falls"
Long-form (>10 s) clips — chunked generation with mel-domain cross-fade
(``Diffsound.generate_long``), vocoded end to end:
  python tools/generate.py ... --caption "rolling thunder" --duration 25 \
      --batch 1 [--int8]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--ckpt", required=True, help="converted orbax dir or torch .pth")
    p.add_argument("--vocoder", default=None, help="MelGAN logdir (args.yml + best_netG.pt)")
    p.add_argument("--griffin_lim", action="store_true",
                   help="Griffin-Lim fallback vocoder when no MelGAN is given")
    p.add_argument("--csv", default=None, help="AudioCaps val csv: rows of name,caption")
    p.add_argument("--caption", action="append", default=None)
    p.add_argument("--outdir", default="samples")
    p.add_argument("--replicate", type=int, default=2)
    p.add_argument("--sample_type", default="top0.85r")
    p.add_argument("--int8", action="store_true",
                   help="serve the denoiser through the int8 engine "
                        "(models/diffusion/int8_runtime) — ~1.7x faster on TPU")
    p.add_argument("--weight_bits", type=int, default=4, choices=[8, 4],
                   help="with --int8: weight storage width. 4 (default) = "
                        "nibble-packed W4A8, the fastest measured serving "
                        "config (docs/ROOFLINE.md round 5); 8 = plain int8")
    p.add_argument("--batch", type=int, default=5)
    p.add_argument("--duration", type=float, default=None,
                   help="target clip length in SECONDS; >~10 s engages "
                        "chunked long-form generation (Diffsound.generate_long:"
                        " overlapping segments cross-faded in the mel domain). "
                        "Each caption costs ceil(n_segments) sampler rows, so "
                        "lower --batch accordingly")
    p.add_argument("--duration_frames", type=int, default=None,
                   help="target length in mel FRAMES directly (overrides "
                        "--duration; 1 frame = 256/22050 s)")
    p.add_argument("--overlap_frames", type=int, default=160,
                   help="cross-fade overlap between long-form segments")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


# the canonical mel recipe (ops/signal.py CANONICAL): 22 050 Hz, hop 256
SAMPLE_RATE = 22050
HOP_LENGTH = 256


def load_params(model, ckpt, seed=0):
    import jax

    # any real checkpoint overwrites the whole tree, so only the bring-up
    # path wants the config's stage-1 codec restore (load_codec)
    template = model.init_params(jax.random.PRNGKey(seed),
                                 load_codec=(ckpt == "random"))
    if ckpt == "random":  # smoke-test / bring-up mode
        return template
    if ckpt.endswith((".pth", ".ckpt", ".pt")):
        from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
            convert_diffsound_checkpoint,
        )

        return convert_diffsound_checkpoint(ckpt, model, template, prefer_ema=True)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(ckpt)
    mtree = ckptr.metadata(path).item_metadata.tree
    if isinstance(mtree, dict) and "state" in mtree and "frozen" in mtree:
        # a Solver training checkpoint (engine/solver.py save layout):
        # EMA-preferred, like the reference's ckpt['ema'] preference
        # (generate_samples_batch.py:82-86). PARTIAL restore — the opt_state
        # (AdamW moments, ~2x the param bytes) is never read; on a serving
        # host that halves load time and peak RSS vs an item-less restore.
        want = {"state": {k: mtree["state"][k]
                          for k in ("params", "ema_params")
                          if k in mtree["state"]},
                "frozen": mtree["frozen"]}
        item = jax.tree_util.tree_map(lambda _: 0.0, want)
        raw = ckptr.restore(
            path, item=item, transforms={},
            restore_args=jax.tree_util.tree_map(lambda _: ocp.RestoreArgs(), item))
        st = raw["state"]
        diff = st.get("ema_params") if st.get("ema_params") is not None \
            else st["params"]
        raw = {"codec": raw["frozen"]["codec"], "cond": raw["frozen"]["cond"],
               "diffusion": diff}
    else:
        raw = ckptr.restore(path)
    # structural check vs the model's param template, then adopt
    jax.tree_util.tree_map(lambda a, b: None, jax.device_get(template), raw)
    return jax.tree_util.tree_map(jax.numpy.asarray, raw)


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.diffsound import build_model
    from text_to_sound_synthesis_tpu.utils.config import load_yaml_config
    from text_to_sound_synthesis_tpu.utils.io import write_wav

    model = build_model(load_yaml_config(args.config_file))
    params = load_params(model, args.ckpt, args.seed)

    vocoder = None
    if args.vocoder:
        from text_to_sound_synthesis_tpu.models.melgan.interface import load_vocoder

        vocoder = load_vocoder(args.vocoder)
    elif args.griffin_lim:
        from text_to_sound_synthesis_tpu.ops.signal import mel_to_wav_np

        # Griffin-Lim fallback (the reference's VocoderGriffinLim path,
        # Codebook/train.py:358-381) — audible but lower quality than MelGAN
        vocoder = lambda spec: np.stack([mel_to_wav_np(s) for s in spec])

    if args.csv:
        with open(args.csv) as f:
            rows = [(r[0], r[1]) for r in csv.reader(f) if len(r) >= 2]
    else:
        caps = args.caption or ["a dog barking"]
        rows = [(f"caption{i}", c) for i, c in enumerate(caps)]

    os.makedirs(args.outdir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    frames = args.duration_frames
    if frames is None and args.duration is not None:
        frames = int(round(args.duration * SAMPLE_RATE / HOP_LENGTH))

    # qp as a jit ARGUMENT, never a closure capture: captured arrays are
    # embedded as HLO constants and blow the remote-compile relay's
    # request-size cap at flagship size (HTTP 413 — CLAUDE.md; same fix as
    # tools/serve.py)
    qp = (jax.device_put(model.quantize_for_serving(
        params, weight_bits=args.weight_bits)) if args.int8 else None)

    if frames is not None:
        @jax.jit
        def run_long(params, qp, key, cond_tokens):
            return model.generate_long(params, key, cond_tokens,
                                       duration_frames=frames,
                                       overlap_frames=args.overlap_frames,
                                       sample_type=args.sample_type, qp=qp)

        run = lambda params, key, toks: run_long(params, qp, key, toks)  # noqa: E731
    elif args.int8:
        @jax.jit
        def run_int8(params, qp, key, cond_tokens):
            return model.generate_int8(params, qp, key, cond_tokens,
                                       sample_type=args.sample_type)

        run = lambda params, key, toks: run_int8(params, qp, key, toks)  # noqa: E731
    else:
        @jax.jit
        def run(params, key, cond_tokens):
            return model.generate(params, key, cond_tokens, sample_type=args.sample_type)

    for start in range(0, len(rows), args.batch):
        chunk = rows[start : start + args.batch]
        names = [n for n, _ in chunk for _ in range(args.replicate)]
        caps = [c for _, c in chunk for _ in range(args.replicate)]
        toks = jnp.asarray(model.text_to_tokens(caps)["token"])
        key, k = jax.random.split(key)
        mel = np.asarray(run(params, k, toks))  # (B, 80, 848, 1) in [-1, 1]
        spec = (mel[..., 0] + 1.0) / 2.0
        counters = {}
        for i, name in enumerate(names):
            idx = counters.get(name, 0)
            counters[name] = idx + 1
            base = os.path.join(args.outdir, f"{name}_sample_{idx}")
            np.save(base + ".npy", spec[i])
            if vocoder is not None:
                wav = vocoder(spec[i : i + 1])[0]
                write_wav(base + ".wav", SAMPLE_RATE, wav, subtype="PCM_24")
        print(f"[{start + len(chunk)}/{len(rows)}] wrote {len(names)} samples")


if __name__ == "__main__":
    main()
