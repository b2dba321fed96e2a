#!/usr/bin/env python
"""Audiocaption-loss evaluation: caption generated audio, score vs references.

Parity target: ``Codebook/AudiocaptionLoss/eval.py`` — run the ACT captioner
over generated sample mels, compute BLEU/CIDEr/ROUGE (+METEOR-lite; SPICE
requires the coco-caption Java stack and is gated, see
evaluation/caption_metrics.py), and select the top-k samples per source clip
by a chosen metric (the reference uses SPICE; default here: CIDEr).

Usage:
  python tools/eval_captions.py --samples_dir samples/ --refs refs.csv \
      --ckpt act_params/ --vocab vocab.txt [--select_topk 2 --select_out best/]
refs.csv rows: clip_name,caption (multiple rows per clip allowed).
"""

import argparse
import csv
import os
import shutil
import sys
from collections import defaultdict
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples_dir", required=True, help="dir of <clip>_sample_<i>.npy mels")
    p.add_argument("--refs", required=True, help="csv of clip_name,caption")
    p.add_argument("--ckpt", required=True, help="orbax ACTCaptioner params")
    p.add_argument("--vocab", required=True, help="one word per line; ids = row index")
    p.add_argument("--beam", type=int, default=3)
    p.add_argument("--select_topk", type=int, default=0)
    p.add_argument("--select_out", default=None)
    p.add_argument("--select_metric", default="cider",
                   choices=["cider", "bleu_4", "rouge_l", "meteor", "spice"],
                   help="reference selects by SPICE (AudiocaptionLoss/eval.py:27-59); "
                        "'spice' here requires --spice_scores from an external "
                        "coco-caption Java run (not bundled)")
    p.add_argument("--spice_scores", default=None,
                   help="JSON {sample_filename: spice_score} computed externally; "
                        "enables --select_metric spice and the true SPIDEr")
    args = p.parse_args()
    if args.select_metric == "spice" and not args.spice_scores:
        p.error("--select_metric spice needs --spice_scores "
                "(external coco-caption Java run)")

    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.evaluation.caption_metrics import (
        caption_scores,
        tokenize_caption,
    )
    from text_to_sound_synthesis_tpu.models.captioner import ACTCaptioner, beam_decode

    with open(args.vocab) as f:
        vocab = [w.strip() for w in f]
    id2word = dict(enumerate(vocab))

    model = ACTCaptioner(ntoken=len(vocab))
    mel0 = jnp.zeros((1, 848, 80))
    params = model.init(jax.random.PRNGKey(0), mel0, jnp.zeros((1, 2), jnp.int32))
    import orbax.checkpoint as ocp

    params = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt),
                                              item=jax.device_get(params))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    refs = defaultdict(list)
    with open(args.refs) as f:
        for row in csv.reader(f):
            if len(row) >= 2:
                refs[row[0]].append(row[1])

    files = sorted(glob(os.path.join(args.samples_dir, "*.npy")))
    cands, ref_sets, clip_of, per_file = [], [], [], []
    for path in files:
        clip = os.path.basename(path).split("_sample_")[0]
        if clip not in refs:
            continue
        spec = np.load(path)  # (80, T) in [0, 1]
        mel = jnp.asarray(spec.T[None])  # (1, T, 80)
        toks = beam_decode(model, params, mel, beam_size=args.beam)[0]
        words = [id2word.get(int(t), "") for t in toks[1:] if int(t) != model.eos_id]
        cand = " ".join(w for w in words if w)
        cands.append(cand)
        ref_sets.append(refs[clip])
        clip_of.append(clip)
        per_file.append(path)

    spice_by_file = None
    if args.spice_scores:
        import json

        with open(args.spice_scores) as f:
            spice_by_file = json.load(f)

    scores = caption_scores(
        cands, ref_sets,
        spice_scores=[spice_by_file.get(os.path.basename(p), 0.0)
                      for p in per_file] if spice_by_file else None)
    for k, v in scores.items():
        print(f"{k}: {v:.4f}")

    if args.select_topk and args.select_out:
        from text_to_sound_synthesis_tpu.evaluation import caption_metrics as cm

        def score_one(path, cand, rs):
            if args.select_metric == "spice":
                return float(spice_by_file.get(os.path.basename(path), 0.0))
            ct = [tokenize_caption(cand)]
            rt = [[tokenize_caption(r) for r in rs]]
            return {"cider": lambda: cm.cider_d(ct, rt),
                    "bleu_4": lambda: cm.bleu(ct, rt)[3],
                    "rouge_l": lambda: cm.rouge_l(ct, rt),
                    "meteor": lambda: cm.meteor(ct, rt)}[args.select_metric]()

        os.makedirs(args.select_out, exist_ok=True)
        by_clip = defaultdict(list)
        for path, cand, rs in zip(per_file, cands, ref_sets):
            s = score_one(path, cand, rs)
            by_clip[os.path.basename(path).split("_sample_")[0]].append((s, path))
        for clip, entries in by_clip.items():
            entries.sort(reverse=True)
            for s, path in entries[: args.select_topk]:
                shutil.copy(path, os.path.join(args.select_out, os.path.basename(path)))
        print(f"selected top-{args.select_topk} per clip -> {args.select_out}")


if __name__ == "__main__":
    main()
