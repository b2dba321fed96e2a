#!/usr/bin/env python
"""Offline text-feature extraction for the AR baseline's conditioning dirs.

Parity targets: ``Codebook/generete_text_fea/generate_fea_clip.py`` (CLIP
ViT-B/32 512-d caption vectors -> one .txt per clip) and ``predict_one.py``
(BERT CLS 768-d vectors via the vendored pybert — here through transformers'
BertModel with locally available weights).

Usage:
  python tools/extract_text_features.py --mode clip --clip_ckpt ViT-B-32.pt \
      --captions caps.csv --outdir cls_token_512/
  python tools/extract_text_features.py --mode bert --bert_path ./bert-base-uncased \
      --captions caps.csv --outdir cls_token_768/
caps.csv rows: clip_name,caption
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["clip", "bert"], default="clip")
    p.add_argument("--captions", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--clip_ckpt", default=None,
                   help="released CLIP ViT-B/32 .pt for converted weights (else random)")
    p.add_argument("--bert_path", default="bert-base-uncased",
                   help="local transformers BertModel directory")
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    with open(args.captions) as f:
        rows = [(r[0], r[1]) for r in csv.reader(f) if len(r) >= 2]
    os.makedirs(args.outdir, exist_ok=True)

    if args.mode == "clip":
        feats = extract_clip(rows, args)
    else:
        feats = extract_bert(rows, args)
    for (name, _), vec in zip(rows, feats):
        np.savetxt(os.path.join(args.outdir, name + ".txt"), vec[None], fmt="%.8f")
    print(f"wrote {len(rows)} feature files to {args.outdir}")


def extract_clip(rows, args):
    import jax
    import jax.numpy as jnp

    from text_to_sound_synthesis_tpu.models.clip import CLIPTextEmbedding, Tokenize

    # EOT-projected 512-d vector (generate_fea_clip.py uses model.encode_text)
    emb = CLIPTextEmbedding(normalize=True, pick_last_embedding=True, embed_dim=512)
    codec = Tokenize(context_length=77)
    params = emb.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    if args.clip_ckpt:
        from text_to_sound_synthesis_tpu.convert.torch_to_jax import (
            convert_clip_text,
            load_torch_state_dict,
        )

        params = convert_clip_text(load_torch_state_dict(args.clip_ckpt), params)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        print("WARNING: random CLIP weights (pass --clip_ckpt)", file=sys.stderr)

    run = jax.jit(lambda p, t: emb.apply(p, t))
    out = []
    for i in range(0, len(rows), args.batch):
        caps = [c for _, c in rows[i : i + args.batch]]
        toks = jnp.asarray(codec.get_tokens(caps)["token"])
        out.append(np.asarray(run(params, toks)))
    return np.concatenate(out)


def extract_bert(rows, args):
    import torch
    from transformers import BertModel, BertTokenizer

    tok = BertTokenizer.from_pretrained(args.bert_path)
    model = BertModel.from_pretrained(args.bert_path).eval()
    out = []
    with torch.no_grad():
        for i in range(0, len(rows), args.batch):
            caps = [c for _, c in rows[i : i + args.batch]]
            enc = tok(caps, padding=True, truncation=True, max_length=64,
                      return_tensors="pt")
            hidden = model(**enc).last_hidden_state  # (B, L, 768)
            out.append(hidden[:, 0].numpy())          # CLS vectors
    return np.concatenate(out)


if __name__ == "__main__":
    main()
