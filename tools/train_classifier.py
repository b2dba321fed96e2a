#!/usr/bin/env python
"""Train the mel classifiers that power evaluation & the perceptual loss.

Parity targets: ``Codebook/specvqgan/modules/losses/vggishish/train_vggishish.py``
(VGGishish on VGGSound — the LPAPS feature net), ``train_melception.py``
(Melception — the FID/ISc/KID/KL feature extractor), ``train_vggish_audioset.py``
(the AudioSet variant) — unified under one CLI with ``--arch``.

Data: SpecsDataset layout (``<class>/<vid>`` split txt + class-wildcard mel
dirs), standardized with train-set per-bin mean/std stats.

Usage:
  python tools/train_classifier.py --arch vggishish --spec_dir 'feats/*/melspec_10s_22050hz' \
      --split_dir splits/ --stats means_stds.txt --num_classes 309 --out OUTPUT
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=["vggishish", "melception"], default="vggishish")
    p.add_argument("--spec_dir", required=True)
    p.add_argument("--split_path", default=None)
    p.add_argument("--stats", default=None, help="per-bin mean/std txt ([0,1] domain)")
    p.add_argument("--num_classes", type=int, default=309)
    p.add_argument("--mel_num", type=int, default=80)
    p.add_argument("--crop_len", type=int, default=848)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--weighted_ce", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="inverse-frequency class weights (--no-weighted_ce "
                        "to disable)")
    p.add_argument("--conv_layers", default=None,
                   help="vggishish conv stack override, comma list of widths "
                        "and MP tokens (e.g. '8,MP,16') — small-geometry runs")
    p.add_argument("--out", default="OUTPUT")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from text_to_sound_synthesis_tpu.data.datasets import SpecsDataset
    from text_to_sound_synthesis_tpu.data.loader import ShardedLoader
    from text_to_sound_synthesis_tpu.engine.checkpoint import save_checkpoint
    from text_to_sound_synthesis_tpu.engine.classifier_solver import (
        ClassifierTrainState,
        classification_metrics,
        make_classifier_train_step,
    )
    from text_to_sound_synthesis_tpu.engine.logger import Logger

    logger = Logger(args.out, args.arch)

    train_ds = SpecsDataset("train", args.spec_dir, split_path=args.split_path,
                            mel_num=args.mel_num, spec_crop_len=args.crop_len,
                            random_crop=True)
    val_ds = SpecsDataset("valid", args.spec_dir, split_path=args.split_path,
                          mel_num=args.mel_num, spec_crop_len=args.crop_len)

    means = stds = None
    if args.stats:
        means, stds = np.loadtxt(args.stats, dtype=np.float32).T
        means, stds = 2 * means - 1, 2 * stds  # [0,1] stats -> [-1,1] domain

    if args.arch == "vggishish":
        from text_to_sound_synthesis_tpu.models.lpaps import VGGishish

        if args.conv_layers:
            layers = tuple(t if t == "MP" else int(t)
                           for t in args.conv_layers.split(","))
            model = VGGishish(num_classes=args.num_classes, conv_layers=layers)
        else:
            model = VGGishish(num_classes=args.num_classes)
    else:
        from text_to_sound_synthesis_tpu.models.melception import Melception

        model = Melception(num_classes=args.num_classes, features_list=("logits",))

    mel0 = jnp.zeros((1, args.mel_num, args.crop_len))
    variables = model.init(jax.random.PRNGKey(args.seed), mel0)

    weights = None
    if args.weighted_ce:
        counts = np.bincount([train_ds.label2target[r.split("/")[0]] for r in train_ds.rows],
                             minlength=args.num_classes).astype(np.float32)
        weights = jnp.asarray(counts.sum() / np.maximum(counts, 1.0))

    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    wrapped = _wrap_logits(model, args.arch)
    step = make_classifier_train_step(wrapped, tx, class_weights=weights)
    state = ClassifierTrainState.create(variables, tx)

    loader = ShardedLoader(train_ds, args.batch_size, seed=args.seed)
    best = 0.0
    for epoch in range(args.epochs):
        for batch in loader:
            mel = _standardize(batch["image"], means, stds)
            state, metrics = step(state, jnp.asarray(mel), jnp.asarray(batch["target"]))
            it = int(jax.device_get(state.step))
            if it % 100 == 0:
                logger.log_info(f"e{epoch} it{it} loss {float(metrics['loss']):.4f} "
                                f"acc {float(metrics['accuracy']):.3f}")
        # validation metrics
        logits, targets = [], []
        vloader = ShardedLoader(val_ds, args.batch_size, shuffle=False, drop_last=False)
        for batch in vloader:
            mel = _standardize(batch["image"], means, stds)
            out = wrapped.apply({k: v for k, v in state.variables.items()},
                                jnp.asarray(mel))
            logits.append(np.asarray(out))
            targets.append(np.asarray(batch["target"]))
        m = classification_metrics(np.concatenate(targets), np.concatenate(logits))
        logger.log_info(f"epoch {epoch} val: {m}")
        if m["accuracy_1"] > best:
            best = m["accuracy_1"]
            save_checkpoint(logger.ckpt_dir, "best", state.variables,
                            {"epoch": epoch, **m})
        save_checkpoint(logger.ckpt_dir, "last", state.variables, {"epoch": epoch})


def _standardize(image, means, stds):
    mel = np.asarray(image, np.float32)
    if mel.ndim == 4:
        mel = mel[:, 0]
    if means is not None:
        mel = (mel - means[None, :, None]) / stds[None, :, None]
    return mel


class _wrap_logits:
    """Adapter: Melception returns a feature dict; VGGishish returns logits."""

    def __init__(self, model, arch):
        self.model = model
        self.arch = arch

    def apply(self, variables, mel, **kw):
        out = self.model.apply(variables, mel, **kw)
        if self.arch == "melception":
            if isinstance(out, tuple):
                feats, mut = out
                return feats["logits"], mut
            return out["logits"]
        return out


if __name__ == "__main__":
    main()
