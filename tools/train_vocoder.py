#!/usr/bin/env python
"""MelGAN vocoder training CLI.

Parity target: ``Diffsound/vocoder/scripts/train.py`` (flags: data_path with
train_files.txt/test_files.txt wav lists, seq_len 8192 random crops, ngf 32,
n_residual_layers 3, num_D 3, ndf 16, n_layers_D 4, lambda_feat 10, batch 16;
tracks best mel-reconstruction L1 -> ``best_netG``).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", required=True)
    p.add_argument("--data_path", required=True,
                   help="dir with train_files.txt (wav paths, one per line)")
    p.add_argument("--n_mel_channels", type=int, default=80)
    p.add_argument("--ngf", type=int, default=32)
    p.add_argument("--n_residual_layers", type=int, default=3)
    p.add_argument("--ndf", type=int, default=16)
    p.add_argument("--num_D", type=int, default=3)
    p.add_argument("--n_layers_D", type=int, default=4)
    p.add_argument("--downsamp_factor", type=int, default=4)
    p.add_argument("--lambda_feat", type=float, default=10.0)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seq_len", type=int, default=8192)
    p.add_argument("--epochs", type=int, default=3000)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--save_interval", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


class WavCropDataset:
    """Random fixed-length crops of listed wav files (mel2wav/dataset.py)."""

    def __init__(self, file_list: str, seq_len: int, sr: int = 22050):
        from text_to_sound_synthesis_tpu.utils.io import read_wav

        self._read = read_wav
        with open(file_list) as f:
            base = os.path.dirname(file_list)
            self.files = [os.path.join(base, line.strip()) for line in f if line.strip()]
        self.seq_len = seq_len
        self.sr = sr

    def __len__(self):
        return len(self.files)

    def sample_batch(self, rng: np.random.Generator, batch: int) -> np.ndarray:
        out = np.zeros((batch, self.seq_len), np.float32)
        for i in range(batch):
            y, _ = self._read(self.files[int(rng.integers(0, len(self.files)))], self.sr)
            if len(y) >= self.seq_len:
                s = int(rng.integers(0, len(y) - self.seq_len + 1))
                out[i] = y[s : s + self.seq_len]
            else:
                out[i, : len(y)] = y
        return out


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    import optax

    from text_to_sound_synthesis_tpu.engine.checkpoint import save_checkpoint
    from text_to_sound_synthesis_tpu.engine.logger import Logger
    from text_to_sound_synthesis_tpu.engine.vocoder_solver import (
        VocoderTrainState,
        make_vocoder_train_step,
        mel_for_vocoder,
    )
    from text_to_sound_synthesis_tpu.models.melgan import (
        MelGANDiscriminator,
        MelGANGenerator,
    )

    logger = Logger(args.save_path, "melgan")
    with open(os.path.join(logger.run_dir, "args.yml"), "w") as f:
        for k, v in vars(args).items():
            f.write(f"{k}: {v}\n")

    gen = MelGANGenerator(args.n_mel_channels, args.ngf, args.n_residual_layers)
    disc = MelGANDiscriminator(args.num_D, args.ndf, args.n_layers_D, args.downsamp_factor)

    rng = np.random.default_rng(args.seed)
    ds = WavCropDataset(os.path.join(args.data_path, "train_files.txt"), args.seq_len)
    wav0 = jnp.asarray(ds.sample_batch(rng, args.batch_size))
    mel0 = mel_for_vocoder(wav0)
    g_params = gen.init(jax.random.PRNGKey(args.seed), mel0)
    d_params = disc.init(jax.random.PRNGKey(args.seed + 1), wav0[..., None])

    tx = optax.adam(1e-4, b1=0.5, b2=0.9)
    step = make_vocoder_train_step(gen, disc, tx, tx, args.lambda_feat,
                                   args.n_layers_D, args.num_D)
    state = VocoderTrainState.create(g_params, d_params, tx, tx)

    best = float("inf")
    steps_per_epoch = max(1, len(ds) // args.batch_size)
    for epoch in range(args.epochs):
        for _ in range(steps_per_epoch):
            wav = jnp.asarray(ds.sample_batch(rng, args.batch_size))
            state, metrics = step(state, wav)
            it = int(jax.device_get(state.step))
            if it % args.log_interval == 0:
                msg = " ".join(f"{k} {float(v):.4f}" for k, v in metrics.items())
                logger.log_info(f"e{epoch} it{it} {msg}")
                for k, v in metrics.items():
                    logger.add_scalar(f"loss/{k}", float(v), it)
            if it % args.save_interval == 0:
                s_err = float(metrics["mel_reconstruction"])
                save_checkpoint(logger.ckpt_dir, "netG", state.g_params, {"step": it})
                if s_err < best:
                    best = s_err
                    save_checkpoint(logger.run_dir, "melgan_params", state.g_params,
                                    {"step": it, "mel_reconstruction": s_err})
                    logger.log_info(f"new best mel_reconstruction {s_err:.4f}")


if __name__ == "__main__":
    main()
