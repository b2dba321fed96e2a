#!/usr/bin/env python
"""Offline feature extraction: wav -> canonical mel .npy files.

Parity target: ``Codebook/feature_extraction/extract_mel_spectrogram.py``
(the 2022-12-06 bugfixed recipe: load at 22 050 Hz, pad/trim to ``--length``
samples, canonical TRANSFORMS chain, save ``<name>_mel.npy``).

Usage:
  python tools/prepare_data.py -i wavs/ -o features/train/melspec_10s_22050hz \
      [-l 220500] [-n 8]
"""

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def process_one(audio_path: str, save_dir: str, length: int) -> str:
    from text_to_sound_synthesis_tpu.ops.signal import wav_to_mel_np
    from text_to_sound_synthesis_tpu.utils.io import read_wav

    wav, _ = read_wav(audio_path, target_sr=22050)
    y = np.zeros(length, np.float32)
    y[: min(len(wav), length)] = wav[:length]
    mel = wav_to_mel_np(y)
    name = os.path.splitext(os.path.basename(audio_path))[0]
    out = os.path.join(save_dir, name + "_mel.npy")
    np.save(out, mel)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input_dir", required=True)
    p.add_argument("-o", "--output_dir", required=True)
    p.add_argument("-l", "--length", type=int, default=220500)
    p.add_argument("-n", "--num_worker", type=int, default=os.cpu_count())
    args = p.parse_args()

    paths = sorted(glob(os.path.join(args.input_dir, "**", "*.wav"), recursive=True))
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"{len(paths)} wavs -> {args.output_dir}")
    if args.num_worker and args.num_worker > 1:
        from multiprocessing import Pool
        from functools import partial

        with Pool(args.num_worker) as pool:
            for i, _ in enumerate(pool.imap_unordered(
                partial(process_one, save_dir=args.output_dir, length=args.length), paths
            )):
                if (i + 1) % 100 == 0:
                    print(f"{i + 1}/{len(paths)}")
    else:
        for i, path in enumerate(paths):
            process_one(path, args.output_dir, args.length)
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(paths)}")


if __name__ == "__main__":
    main()
