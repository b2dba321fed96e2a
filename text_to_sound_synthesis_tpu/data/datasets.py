"""Datasets: precomputed mel .npy files + caption manifests.

Parity targets: ``CapsDataset`` (``Diffsound/sound_synthesis/data/caps_dataset.py:21-77``)
and the ``AudiosetDataset`` family (``audioset_dataset.py``): filename manifest
(pickle or txt), per-clip caption txt (one caption per line, one chosen at
random per epoch), mel ``.npy`` load, crop to (80, 848), scale to [-1, 1].

Layout (configurable; defaults mirror the reference minus its hard-coded
cluster prefixes):
    <data_root>/<phase>/filenames.pickle         # list of clip names
    <data_root>/text/<phase>/<name>.txt          # one caption per line
    <mel_root or data_root/features>/<phase>/melspec_10s_22050hz/<name>_mel.npy
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

from ..utils.config import register
from .transforms import CropSpec, to_model_range

__all__ = ["CapsDataset", "AudiosetDataset", "ArrayDataset"]


class _MelCaptionDataset:
    """Shared implementation: name manifest + mel files + caption dict."""

    def __init__(
        self,
        data_root: str,
        phase: str = "train",
        mel_num: int = 80,
        spec_len: int = 860,
        spec_crop_len: int = 848,
        random_crop: bool = False,
        mel_root: Optional[str] = None,
        im_preprocessor_config=None,  # accepted for config parity (unused: it
        #                               was an ImageNet image augmenter no-op)
    ):
        self.data_root = data_root
        self.phase = phase
        self.crop = CropSpec([mel_num, spec_crop_len], random_crop)
        mel_phase = "train" if phase == "train" else "val"
        base = mel_root or os.path.join(data_root, "features")
        self.mel_dir = os.path.join(base, mel_phase, "melspec_10s_22050hz")
        self.names = self._load_names()
        self.captions = {n: self._load_captions(n) for n in self.names}

    def _load_names(self) -> List[str]:
        pkl = os.path.join(self.data_root, self.phase, "filenames.pickle")
        if os.path.exists(pkl):
            with open(pkl, "rb") as f:
                return list(pickle.load(f))
        txt = os.path.join(self.data_root, self.phase, "filenames.txt")
        with open(txt) as f:
            return [line.strip() for line in f if line.strip()]

    def _load_captions(self, name: str) -> List[str]:
        path = os.path.join(self.data_root, "text", self.phase, name + ".txt")
        with open(path) as f:
            caps = [line.rstrip("\n") for line in f if line.strip()]
        return caps or [""]

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        name = self.names[index]
        spec = np.load(os.path.join(self.mel_dir, name + "_mel.npy"))
        spec = self.crop(spec, rng)
        image = to_model_range(spec)[None, :, :].astype(np.float32)  # (1, H, W)
        caps = self.captions[name]
        caption = caps[int(rng.integers(0, len(caps)))].lower()
        return {"image": image, "text": caption}


@register(
    "text_to_sound_synthesis_tpu.data.CapsDataset",
    "sound_synthesis.data.caps_dataset.CapsDataset",
    "sound_synthesis.data.caps_dataset.CapsDatasetAll",
)
class CapsDataset(_MelCaptionDataset):
    """AudioCaps: ~5 captions per clip (train has 1, val/test have 5)."""


@register(
    "text_to_sound_synthesis_tpu.data.AudiosetDataset",
    "sound_synthesis.data.audioset_dataset.AudiosetDataset",
    "sound_synthesis.data.audioset_dataset.AudiosetDatasetTxt",
)
class AudiosetDataset(_MelCaptionDataset):
    """AudioSet pretraining set: label-derived masked captions in the same
    manifest layout (the reference's .pkl/.npz caption variants collapse to
    the txt form after preprocessing with tools/prepare_data.py)."""


class ArrayDataset:
    """In-memory dataset for tests/synthetic benchmarks."""

    def __init__(self, images: np.ndarray, texts: Sequence[str]):
        assert len(images) == len(texts)
        self.images = images
        self.texts = list(texts)

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, index: int, rng=None):
        return {"image": self.images[index], "text": self.texts[index]}
