"""Melception feature extraction over sample directories.

Parity target: ``get_featuresdict`` + ``FakesFolder``
(``Codebook/evaluate.py:61-135``, ``Codebook/evaluation/datasets/fakes.py:28-76``):
scan a directory of generated ``.npy`` mels (or load the ground-truth dataset),
standardize with the train-set mel statistics, run Melception batched, gather
feature dicts (+ file paths for the KL grouping).

TPU-native: one jitted batched forward; multi-host extraction shards files by
``jax.process_index`` and gathers with ``multihost_utils`` (replacing the DDP
``DistributedSampler`` + ``all_gather_object`` path, evaluate.py:123-132).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.melception import Melception
from .metrics import calculate_fid, calculate_isc, calculate_kid, calculate_kl

__all__ = ["FakesFolder", "extract_features", "evaluate_folders"]


_FWD_CACHE: list = [None]  # (model, jitted forward) — most recent model only


def _jitted_forward(model):
    """One jitted Melception forward per model instance (params passed as an
    ARGUMENT, not baked in as jit constants): evaluate_folders calls
    extract_features twice and the reference-feature path repeatedly — a
    fresh @jax.jit per call recompiled the identical graph each time."""
    ent = _FWD_CACHE[0]
    if ent is not None and ent[0] is model:
        return ent[1]
    fn = jax.jit(lambda params, batch: model.apply(params, batch))
    _FWD_CACHE[0] = (model, fn)
    return fn


class FakesFolder:
    """Directory of generated ``*.npy`` mel files (values in [0,1] or [-1,1])."""

    def __init__(self, root: str, extension: str = ".npy", from_minus_one_one: bool = False):
        self.files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.endswith(extension)
        )
        if not self.files:
            raise FileNotFoundError(f"no {extension} files under {root}")
        self.from_minus_one_one = from_minus_one_one

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int):
        spec = np.load(self.files[i]).astype(np.float32)
        spec = np.squeeze(spec)
        if self.from_minus_one_one:
            spec = (spec + 1.0) / 2.0
        return spec, self.files[i]


def extract_features(
    model: Melception,
    params,
    folder,
    *,
    batch_size: int = 16,
    means: Optional[np.ndarray] = None,
    stds: Optional[np.ndarray] = None,
    crop_len: Optional[int] = None,
    multihost: bool = False,
) -> Dict[str, np.ndarray]:
    """Returns {'<tap>': (N, D) arrays, 'file_path_': [paths]}.

    ``multihost=True`` shards the file list across ``jax.process_count()`` hosts
    and gathers results (the DDP DistributedSampler + ``all_gather_object`` path
    of ``Codebook/evaluate.py:123-132``). No-op on a single host.
    """
    mean_v = np.asarray(means, np.float32).reshape(-1, 1) if means is not None else 0.0
    std_v = np.asarray(stds, np.float32).reshape(-1, 1) if stds is not None else 1.0
    params = jax.device_put(params)

    n = len(folder)
    indices = list(range(n))
    if multihost and jax.process_count() > 1:
        indices = indices[jax.process_index() :: jax.process_count()]

    forward = _jitted_forward(model)  # shared jit: one Melception compile
                                      # per process, params as an argument

    feats: Dict[str, List[np.ndarray]] = {}
    paths: List[str] = []
    for start in range(0, len(indices), batch_size):
        idx = indices[start : start + batch_size]
        specs, batch_paths = zip(*[folder[i] for i in idx])
        specs = [s[:, :crop_len] if crop_len else s for s in specs]
        batch = np.stack([(s - mean_v) / std_v for s in specs]).astype(np.float32)
        if len(batch) < batch_size:  # pad to static shape, drop afterwards
            pad = batch_size - len(batch)
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
        out = jax.device_get(forward(params, jnp.asarray(batch)))
        take = len(batch_paths)
        for k, v in out.items():
            feats.setdefault(k, []).append(np.asarray(v)[:take])
        paths.extend(batch_paths)
    result = {k: np.concatenate(v, axis=0) for k, v in feats.items()}
    result["file_path_"] = paths
    if multihost and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # process_allgather requires EQUAL shapes across hosts; the strided
        # shard gives host p ceil((n - p) / P) rows, so pad every array to
        # the max per-host count and drop the padding after the gather
        # (per-host valid counts are deterministic from n and P alone)
        P = jax.process_count()
        counts = [len(range(p, n, P)) for p in range(P)]
        m = max(counts)

        def pad(v):
            if len(v) == m:
                return v
            fill = np.zeros((m - len(v),) + v.shape[1:], v.dtype)
            return np.concatenate([v, fill], axis=0)

        gathered = {}
        for k, v in result.items():
            if k == "file_path_":
                continue
            g = np.asarray(multihost_utils.process_allgather(pad(v)))
            g = g.reshape((P, m) + v.shape[1:])
            gathered[k] = np.concatenate(
                [g[p, :counts[p]] for p in range(P)], axis=0)
        # paths are strings: rebuild from the folder's deterministic ordering
        # (folder.files when available — indexing folder[i] would np.load
        # every file just to read back its path)
        files = getattr(folder, "files", None)
        path_of = (lambda i: files[i]) if files is not None \
            else (lambda i: folder[i][1])
        all_paths = []
        for p in range(P):
            all_paths.extend(path_of(i) for i in range(p, n, P))
        gathered["file_path_"] = all_paths
        return gathered
    return result


def evaluate_folders(
    model: Melception,
    params,
    generated_dir: str,
    reference_dir: str,
    *,
    dataset_name: str = "caps",
    batch_size: int = 16,
    means=None,
    stds=None,
    crop_len: Optional[int] = None,
    have_fid: bool = True,
    have_isc: bool = True,
    have_kid: bool = True,
    have_kl: bool = True,
    kid_subset_size: int = 1000,
    isc_splits: int = 10,
) -> Dict[str, float]:
    """The ``Codebook/evaluate.py`` pipeline over two sample directories."""
    f1 = extract_features(model, params, FakesFolder(generated_dir),
                          batch_size=batch_size, means=means, stds=stds, crop_len=crop_len)
    f2 = extract_features(model, params, FakesFolder(reference_dir),
                          batch_size=batch_size, means=means, stds=stds, crop_len=crop_len)
    out: Dict[str, float] = {}
    if have_kl:
        out.update(calculate_kl(f1["logits"], f1["file_path_"],
                                f2["logits"], f2["file_path_"], dataset_name))
    if have_isc:
        out.update(calculate_isc(f1["logits"], rng_seed=2020, samples_shuffle=True,
                                 splits=isc_splits))
    if have_fid:
        out.update(calculate_fid(f1["2048"], f2["2048"]))
    if have_kid:
        out.update(calculate_kid(f1["2048"], f2["2048"], subsets=100,
                                 subset_size=kid_subset_size))
    return out
