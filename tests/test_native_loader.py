"""Native C++ batched .npy loader: bit-exact parity with the Python path.

The contract (native/npy_batch.cc): load+crop+scale must equal
np.load -> CropSpec -> to_model_range exactly, for f4 and f8 files, random and
centered crops, and the dataset-level load_batch must reproduce the per-item
__getitem__ stream rng-draw for rng-draw (loader.py batched fast path)."""

import os

import numpy as np
import pytest

from text_to_sound_synthesis_tpu.data.datasets import SpecsDataset, _MelCaptionDataset
from text_to_sound_synthesis_tpu.data.loader import ShardedLoader
from text_to_sound_synthesis_tpu.data.transforms import CropSpec, to_model_range
from text_to_sound_synthesis_tpu.native import (
    load_mel_batch,
    native_available,
    npy_shape,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture
def mel_files(tmp_path, rng):
    paths, arrays = [], []
    for i, (shape, dt) in enumerate([((80, 120), np.float32),
                                     ((96, 140), np.float64),
                                     ((80, 100), np.float32)]):
        a = rng.random(shape).astype(dt)
        p = str(tmp_path / f"m{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def test_npy_shape_probe(mel_files):
    paths, arrays = mel_files
    for p, a in zip(paths, arrays):
        assert npy_shape(p) == a.shape


def test_batch_exact_vs_numpy(mel_files):
    paths, arrays = mel_files
    tops, lefts = [0, 7, -1], [3, 11, -1]
    out = load_mel_batch(paths, 64, 96, tops, lefts)
    assert out.shape == (3, 64, 96) and out.dtype == np.float32
    for i, a in enumerate(arrays):
        t = tops[i] if tops[i] >= 0 else (a.shape[0] - 64) // 2
        l = lefts[i] if lefts[i] >= 0 else (a.shape[1] - 96) // 2
        ref = to_model_range(a[t : t + 64, l : l + 96]).astype(np.float32)
        assert np.array_equal(out[i], ref), f"item {i} mismatch"


def test_batch_no_scaling(mel_files):
    paths, arrays = mel_files
    out = load_mel_batch(paths[:1], 64, 96, [0], [0], to_model_range=False)
    assert np.array_equal(out[0], arrays[0][:64, :96])


def test_crop_out_of_range_raises(mel_files):
    paths, _ = mel_files
    with pytest.raises(IOError):
        load_mel_batch(paths[:1], 64, 999, [0], [0])


def test_short_offset_lists_raise(mel_files):
    # the C side indexes tops/lefts[0..n) — a short list must fail in Python,
    # not read past the end of the buffer
    paths, _ = mel_files
    with pytest.raises(ValueError):
        load_mel_batch(paths, 64, 96, tops=[0])
    with pytest.raises(ValueError):
        load_mel_batch(paths, 64, 96, lefts=[0, 0])


def test_corrupt_header_length_is_ioerror(tmp_path):
    # v2 .npy whose 4-byte header-length field decodes to ~4 GB: must surface
    # as the loader's IOError contract, not a bad_alloc/terminate in the pool
    p = str(tmp_path / "bad.npy")
    with open(p, "wb") as f:
        f.write(b"\x93NUMPY\x02\x00" + b"\xff\xff\xff\xef" + b"junk")
    with pytest.raises(IOError):
        load_mel_batch([p], 8, 8, [0], [0])


def test_unsupported_file_raises(tmp_path, rng):
    # fortran-order file: native refuses (Python fallback handles it upstream)
    p = str(tmp_path / "f.npy")
    np.save(p, np.asfortranarray(rng.random((40, 50), ).astype(np.float32)))
    with pytest.raises(IOError):
        load_mel_batch([p], 32, 40, [0], [0])


def _specs_layout(tmp_path, rng, n=6, shape=(32, 64)):
    feats = tmp_path / "feats" / "cls0"
    feats.mkdir(parents=True)
    for i in range(n):
        np.save(feats / f"v{i}_mel.npy", rng.random(shape).astype(np.float32))
    split = tmp_path / "split_train.txt"
    split.write_text("\n".join(f"cls0/v{i}" for i in range(n)) + "\n")
    return str(tmp_path / "feats" / "*"), str(split)


def test_specs_load_batch_matches_getitem(tmp_path, rng):
    spec_dir, split = _specs_layout(tmp_path, rng)
    ds = SpecsDataset("train", spec_dir, split_path=split,
                      mel_num=24, spec_crop_len=48, random_crop=True)
    idx = [3, 0, 5, 1]
    batch = ds.load_batch(idx, rng=np.random.default_rng(11))
    ref_rng = np.random.default_rng(11)
    for k, i in enumerate(idx):
        item = ds.__getitem__(i, rng=ref_rng)
        assert np.array_equal(batch["image"][k], item["image"])
        assert batch["label"][k] == item["label"]
        assert batch["target"][k] == item["target"]
        assert batch["file_path_"][k] == item["file_path_"]


def test_caption_dataset_load_batch_matches_getitem(tmp_path, rng):
    root = tmp_path / "caps"
    meldir = root / "features" / "train" / "melspec_10s_22050hz"
    meldir.mkdir(parents=True)
    txtdir = root / "text" / "train"
    txtdir.mkdir(parents=True)
    (root / "train").mkdir()
    names = [f"clip{i}" for i in range(5)]
    (root / "train" / "filenames.txt").write_text("\n".join(names) + "\n")
    for n in names:
        np.save(meldir / f"{n}_mel.npy", rng.random((40, 80)).astype(np.float32))
        (txtdir / f"{n}.txt").write_text("A dog Barks\nWind blows\nRain falls\n")

    ds = _MelCaptionDataset(str(root), phase="train", mel_num=32,
                            spec_crop_len=64, random_crop=True)
    idx = [4, 2, 0]
    batch = ds.load_batch(idx, rng=np.random.default_rng(5))
    ref_rng = np.random.default_rng(5)
    for k, i in enumerate(idx):
        item = ds.__getitem__(i, rng=ref_rng)
        assert np.array_equal(batch["image"][k], item["image"])
        assert batch["text"][k] == item["text"]


def test_sharded_loader_native_off_parity(tmp_path, rng, monkeypatch):
    """The loader yields the identical stream with the native path disabled."""
    spec_dir, split = _specs_layout(tmp_path, rng, n=8)
    ds = SpecsDataset("train", spec_dir, split_path=split,
                      mel_num=24, spec_crop_len=48, random_crop=True)

    def run():
        loader = ShardedLoader(ds, batch_size=4, shuffle=True, seed=3,
                               num_shards=1, shard_index=0)
        return [b for b in loader]

    native_batches = run()
    monkeypatch.setenv("T2S_NATIVE_LOADER", "0")
    python_batches = run()
    assert len(native_batches) == len(python_batches) == 2
    for nb, pb in zip(native_batches, python_batches):
        assert np.array_equal(nb["image"], pb["image"])
        assert list(nb["label"]) == list(pb["label"])
        assert np.array_equal(nb["target"], pb["target"])
