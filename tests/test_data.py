"""Data pipeline tests: crop, datasets on a synthetic on-disk layout, sharded loader."""

import os
import pickle

import numpy as np
import pytest

from text_to_sound_synthesis_tpu.data import ArrayDataset, CapsDataset, ShardedLoader
from text_to_sound_synthesis_tpu.data.loader import ConcatDataset, build_dataloader
from text_to_sound_synthesis_tpu.data.transforms import CropSpec, to_model_range


def test_crop_center_and_random(rng):
    spec = rng.random((80, 860)).astype(np.float32)
    c = CropSpec([80, 848], random_crop=False)
    out = c(spec)
    assert out.shape == (80, 848)
    np.testing.assert_array_equal(out, spec[:, 6:854])  # (860-848)//2 = 6
    cr = CropSpec([80, 848], random_crop=True)
    out2 = cr(spec, np.random.default_rng(0))
    assert out2.shape == (80, 848)


def _make_caps_layout(root, n=10, n_caps=3):
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "text", "train"), exist_ok=True)
    meldir = os.path.join(root, "features", "train", "melspec_10s_22050hz")
    os.makedirs(meldir, exist_ok=True)
    names = [f"clip{i:03d}" for i in range(n)]
    with open(os.path.join(root, "train", "filenames.pickle"), "wb") as f:
        pickle.dump(names, f)
    rng = np.random.default_rng(0)
    for name in names:
        np.save(os.path.join(meldir, name + "_mel.npy"),
                rng.random((80, 860)).astype(np.float32))
        with open(os.path.join(root, "text", "train", name + ".txt"), "w") as f:
            for c in range(n_caps):
                f.write(f"caption {c} for {name}\n")
    return names


def test_caps_dataset(tmp_path):
    root = str(tmp_path)
    _make_caps_layout(root)
    ds = CapsDataset(data_root=root, phase="train")
    assert len(ds) == 10
    item = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert item["image"].shape == (1, 80, 848)
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    assert item["text"].startswith("caption")


def test_sharded_loader_disjoint_and_equal(tmp_path):
    root = str(tmp_path)
    _make_caps_layout(root, n=16)
    ds = CapsDataset(data_root=root, phase="train")
    loaders = [
        ShardedLoader(ds, batch_size=2, seed=7, num_shards=4, shard_index=i)
        for i in range(4)
    ]
    all_seen = []
    lengths = set()
    for ld in loaders:
        batches = list(ld)
        lengths.add(len(batches))
        for b in batches:
            assert b["image"].shape == (2, 1, 80, 848)
            all_seen.extend(b["text"])
    assert lengths == {2}  # 16 / 4 shards / bs 2 -> equal iteration counts
    # disjoint coverage of all clips (captions mention the clip name)
    clips = {t.split()[-1] for t in all_seen}
    assert len(clips) == 16


def test_sharded_loader_epoch_reshuffle():
    ds = ArrayDataset(np.arange(32, dtype=np.float32).reshape(32, 1),
                      [str(i) for i in range(32)])
    ld = ShardedLoader(ds, batch_size=4, seed=0, num_shards=1, shard_index=0)
    e0 = [t for b in ld for t in b["text"]]
    e1 = [t for b in ld for t in b["text"]]  # epoch auto-advanced
    assert set(e0) == set(e1)
    assert e0 != e1


def test_concat_dataset():
    a = ArrayDataset(np.zeros((3, 1)), ["a0", "a1", "a2"])
    b = ArrayDataset(np.ones((2, 1)), ["b0", "b1"])
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert cat[3]["text"] == "b0"
    assert cat[2]["text"] == "a2"


def test_build_dataloader_schema(tmp_path):
    root = str(tmp_path)
    _make_caps_layout(root, n=8)
    cfg = {
        "dataloader": {
            "batch_size": 4,
            "train_datasets": [{
                "target": "text_to_sound_synthesis_tpu.data.CapsDataset",
                "params": {"data_root": root, "phase": "train"},
            }],
        }
    }
    out = build_dataloader(cfg)
    assert out["train_iterations"] == 2
    assert out["validation_loader"] is None
    batches = list(out["train_loader"])
    assert len(batches) == 2


def test_sharded_loader_threaded_workers(tmp_path):
    root = str(tmp_path)
    _make_caps_layout(root, n=8)
    ds = CapsDataset(data_root=root, phase="train")
    ld = ShardedLoader(ds, batch_size=4, seed=0, num_shards=1, shard_index=0,
                       num_workers=3)
    batches = list(ld)
    assert len(batches) == 2
    seen = {t.split()[-1] for b in batches for t in b["text"]}
    assert len(seen) == 8


def test_make_split_files_midpath_wildcard(tmp_path):
    """The shipped configs put the class wildcard MID-path
    ('features/*/melspec_10s_22050hz'); the class written to the split rows
    must be the component the '*' matched, so that __getitem__'s
    spec_dir_path.replace('*', cls) round-trips to an existing file."""
    import numpy as np

    from text_to_sound_synthesis_tpu.data.datasets import make_split_files

    for cls in ("dog", "rain"):
        p = tmp_path / "features" / cls / "melspec_10s_22050hz"
        p.mkdir(parents=True)
        for v in ("a", "b"):
            np.save(str(p / f"{cls}_{v}_mel.npy"), np.zeros((4, 4)))
    spec_dir = str(tmp_path / "features" / "*" / "melspec_10s_22050hz")
    make_split_files(str(tmp_path / "split_train.txt"), spec_dir,
                     train_frac=1.0)
    rows = (tmp_path / "split_train.txt").read_text().split()
    assert sorted(rows) == ["dog/dog_a", "dog/dog_b", "rain/rain_a",
                            "rain/rain_b"]
    import os

    for r in rows:
        cls, vid = r.split("/")
        assert os.path.exists(
            os.path.join(spec_dir.replace("*", cls), vid + "_mel.npy"))
