"""Evaluation suite tests: metric math vs analytic cases, Melception geometry,
end-to-end folder evaluation on a tiny synthetic setup."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_to_sound_synthesis_tpu.evaluation import metrics as M


def test_fid_identical_is_zero(rng):
    f = rng.standard_normal((200, 8))
    out = M.calculate_fid(f, f.copy())
    assert abs(out["frechet_inception_distance"]) < 1e-6


def test_fid_mean_shift_analytic(rng):
    # same covariance, mean shifted by d: FID = ||d||^2
    f1 = rng.standard_normal((20000, 4))
    d = np.array([1.0, 2.0, 0.0, -1.0])
    f2 = f1 + d
    out = M.calculate_fid(f1, f2)
    np.testing.assert_allclose(out["frechet_inception_distance"], (d**2).sum(), rtol=0.02)


def test_isc_uniform_is_one(rng):
    # identical logits for every sample -> p == marginal -> ISc = 1
    logits = np.tile(rng.standard_normal((1, 10)), (500, 1))
    out = M.calculate_isc(logits, splits=5)
    np.testing.assert_allclose(out["inception_score_mean"], 1.0, atol=1e-6)


def test_isc_onehot_is_num_classes(rng):
    # each sample confident in a uniformly-chosen class -> ISc -> C
    C, N = 7, 7000
    logits = np.full((N, C), -50.0)
    logits[np.arange(N), np.arange(N) % C] = 50.0
    out = M.calculate_isc(logits, splits=7)
    np.testing.assert_allclose(out["inception_score_mean"], C, rtol=0.01)


def test_kid_same_distribution_near_zero(rng):
    f1 = rng.standard_normal((500, 16))
    f2 = rng.standard_normal((500, 16))
    out = M.calculate_kid(f1, f2, subsets=10, subset_size=100)
    assert abs(out["kernel_inception_distance_mean"]) < 0.05
    out2 = M.calculate_kid(f1, f1 + 3.0, subsets=10, subset_size=100)
    assert out2["kernel_inception_distance_mean"] > 1.0


def test_kl_grouping(rng):
    # two source clips, 2 samples each; identical logits -> KL ~ log-eps effect only
    logits_ref = rng.standard_normal((2, 5)).astype(np.float64)
    paths_2 = ["gt/a_mel.npy", "gt/b_mel.npy"]
    logits_gen = np.stack([logits_ref[0], logits_ref[0], logits_ref[1], logits_ref[1]])
    paths_1 = ["gen/a_sample_0.npy", "gen/a_sample_1.npy",
               "gen/b_sample_0.npy", "gen/b_sample_1.npy"]
    out = M.calculate_kl(logits_gen, paths_1, logits_ref, paths_2, "caps")
    assert abs(out["kullback_leibler_divergence"]) < 1e-3
    # mismatched logits -> positive KL
    out2 = M.calculate_kl(logits_gen[::-1], paths_1, logits_ref, paths_2, "caps")
    assert out2["kullback_leibler_divergence"] > 0.01


def test_path_to_sharedkey():
    assert M.path_to_sharedkey("x/y/clip12_sample_3.npy", "caps") == "clip12"
    assert M.path_to_sharedkey("x/y/clip12_mel.npy", "caps") == "clip12"
    assert M.path_to_sharedkey("v/abc_sample_1.npy", "vggsound") == "abc"


# ---------------------------------------------------------------------------
# Melception
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_melception_shapes(rng):
    from text_to_sound_synthesis_tpu.models.melception import Melception

    model = Melception(num_classes=309)
    mel = jnp.asarray(rng.standard_normal((1, 80, 132)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mel)
    out = model.apply(params, mel)
    assert out["2048"].shape == (1, 2048)
    assert out["logits"].shape == (1, 309)
    assert out["logits_unbiased"].shape == (1, 309)
    np.testing.assert_allclose(
        np.asarray(out["logits"]) - np.asarray(out["logits_unbiased"]),
        np.asarray(params["params"]["fc_bias"])[None], atol=1e-5,
    )


@pytest.mark.slow
def test_evaluate_folders_end_to_end(tmp_path, rng):
    from text_to_sound_synthesis_tpu.evaluation.features import evaluate_folders
    from text_to_sound_synthesis_tpu.models.melception import Melception

    gen = tmp_path / "gen"
    ref = tmp_path / "ref"
    gen.mkdir(); ref.mkdir()
    for i in range(4):
        base = rng.random((80, 64)).astype(np.float32)
        np.save(ref / f"clip{i}_mel.npy", base)
        for s in range(2):
            np.save(gen / f"clip{i}_sample_{s}.npy",
                    np.clip(base + 0.05 * rng.standard_normal((80, 64)), 0, 1).astype(np.float32))

    model = Melception(num_classes=9)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 64)))
    out = evaluate_folders(model, params, str(gen), str(ref), batch_size=4,
                           kid_subset_size=4)
    for key in ("frechet_inception_distance", "inception_score_mean",
                "kernel_inception_distance_mean", "kullback_leibler_divergence"):
        assert np.isfinite(out[key]), (key, out)


@pytest.mark.slow
def test_melception_blocks_vs_torch_transcription(rng):
    """Cross-check the flax InceptionA block + BasicConv2d + BN folding against
    an independent torch transcription of the torchvision architecture
    (torchvision itself is absent from this image)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    from text_to_sound_synthesis_tpu.convert.torch_to_jax import convert_melception
    from text_to_sound_synthesis_tpu.models.melception.model import InceptionA

    class TBasicConv(tnn.Module):
        def __init__(self, cin, cout, k, s=1, p=0):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride=s, padding=p, bias=False)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return tF.relu(self.bn(self.conv(x)))

    class TInceptionA(tnn.Module):
        def __init__(self, cin, pool):
            super().__init__()
            self.branch1x1 = TBasicConv(cin, 64, 1)
            self.branch5x5_1 = TBasicConv(cin, 48, 1)
            self.branch5x5_2 = TBasicConv(48, 64, 5, p=2)
            self.branch3x3dbl_1 = TBasicConv(cin, 64, 1)
            self.branch3x3dbl_2 = TBasicConv(64, 96, 3, p=1)
            self.branch3x3dbl_3 = TBasicConv(96, 96, 3, p=1)
            self.branch_pool = TBasicConv(cin, pool, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(tF.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b5, b3, bp], 1)

    torch.manual_seed(0)
    tm = TInceptionA(32, 16).eval()
    # randomize BN stats so folding is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    x = rng.standard_normal((1, 32, 12, 20)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    ours = InceptionA(pool_features=16)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = ours.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_melception(sd, params)
    got = np.asarray(ours.apply(params, xj))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=2e-4)


def test_multihost_gather_unequal_shards(tmp_path, rng, monkeypatch):
    """extract_features(multihost=True) with a file count NOT divisible by
    the host count: process_allgather requires equal shapes, so per-host
    features must be padded to the max shard size and the padding dropped
    after the gather. Simulated with a fake 2-host allgather (host 0's
    padded array duplicated), which still pins the pad/reconstruct/ordering
    contract this process can't otherwise exercise."""
    from text_to_sound_synthesis_tpu.evaluation import features as F
    from text_to_sound_synthesis_tpu.models.melception import Melception

    for i in range(3):  # 3 files on 2 "hosts" -> shards of 2 and 1
        np.save(str(tmp_path / f"s{i}.npy"), rng.random((16, 32)).astype(np.float32))
    folder = F.FakesFolder(str(tmp_path))

    model = Melception(num_classes=4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 32), jnp.float32))

    seen = {}

    def fake_allgather(v):
        seen[v.shape] = True
        return np.stack([v, v])  # both "hosts" report host-0's padded shard

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    import jax.experimental.multihost_utils as mhu

    monkeypatch.setattr(mhu, "process_allgather", fake_allgather)

    out = F.extract_features(model, params, folder, batch_size=2,
                             multihost=True)
    # host 0 holds ceil(3/2)=2 rows; gather reconstruction = 2 + 1 = 3 rows
    for k, v in out.items():
        if k == "file_path_":
            assert v == [folder.files[0], folder.files[2], folder.files[1]]
        else:
            assert v.shape[0] == 3, (k, v.shape)
    # every gathered array was padded to the equal per-host size (2 rows)
    assert all(shape[0] == 2 for shape in seen)
