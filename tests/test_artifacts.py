"""Artifact manifest (utils/artifacts.py) — the zero-egress equivalent of the
reference's download registry (``Codebook/specvqgan/util.py:7-57``)."""

import hashlib
import os
import sys

import pytest

from text_to_sound_synthesis_tpu.utils import artifacts as A

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_manifest_mirrors_reference_registry():
    """Pinned names/MD5s must equal the reference's (util.py:7-27)."""
    assert A.ARTIFACTS["lpaps"].filename == "lpaps.pt"
    assert A.ARTIFACTS["lpaps"].md5 == "f8d4e7dba2b870222fe2bee26f85e7c9"
    assert A.ARTIFACTS["vggishish"].filename == "vggishish16.pt"
    assert A.ARTIFACTS["vggishish"].md5 == "197040c524a07ccacf7715d7080a80bd"
    assert (A.ARTIFACTS["vggishish_mean_std"].filename
            == "train_means_stds_melspec_10s_22050hz.txt")
    assert A.ARTIFACTS["melception"].filename == "melception-21-05-10T09-28-40.pt"
    assert A.ARTIFACTS["melception"].md5 == "a71a41041e945b457c7d3d814bbcf72d"


def test_locate_and_verify(tmp_path):
    root = tmp_path / "artifacts"
    root.mkdir()
    # pinned entry with the RIGHT md5
    content = b"lpaps-proxy-bytes"
    (root / "lpaps.pt").write_bytes(content)
    good = A.ARTIFACTS["lpaps"]._replace(md5=hashlib.md5(content).hexdigest())
    orig = A.ARTIFACTS["lpaps"]
    A.ARTIFACTS["lpaps"] = good
    try:
        # pinned entry with the WRONG md5 (melception pin stays official)
        (root / "melception-21-05-10T09-28-40.pt").write_bytes(b"junk")
        # unpinned pattern entry, one level deep
        (root / "ckpts").mkdir()
        (root / "ckpts" / "diffsound_audiocaps.pth").write_bytes(b"proxy")
        # vocoder dir detected by its contents, not its name
        (root / "melgan_run").mkdir()
        (root / "melgan_run" / "best_netG.pt").write_bytes(b"g")
        (root / "melgan_run" / "args.yml").write_text("ngf: 32\n")

        by_name = {s.name: s for s in A.verify(str(root))}
        assert by_name["lpaps"].status == "ok"
        assert by_name["melception"].status == "bad_md5"
        assert by_name["diffsound_ckpt"].status == "unpinned"
        assert by_name["diffsound_ckpt"].path.endswith("diffsound_audiocaps.pth")
        assert by_name["vocoder"].status == "unpinned"
        assert by_name["vocoder"].path.endswith("melgan_run")
        assert by_name["vggishish"].status == "missing"
        assert "specvqgan_public" in by_name["vggishish"].detail
    finally:
        A.ARTIFACTS["lpaps"] = orig


def test_check_artifacts_cli(tmp_path, capsys):
    import check_artifacts as cli

    root = tmp_path / "empty"
    root.mkdir()
    assert cli.main([str(root), "--need", "melception"]) == 1
    out = capsys.readouterr().out
    assert "MISSING" in out and "melception" in out

    (root / "somefile_val_captions.csv").write_text("name,caption\n")
    assert cli.main([str(root), "--need", "val_csv"]) == 0

    with pytest.raises(SystemExit):
        cli.main([str(root), "--need", "nonsense"])
