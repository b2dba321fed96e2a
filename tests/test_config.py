"""Config registry + YAML surface tests, incl. reference-YAML compatibility."""

import pytest

from text_to_sound_synthesis_tpu.utils import config as C


def test_registry_register_and_resolve():
    reg = C.Registry()

    @reg.register("pkg.mod.Thing", "legacy.path.Thing")
    class Thing:
        def __init__(self, a=1):
            self.a = a

    obj = C.instantiate_from_config({"target": "pkg.mod.Thing", "params": {"a": 5}}, registry=reg)
    assert obj.a == 5
    obj2 = C.instantiate_from_config({"target": "legacy.path.Thing"}, registry=reg)
    assert obj2.a == 1


def test_registry_suffix_fallback():
    reg = C.Registry()

    @reg.register("a.b.Widget")
    class Widget:
        pass

    assert isinstance(C.instantiate_from_config({"target": "zzz.Widget"}, registry=reg), Widget)
    with pytest.raises(KeyError):
        C.instantiate_from_config({"target": "zzz.Missing"}, registry=reg)


def test_none_target_passthrough():
    assert C.instantiate_from_config(None) is None
    assert C.instantiate_from_config({"target": "none"}) is None


def test_yaml_python_tuple_tag(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: !!python/tuple [5, 53]\nb: 3.0e-6\n")
    cfg = C.load_yaml_config(str(p))
    assert cfg["a"] == (5, 53)
    assert cfg["b"] == 3.0e-6


def test_reference_caps_yaml_parses_if_mounted():
    """The reference's own config files must parse with our loader."""
    import os
    path = "/root/reference/Diffsound/configs/caps.yaml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = C.load_yaml_config(path)
    assert cfg["model"]["params"]["diffusion_config"]["params"]["diffusion_step"] == 100
    tcfg = cfg["model"]["params"]["diffusion_config"]["params"]["transformer_config"]
    assert tcfg["params"]["content_seq_len"] == 265
    assert cfg["model"]["params"]["content_codec_config"]["params"]["n_embed"] == 256


def test_merge_opts():
    cfg = {"solver": {"base_lr": 1e-4}, "dataloader": {"batch_size": 8}}
    out = C.merge_opts_to_config(cfg, ["solver.base_lr", "3e-5", "dataloader.batch_size", "4"])
    assert out["solver"]["base_lr"] == 3e-5
    assert out["dataloader"]["batch_size"] == 4
    assert cfg["solver"]["base_lr"] == 1e-4  # original untouched
