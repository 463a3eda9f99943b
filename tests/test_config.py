"""Config system: CLI DSL, YAML inheritance, _debug convention, options file."""
import os

import numpy as np
import pytest
import yaml

from matchnerf_tpu import config as cfg_mod
from matchnerf_tpu.utils import DotDict


def test_parse_arguments_dsl():
    opt = cfg_mod.parse_arguments([
        "--a.b.c=3", "--flag", "--noflag!", "--none=", "--lst=1,2,",
        "--name=hello", "--f=2.5e-4", "--mixed=a,2,"])
    assert opt["a"]["b"]["c"] == 3
    assert opt["flag"] is True
    assert opt["noflag"] is False
    assert opt["none"] is None
    assert opt["lst"] == [1, 2]
    assert opt["name"] == "hello"
    assert abs(opt["f"] - 2.5e-4) < 1e-12
    assert opt["mixed"] == ["a", 2]


def test_parse_duplicate_key_rejected():
    with pytest.raises(AssertionError):
        cfg_mod.parse_arguments(["--x=1", "--x=2"])


def test_yaml_parent_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"_parent_: {base}\na: 5\nnested:\n  y: 7\n")
    opt = cfg_mod.load_options(str(child))
    assert opt["a"] == 5
    assert opt["nested"]["x"] == 1 and opt["nested"]["y"] == 7


def test_shipped_config_tree_loads():
    for name in ("base", "train", "test", "test_video", "test_video_own",
                 "demo_own", "test_tnt", "train_ibrnet"):
        opt = cfg_mod.load_options(name)
        assert opt["n_src_views"] == 3
        assert opt["decoder"]["net_width"] == 128
    opt = cfg_mod.load_options("train_ibrnet")
    assert opt["encoder"]["attn_splits_list"] == [4]
    assert opt["decoder"]["raytrans_act"] == "ELU"
    assert opt["max_epoch"] == 60


def test_debug_name_convention(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = DotDict(name="run_debug", seed=0, output_root=str(tmp_path),
                  data_train=DotDict(max_len=-1),
                  data_test=DotDict(dtu=DotDict(max_len=-1)),
                  max_epoch=12)
    cfg_mod.process_options(opt)
    assert opt["data_train"]["max_len"] == 20
    assert opt["data_test"]["dtu"]["max_len"] == 1
    assert opt["max_epoch"] == 2
    assert os.path.exists(os.path.join(opt["output_path"], "run.bash"))


def test_seed_suffix_and_random_name(tmp_path):
    opt = DotDict(name="exp", seed=3, output_root=str(tmp_path))
    cfg_mod.process_options(opt)
    assert opt["name"] == "exp_seed3"

    opt2 = DotDict(name="exp2", seed=None, output_root=str(tmp_path))
    cfg_mod.process_options(opt2)
    assert opt2["name"].startswith("exp2_") and len(opt2["name"]) == len("exp2_") + 4


def test_override_safe_check_auto_yes(tmp_path, monkeypatch):
    monkeypatch.setenv("MATCHNERF_YES", "1")
    base = DotDict(a=1, nested=DotDict(x=1))
    out = cfg_mod.override_options(base, DotDict(newkey=2, nested=DotDict(y=3)),
                                   key_stack=[], safe_check=True)
    assert out["newkey"] == 2 and out["nested"]["y"] == 3 and out["nested"]["x"] == 1


def test_save_options_file_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("MATCHNERF_YES", "1")
    opt = DotDict(name="t", seed=0, output_root=str(tmp_path))
    cfg_mod.process_options(opt)
    cfg_mod.save_options_file(opt)
    with open(os.path.join(opt["output_path"], "options.yaml")) as f:
        saved = yaml.safe_load(f)
    assert saved["name"] == "t"
    # identical second save passes; modified save overrides under auto-yes
    cfg_mod.save_options_file(opt)
    opt["extra"] = 1
    cfg_mod.save_options_file(opt)
    with open(os.path.join(opt["output_path"], "options.yaml")) as f:
        assert yaml.safe_load(f)["extra"] == 1
