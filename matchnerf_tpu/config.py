"""Hierarchical YAML config system with dotted CLI overrides.

Reproduces the UX of the reference's `options.py` (/root/reference/options.py):

- CLI DSL (`parse_arguments`, options.py:19-47):
    --key1.key2=value   -> value (yaml-parsed)
    --key1.key2=        -> None
    --key1.key2         -> True
    --key1.key2!        -> False
    --key=a,b,          -> list
- YAML `_parent_:` inheritance chains (`load_options`, options.py:63-76)
- safe-check for unknown CLI keys (`override_options`, options.py:79-95);
  interactive y/n prompt, auto-accepted when stdin is not a tty or
  `--yes` / MATCHNERF_YES=1 is set (for CI/automation)
- post-processing (`process_options`, options.py:98-134): seed, `_debug`
  name convention truncating datasets/epochs, output dir, run.bash journal
- `save_options_file` diffing against a previous run's options.yaml
  (options.py:136-160)
"""
from __future__ import annotations

import os
import random
import string
import subprocess
import sys
import time
from typing import List, Optional

import numpy as np
import yaml

from .utils import DotDict, log, to_plain_dict

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def parse_arguments(args: List[str]) -> DotDict:
    """Parse `--a.b.c=value` style command-line arguments into a nested dict."""
    opt_cmd: dict = {}
    for arg in args:
        assert arg.startswith("--"), f"arguments must start with '--': {arg}"
        if "=" not in arg[2:]:
            key_str, value = (arg[2:-1], "false") if arg.endswith("!") else (arg[2:], "true")
        else:
            key_str, value = arg[2:].split("=", 1)
        keys_sub = key_str.split(".")
        opt_sub = opt_cmd
        for k in keys_sub[:-1]:
            opt_sub = opt_sub.setdefault(k, {})
        assert keys_sub[-1] not in opt_sub, f"duplicate CLI key: {key_str}"
        loaded_value = yaml.safe_load(value) if value != "" else None
        if isinstance(loaded_value, str) and "," in loaded_value:
            loaded_value = [int(x) if x.isdigit() else x for x in loaded_value.split(",") if x.strip()]
        opt_sub[keys_sub[-1]] = loaded_value
    return DotDict(opt_cmd)


def _resolve_yaml_path(fname: str) -> str:
    if os.path.isfile(fname):
        return fname
    cand = os.path.join(CONFIG_DIR, fname if fname.endswith(".yaml") else fname + ".yaml")
    if os.path.isfile(cand):
        return cand
    raise FileNotFoundError(f"config file not found: {fname} (searched {cand})")


def load_options(fname: str) -> DotDict:
    """Load a YAML file, resolving `_parent_` inheritance (child overrides parent)."""
    with open(_resolve_yaml_path(fname)) as f:
        opt = DotDict(yaml.safe_load(f) or {})
    if "_parent_" in opt:
        parent_fnames = opt.pop("_parent_")
        if isinstance(parent_fnames, str):
            parent_fnames = [parent_fnames]
        for parent_fname in parent_fnames:
            opt_parent = load_options(parent_fname)
            opt_parent = override_options(opt_parent, opt, key_stack=[])
            opt = opt_parent
    return opt


def _auto_yes() -> bool:
    return (os.environ.get("MATCHNERF_YES", "") == "1") or (not sys.stdin.isatty())


def override_options(opt: DotDict, opt_over, key_stack=None, safe_check=False) -> DotDict:
    key_stack = key_stack or []
    for key, value in opt_over.items():
        if isinstance(value, dict) and isinstance(opt.get(key), dict):
            opt[key] = override_options(opt.get(key, DotDict()), value,
                                        key_stack=key_stack + [key], safe_check=safe_check)
        else:
            if safe_check and key not in opt:
                key_str = ".".join(key_stack + [key])
                if _auto_yes():
                    log.warn(f'"{key_str}" not found in base options, adding (auto-yes).')
                else:
                    add_new = None
                    while add_new not in ("y", "n"):
                        add_new = input(f'"{key_str}" not found in original opt, add? (y/n) ')
                    if add_new == "n":
                        print("safe exiting...")
                        sys.exit(0)
            if isinstance(value, dict):
                value = override_options(DotDict(), value, key_stack=key_stack + [key])
            opt[key] = value
    return opt


def build_options(opt_cmd: Optional[DotDict] = None) -> DotDict:
    """Load + override, WITHOUT the filesystem/naming side effects of
    `process_options` — the multi-host entry points initialize
    jax.distributed between the two phases so run naming can be agreed
    across hosts before anything touches disk."""
    opt_cmd = opt_cmd or DotDict()
    log.info("setting configurations...")
    assert "yaml" in opt_cmd, "must specify --yaml=<config>"
    opt_base = load_options(str(opt_cmd["yaml"]))
    return override_options(opt_base, opt_cmd, key_stack=[], safe_check=True)


def set_options(opt_cmd: Optional[DotDict] = None) -> DotDict:
    """Entry point mirroring `options.set` (options.py:50-60)."""
    opt = build_options(opt_cmd)
    process_options(opt)
    log.options(opt)
    return opt


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def process_options(opt: DotDict):
    if opt.get("name") is None:
        opt["name"] = time.strftime("%b%d_%H%M%S").lower()

    # `_debug` run-name convention truncates datasets and epochs (options.py:104-112)
    if "_debug" in str(opt["name"]):
        if opt.get("data_train"):
            opt["data_train"]["max_len"] = 20
        if opt.get("data_val"):
            opt["data_val"]["max_len"] = 1
        if opt.get("data_test"):
            for x in opt["data_test"]:
                opt["data_test"][x]["max_len"] = 1
        opt["max_epoch"] = 2

    if opt.get("seed") is not None:
        seed_everything(int(opt["seed"]))
        if opt["seed"] != 0:
            opt["name"] = f"{opt['name']}_seed{opt['seed']}"
    else:
        randkey = "".join(random.choice(string.ascii_uppercase) for _ in range(4))
        opt["name"] = f"{opt['name']}_{randkey}"

    # multi-host: the default name embeds a host-local timestamp (and a
    # random suffix when seed is unset) — every host must agree on the run
    # directory, so all adopt host 0's resolved name. Gated on the module
    # flag (NOT jax.process_count(), which would force backend init during
    # config parsing); single-process flow never touches jax here.
    from .parallel import distributed as dist

    if dist.is_initialized() and dist.process_count() > 1:
        opt["name"] = dist.broadcast_str(str(opt["name"]))

    opt["output_path"] = os.path.join(opt.get("output_root", "outputs"), str(opt["name"]))
    os.makedirs(opt["output_path"], exist_ok=True)
    if not dist.is_initialized() or dist.process_index() == 0:
        with open(os.path.join(opt["output_path"], "run.bash"), "a+") as f:
            f.write("python %s\n" % " ".join(sys.argv))


def save_options_file(opt: DotDict):
    opt_fname = os.path.join(opt["output_path"], "options.yaml")
    plain = to_plain_dict(opt)
    if os.path.isfile(opt_fname):
        with open(opt_fname) as f:
            opt_old = yaml.safe_load(f)
        if plain != opt_old:
            tmp = opt_fname.replace("options.yaml", "options_temp.yaml")
            with open(tmp, "w") as f:
                yaml.safe_dump(plain, f, default_flow_style=False, indent=4)
            print("existing options file found (different from current one)...")
            subprocess.run(["diff", opt_fname, tmp], check=False)
            os.remove(tmp)
            if not _auto_yes():
                override = None
                while override not in ("y", "n"):
                    override = input("override? (y/n) ")
                if override == "n":
                    print("safe exiting...")
                    sys.exit(0)
        else:
            print("existing options file found (identical)")
    else:
        print("(creating new options file...)")
    with open(opt_fname, "w") as f:
        yaml.safe_dump(plain, f, default_flow_style=False, indent=4)
