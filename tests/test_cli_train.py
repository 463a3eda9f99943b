"""train.py CLI smoke test: two tiny epochs on a synthetic DTU-layout scan."""
import os
import subprocess
import sys

import numpy as np
import pytest

from test_cli import _cli_env
from test_datasets_synthetic import _rand_extr, _save_img, _write_mvsnet_cam

REPO = "/root/repo"


def _make_dtu_tree(tmp_path, n_views=8):
    import torch

    rng = np.random.default_rng(0)
    root = tmp_path / "DTU"
    (root / "Cameras" / "train").mkdir(parents=True)
    scan = "scan1"
    (root / f"Rectified/{scan}_train").mkdir(parents=True)
    (root / f"Depths/{scan}").mkdir(parents=True)
    for vid in range(n_views):
        extr = _rand_extr(rng)
        intr = np.array([[100.0, 0, 16], [0, 100.0, 8], [0, 0, 1]]) / 4.0
        intr[2, 2] = 1.0
        _write_mvsnet_cam(root / "Cameras/train" / f"{vid:08d}_cam.txt",
                          extr, intr, 425.0, 2.5)
        for light in range(7):
            _save_img(root / f"Rectified/{scan}_train/rect_{vid+1:03d}_{light}_r5000.png",
                      rng, h=64, w=64)
        depth = rng.uniform(400, 900, (128, 128)).astype(np.float32)
        with open(root / f"Depths/{scan}/depth_map_{vid:04d}.pfm", "wb") as f:
            f.write(b"Pf\n128 128\n-1.0\n")
            f.write(np.flipud(depth).tobytes())

    meta = tmp_path / "meta"
    (meta / "dtu_meta").mkdir(parents=True)
    (meta / "dtu_meta" / "train_all.txt").write_text(f"{scan}\n")
    # view_pairs.txt: 8 viewpoints, each listing 5 score-ranked sources
    lines = ["8"]
    for ref in range(8):
        srcs = [v for v in range(8) if v != ref][:5]
        lines.append(str(ref))
        lines.append(f"{len(srcs)} " + " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)))
    (meta / "dtu_meta" / "view_pairs.txt").write_text("\n".join(lines) + "\n")
    return root, meta, scan


def test_train_cli_synthetic_dtu(tmp_path):
    root, meta, scan = _make_dtu_tree(tmp_path)
    cfg = f"""
_parent_: {REPO}/configs/base.yaml
name: train_smoke
max_epoch: 1
output_root: {tmp_path}/outputs
tb: false
sanity_check: false
save_test_image: false
encoder:
    num_transformer_layers: 1
    pretrain_weight:
nerf:
    sample_intvs: 8
    rand_rays_train: 64
    rand_rays_val: 256
    rand_rays_test: 256
data_train:
    root_dir: {root}
    dataset_name: dtu
    img_wh: [64, 64]
    num_workers: 1
    max_len: 2
    meta_dir: {meta}
loss_weight:
    render: 1
optim:
    lr_enc: 5.e-5
    lr_dec: 5.e-4
    clip_enc: 1.
    algo:
        type: AdamW
        weight_decay: 1.e-4
    sched:
        type: OneCycleLR
        pct_start: 0.5
        cycle_momentum: false
        anneal_strategy: cos
freq:
    scalar: 1
    log_ep: 1
    ckpt_ep: 1
    ckpt_it: -1
    val_ep: -1
    val_it: -1
    test_ep: -1
    test_ep_start: 0
    test_it: -1
"""
    cfg_path = tmp_path / "train_smoke.yaml"
    cfg_path.write_text(cfg)

    env = _cli_env()
    # 8 virtual devices: batch_size=1 so the engine must pick ray-sharding
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, "train.py", f"--yaml={cfg_path}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "rays-parallel mesh over 8 devices" in proc.stdout + proc.stderr, \
        "engine did not engage ray-sharding at batch_size=1 on an 8-device mesh"

    outdir = tmp_path / "outputs" / "train_smoke"
    assert (outdir / "models" / "latest.ckpt").exists()
    assert (outdir / "models" / "ep1_it2.ckpt").exists()
    assert (outdir / "scalars.jsonl").exists()
