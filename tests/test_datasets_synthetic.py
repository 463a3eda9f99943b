"""Dataset parity on synthetic on-disk fixtures for DTU / TnT / IBRNet formats."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference

install_reference()


def _write_mvsnet_cam(path, extr, intr, d0, d1):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in extr:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in intr:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        f.write(f"\n{d0} {d1}\n")


def _rand_extr(rng):
    from scipy.spatial.transform import Rotation
    e = np.eye(4, dtype=np.float64)
    e[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    e[:3, 3] = rng.standard_normal(3)
    return e


def _save_img(path, rng, h=48, w=64):
    from PIL import Image
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def test_tnt_parity_synthetic(tmp_path):
    from datasets.tnt import MVSDatasetTNT

    from matchnerf_tpu.data import TNTDataset

    rng = np.random.default_rng(0)
    scene = "Truck"
    sdir = tmp_path / scene
    (sdir / "images").mkdir(parents=True)
    (sdir / "cams_1").mkdir()
    n = 6
    for i in range(n):
        extr = _rand_extr(rng)
        intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        _write_mvsnet_cam(sdir / "cams_1" / f"{i:08d}_cam.txt", extr, intr, 0.5, 0.05)
        _save_img(sdir / "images" / f"{i:08d}.jpg", rng)

    pairs = {f"TNT_{scene}_train": [0, 1, 2, 3], f"TNT_{scene}_val": [4, 5]}
    torch.save(pairs, str(tmp_path / "pairs.th"))

    kwargs = dict(root_dir=str(tmp_path), split="test", n_views=3, img_wh=(32, 32),
                  nf_mode="minmax", scene_list=[scene])
    ours = TNTDataset(**kwargs, meta_dir=str(tmp_path))

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.makedirs("configs", exist_ok=True)
        torch.save(pairs, "configs/pairs.th")
        ref_ds = MVSDatasetTNT(**kwargs)
        assert len(ref_ds) == len(ours) == 2
        r, o = ref_ds[0], ours[0]
    finally:
        os.chdir(cwd)

    np.testing.assert_allclose(o["images"].transpose(0, 3, 1, 2), r["images"].numpy(),
                               atol=2e-3)  # jpeg decode identical; PIL resample same
    np.testing.assert_allclose(o["extrinsics"], r["extrinsics"], atol=1e-5)
    np.testing.assert_allclose(o["intrinsics"], r["intrinsics"], atol=1e-4)
    np.testing.assert_allclose(o["near_fars"], r["near_fars"], atol=1e-5)
    np.testing.assert_array_equal(o["view_ids"], r["view_ids"])
    np.testing.assert_allclose(o["c2ws_all"], r["c2ws_all"], atol=1e-5)


def _make_llff_scene(scene_dir, rng, n=8):
    os.makedirs(scene_dir / "images", exist_ok=True)
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        e = _rand_extr(rng)
        poses[i, :, :4] = e[:3]
        poses[i, :, 4] = [48, 64, 80.0]       # raw h, w, focal
        _save_img(scene_dir / "images" / f"img_{i:03d}.png", rng)
    bounds = rng.uniform(2.0, 8.0, (n, 2))
    bounds.sort(axis=1)
    pb = np.concatenate([poses.reshape(n, 15), bounds], axis=1)
    np.save(scene_dir / "poses_bounds.npy", pb)


def test_ibrnet_parity_synthetic(tmp_path):
    from datasets.ibrnet import MVSDatasetIBRNet

    from matchnerf_tpu.data import IBRNetDataset

    rng = np.random.default_rng(1)
    scene_dir = tmp_path / "groupA" / "scene1"
    _make_llff_scene(scene_dir, rng)

    kwargs = dict(root_dir=str(tmp_path), split="val", n_views=3, img_wh=(32, 32))
    ref_ds = MVSDatasetIBRNet(**kwargs)
    our_ds = IBRNetDataset(**kwargs)
    assert len(ref_ds) == len(our_ds) == 1
    r, o = ref_ds[0], our_ds[0]
    np.testing.assert_allclose(o["images"].transpose(0, 3, 1, 2), r["images"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(o["extrinsics"], r["extrinsics"], atol=1e-5)
    np.testing.assert_allclose(o["intrinsics"], r["intrinsics"], atol=1e-4)
    np.testing.assert_allclose(o["near_fars"], r["near_fars"], atol=1e-5)
    np.testing.assert_array_equal(o["view_ids"], r["view_ids"])
    assert o["scene"] == r["scene"]


def test_llff_gpnr_holdout_synthetic(tmp_path):
    from datasets.llff import MVSDatasetRealFF

    from matchnerf_tpu.data import LLFFDataset

    rng = np.random.default_rng(2)
    scene_dir = tmp_path / "fern"
    _make_llff_scene(scene_dir, rng, n=10)

    kwargs = dict(root_dir=str(tmp_path), split="test", n_views=3, img_wh=(32, 32),
                  eval_mode="gpnr", scene_list=["fern"])
    ref_ds = MVSDatasetRealFF(**kwargs)
    our_ds = LLFFDataset(**kwargs)
    assert len(ref_ds) == len(our_ds) == 2  # hold-out every 8th of 10 -> views 0, 8
    r, o = ref_ds[1], our_ds[1]
    np.testing.assert_allclose(o["images"].transpose(0, 3, 1, 2), r["images"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(o["extrinsics"], r["extrinsics"], atol=1e-5)
    np.testing.assert_allclose(o["near_fars"], r["near_fars"], atol=1e-5)
    np.testing.assert_allclose(o["c2ws_all"], r["c2ws_all"], atol=1e-5)


def test_dtu_getitem_parity_synthetic(tmp_path):
    """Full DTU __getitem__ on a synthetic MVSNet-layout scan (test split)."""
    from datasets.dtu import MVSDatasetDTU

    from matchnerf_tpu.data import DTUDataset

    rng = np.random.default_rng(3)
    root = tmp_path / "DTU"
    (root / "Cameras" / "train").mkdir(parents=True)
    scan = "scan1"
    (root / f"Rectified/{scan}_train").mkdir(parents=True)
    (root / f"Depths/{scan}").mkdir(parents=True)

    n = 8
    for vid in range(n):
        extr = _rand_extr(rng)
        intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]]) / 4.0
        intr[2, 2] = 1.0
        _write_mvsnet_cam(root / "Cameras/train" / f"{vid:08d}_cam.txt",
                          extr, intr, 425.0, 2.5)
        _save_img(root / f"Rectified/{scan}_train/rect_{vid+1:03d}_3_r5000.png",
                  rng, h=512, w=640)
        # 800x800 depth pfm
        depth = rng.uniform(400, 900, (800, 800)).astype(np.float32)
        with open(root / f"Depths/{scan}/depth_map_{vid:04d}.pfm", "wb") as f:
            f.write(b"Pf\n800 800\n-1.0\n")
            f.write(np.flipud(depth).tobytes())

    # meta dir with scene list + pairs
    meta = tmp_path / "meta"
    (meta / "dtu_meta").mkdir(parents=True)
    (meta / "dtu_meta" / "val_all.txt").write_text(f"{scan}\n")
    pairs = {"dtu_train": [0, 1, 2, 3, 4, 5], "dtu_test": [6, 7]}
    torch.save(pairs, str(meta / "pairs.th"))

    kwargs = dict(root_dir=str(root), split="test", n_views=3, img_wh=(64, 64),
                  test_views_method="nearest")
    ours = DTUDataset(**kwargs, meta_dir=str(meta))

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.makedirs("configs/dtu_meta", exist_ok=True)
        with open("configs/dtu_meta/val_all.txt", "w") as f:
            f.write(f"{scan}\n")
        torch.save(pairs, "configs/pairs.th")
        ref_ds = MVSDatasetDTU(**kwargs)
        assert len(ref_ds) == len(ours) == 2
        r, o = ref_ds[0], ours[0]
    finally:
        os.chdir(cwd)

    np.testing.assert_allclose(o["images"].transpose(0, 3, 1, 2), r["images"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(o["extrinsics"], r["extrinsics"], atol=1e-5)
    np.testing.assert_allclose(o["intrinsics"], r["intrinsics"], atol=1e-4)
    np.testing.assert_allclose(o["near_fars"], r["near_fars"], atol=1e-5)
    np.testing.assert_array_equal(o["view_ids"], r["view_ids"])
    np.testing.assert_allclose(o["depth"], r["depth"], atol=1e-5)
