"""Dataset loaders: parity vs the reference on the in-repo printer demo scene,
plus contract/collate checks with synthetic fixtures."""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference

install_reference()

DEMO_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "demo_data")


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="demo data missing")
def test_colmap_printer_parity():
    from datasets.colmap import MVSDatasetCOLMAP  # reference oracle

    from matchnerf_tpu.data import COLMAPDataset

    kwargs = dict(root_dir=DEMO_ROOT, split="test", n_views=3, img_wh=(96, 64),
                  max_len=-1, test_views_method="nearest", nf_mode="avg")
    ref_ds = MVSDatasetCOLMAP(**kwargs)
    our_ds = COLMAPDataset(**kwargs)
    assert len(ref_ds) == len(our_ds) == 1

    ref = ref_ds[0]
    ours = our_ds[0]
    # reference images are (V,3,H,W); ours are (V,H,W,3)
    np.testing.assert_allclose(ours["images"].transpose(0, 3, 1, 2),
                               ref["images"].numpy(), atol=1e-6)
    np.testing.assert_allclose(ours["extrinsics"], ref["extrinsics"], atol=1e-6)
    np.testing.assert_allclose(ours["intrinsics"], ref["intrinsics"], atol=1e-5)
    np.testing.assert_allclose(ours["near_fars"], ref["near_fars"], atol=1e-6)
    np.testing.assert_array_equal(ours["view_ids"], ref["view_ids"])
    np.testing.assert_allclose(ours["c2ws_all"], ref["c2ws_all"], atol=1e-6)
    assert ours["scene"] == ref["scene"]


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="demo data missing")
def test_colmap_printer_minmax_nf():
    from datasets.colmap import MVSDatasetCOLMAP

    from matchnerf_tpu.data import COLMAPDataset

    kwargs = dict(root_dir=DEMO_ROOT, split="test", n_views=3, img_wh=(96, 64),
                  nf_mode="minmax")
    ref = MVSDatasetCOLMAP(**kwargs)[0]
    ours = COLMAPDataset(**kwargs)[0]
    np.testing.assert_allclose(ours["near_fars"], ref["near_fars"], atol=1e-6)


def _make_blender_scene(tmp_path, scene="lego", n_frames=6):
    from PIL import Image

    rng = np.random.default_rng(0)
    scene_dir = tmp_path / scene
    scene_dir.mkdir()
    frames = []
    for i in range(n_frames):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.standard_normal(3)
        frames.append({"file_path": f"./train/r_{i}", "transform_matrix": c2w.tolist()})
        img_dir = scene_dir / "train"
        img_dir.mkdir(exist_ok=True)
        arr = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
        Image.fromarray(arr, "RGBA").save(img_dir / f"r_{i}.png")
    meta = {"camera_angle_x": 0.69, "frames": frames}
    with open(scene_dir / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return scene


def test_blender_parity_synthetic(tmp_path):
    """Blender loader parity on a synthetic scene with an mvsnerf-style pairs
    dict (ids into transforms_train)."""
    from datasets.blender import MVSDatasetBlender

    from matchnerf_tpu.data import BlenderDataset

    scene = _make_blender_scene(tmp_path)
    # plain lists so the reference's weights_only torch.load accepts them
    pairs = {f"{scene}_train": [0, 1, 2, 3], f"{scene}_val": [4, 5]}
    pairs_path = tmp_path / "pairs.th"
    torch.save(pairs, str(pairs_path))

    kwargs = dict(root_dir=str(tmp_path), split="test", n_views=3, img_wh=(32, 32),
                  scene_list=[scene])
    ours = BlenderDataset(**kwargs, meta_dir=str(tmp_path))

    # reference resolves 'configs/pairs.th' relative to cwd
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.makedirs("configs", exist_ok=True)
        torch.save(pairs, "configs/pairs.th")
        ref = MVSDatasetBlender(**kwargs)
        assert len(ref) == len(ours) == 2
        r, o = ref[1], ours[1]
    finally:
        os.chdir(cwd)

    np.testing.assert_allclose(o["images"].transpose(0, 3, 1, 2), r["images"].numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(o["extrinsics"], r["extrinsics"], atol=1e-6)
    np.testing.assert_allclose(o["intrinsics"], r["intrinsics"], atol=1e-5)
    np.testing.assert_allclose(o["near_fars"], r["near_fars"], atol=1e-6)
    np.testing.assert_array_equal(o["view_ids"], r["view_ids"])


def test_loader_collate_and_prefetch():
    from matchnerf_tpu.data.loader import DataLoader

    class ToyDS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2, 3), i, np.float32), "scene": f"s{i}"}

    dl = DataLoader(ToyDS(), batch_size=3, shuffle=False, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (3, 2, 3)
    assert batches[-1]["x"].shape == (1, 2, 3)
    assert batches[0]["scene"] == ["s0", "s1", "s2"]

    dl2 = DataLoader(ToyDS(), batch_size=3, shuffle=True, num_workers=2, seed=1)
    order_a = [b["scene"] for b in dl2]
    dl3 = DataLoader(ToyDS(), batch_size=3, shuffle=True, num_workers=2, seed=1)
    order_b = [b["scene"] for b in dl3]
    assert order_a == order_b  # same seed + epoch -> same order


def test_dtu_meta_parsing():
    """DTU view_pairs.txt parsing against the expected score-ranking."""
    from matchnerf_tpu.data.dtu import DTUDataset

    # only metadata parsing; point at nonexistent root but real meta files
    ds = object.__new__(DTUDataset)
    ds.split = "train"
    ds.val_light_idx = 3
    ds.val_view_idx = 24
    metas, id_list = DTUDataset._build_train_metas(
        ds,
        os.path.join("/root/repo/configs", "dtu_meta", "train_all.txt"),
        os.path.join("/root/repo/configs", "dtu_meta", "view_pairs.txt"))
    assert len(metas) > 0
    scan, light, ref, srcs = metas[0]
    assert light in range(7)
    assert ref == 0 and srcs[0] == 10  # first line of view_pairs.txt ranks 10 first
