"""Tanks and Temples test loader.

Re-implements datasets/tnt.py:11-217: MVSNet-style `cams_1/*_cam.txt` files,
translation and depth bounds scaled x500, intrinsics rescaled by the actual
image resize ratio, eval splits from pairs.th ('TNT_{scene}_train/val') or
gpnr hold-out, nf_mode avg/minmax. Includes the pair-dump utility
(`dump_tnt_pairs`, mirroring the module's __main__ block, tnt.py:191-217).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .common import (MVSDatasetBase, list_all_images, load_image, load_pairs_file,
                     make_near_fars, read_mvsnet_cam_file, sort_nearest_views)
from .dtu import _META_DIR


class TNTDataset(MVSDatasetBase):
    def __init__(self, root_dir, split, n_views=3, img_wh=None, max_len=-1,
                 scene_list=None, test_views_method="nearest", eval_mode="mvsnerf",
                 nf_mode="avg", meta_dir=None, **kwargs):
        assert split == "test", 'Only support "test" split for TNT dataset!'
        self.root_dir = root_dir
        self.n_views = n_views
        self.img_wh = img_wh
        self.max_len = max_len
        self.nf_mode = nf_mode
        self.eval_mode = eval_mode
        self.test_hold_out = 8
        self.scale_factor = 500.0

        if scene_list is None:
            scene_list = sorted(x for x in os.listdir(root_dir)
                                if os.path.isdir(os.path.join(root_dir, x)))
        pairs = (load_pairs_file(os.path.join(meta_dir or _META_DIR, "pairs.th"))
                 if eval_mode == "mvsnerf" else None)

        self.metas = []
        self.intrinsics, self.world2cams, self.cam2worlds = {}, {}, {}
        self.near_fars, self.imgs_paths = {}, {}
        for scene in scene_list:
            if eval_mode == "mvsnerf":
                train_views = list(pairs[f"TNT_{scene}_train"])
                test_views = list(pairs[f"TNT_{scene}_val"])
            else:
                n = len(list_all_images(os.path.join(root_dir, scene, "images")))
                test_views = list(range(0, n, self.test_hold_out))
                train_views = [x for x in range(n) if x not in test_views]
            self._camera_info(scene, [*train_views, *test_views])
            for target_view in test_views:
                src = sort_nearest_views(self.cam2worlds, train_views, target_view,
                                         scene=scene, method=test_views_method)
                self.metas.append((scene, target_view, src, train_views))

    def get_name(self):
        return "tnt"

    def num_samples(self):
        return len(self.metas)

    def _camera_info(self, scene, id_list):
        cameras_dir = os.path.join(self.root_dir, scene, "cams_1")
        for vid in id_list:
            key = f"{scene}_{vid}"
            intr, extr, depth_tokens = read_mvsnet_cam_file(
                os.path.join(cameras_dir, f"{vid:08d}_cam.txt"))
            extr[:3, 3] *= self.scale_factor
            self.intrinsics[key] = intr
            self.world2cams[key] = extr
            self.cam2worlds[key] = np.linalg.inv(extr.astype(np.float32))
            self.near_fars[key] = np.array([depth_tokens[0] * self.scale_factor,
                                            depth_tokens[-1] * self.scale_factor])
            self.imgs_paths[key] = f"{vid:08d}.jpg"

    def __getitem__(self, idx):
        scene, target_view, src_views, train_views = self.metas[idx]
        view_ids = [src_views[i] for i in range(self.n_views)] + [target_view]
        img_wh = np.array(self.img_wh).astype("int")

        imgs, intrinsics, w2cs, near_fars = [], [], [], []
        for vid in view_ids:
            key = f"{scene}_{vid}"
            path = os.path.join(self.root_dir, scene, "images", self.imgs_paths[key])
            with Image.open(path) as im:
                ori_w, ori_h = im.size
            imgs.append(load_image(path, img_wh))
            raw_intr = self.intrinsics[key].copy()
            raw_intr[0] *= img_wh[0] / ori_w        # tnt.py:160-163
            raw_intr[1] *= img_wh[1] / ori_h
            intrinsics.append(raw_intr)
            w2cs.append(self.world2cams[key])
            near_fars.append(self.near_fars[key])

        return {
            "images": np.stack(imgs).astype(np.float32),
            "extrinsics": np.stack(w2cs).astype(np.float32),
            "intrinsics": np.stack(intrinsics).astype(np.float32),
            "near_fars": make_near_fars(near_fars, len(view_ids), self.nf_mode),
            "view_ids": np.array([int(v) for v in view_ids]),
            "scene": scene,
            "img_wh": img_wh,
            "c2ws_all": np.stack([self.cam2worlds[f"{scene}_{x}"]
                                  for x in train_views]).astype(np.float32),
        }


def dump_tnt_pairs(dataset: TNTDataset, out_path: str = "tnt_pairs.th"):
    """Dump {scene: {target: [srcs]}} pairs like the reference's __main__
    (tnt.py:191-217)."""
    tnt_pairs = {}
    for i in range(len(dataset)):
        sample = dataset[i]
        scene = sample["scene"]
        ids = sample["view_ids"].tolist()
        tnt_pairs.setdefault(scene, {})[ids[-1]] = ids[:-1]
    import torch
    torch.save(tnt_pairs, out_path)
    return tnt_pairs
