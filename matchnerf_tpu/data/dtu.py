"""DTU (MVSNet-preprocessed) dataset loader.

Host-side numpy re-implementation of datasets/dtu.py:12-209: train/val metas
come from `configs/dtu_meta/view_pairs.txt` score-ranked source views over 7
light conditions (light 3 only for val/test); the test split uses
`configs/pairs.th` 16 train / 4 test views per scan ranked nearest; poses are
scaled by 1/200 with intrinsics x4; GT depth maps are loaded for eval masking.
"""
from __future__ import annotations

import os

import numpy as np

from .common import (MVSDatasetBase, load_image, read_mvsnet_cam_file,
                     load_pairs_file, read_pfm, sort_nearest_views)

_META_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "configs")


class DTUDataset(MVSDatasetBase):
    def __init__(self, root_dir, split, n_views=3, img_wh=None, downSample=1.0,
                 max_len=-1, test_views_method="nearest", n_add_train_views=2,
                 meta_dir=None, rng=None, **kwargs):
        assert split in ("train", "val", "test")
        if img_wh is not None:
            assert img_wh[0] % 32 == 0 and img_wh[1] % 32 == 0, \
                "img_wh must both be multiples of 32!"
        self.root_dir = root_dir
        self.split = split
        self.n_views = n_views
        self.img_wh = img_wh
        self.downSample = downSample
        self.scale_factor = 1.0 / 200
        self.max_len = max_len
        self.val_light_idx = 3
        self.val_view_idx = 24
        self.n_add_train_views = n_add_train_views
        self.permute_train_src = True
        self.rng = rng or np.random.default_rng(0)
        meta_dir = meta_dir or _META_DIR

        if split in ("train", "val"):
            scene_list_file = os.path.join(meta_dir, "dtu_meta", "train_all.txt")
            view_pairs_file = os.path.join(meta_dir, "dtu_meta", "view_pairs.txt")
            self.metas, id_list = self._build_train_metas(scene_list_file, view_pairs_file)
        else:
            scene_list_file = os.path.join(meta_dir, "dtu_meta", "val_all.txt")
            pairs = load_pairs_file(os.path.join(meta_dir, "pairs.th"))
            train_views, test_views = list(pairs["dtu_train"]), list(pairs["dtu_test"])
            id_list = [*train_views, *test_views]
        self._build_camera_info(np.unique(id_list))
        if split == "test":
            self.metas = self._build_test_metas(scene_list_file, train_views, test_views,
                                                method=test_views_method)

    def get_name(self):
        return "dtu"

    def num_samples(self):
        return len(self.metas)

    # ------------------------------ metadata --------------------------------

    def _build_train_metas(self, scene_list_file, view_pairs_file):
        with open(scene_list_file) as f:
            scans = [line.rstrip() for line in f if line.strip()]
        light_idxs = [self.val_light_idx] if self.split != "train" else range(7)

        # parse view_pairs.txt once: ref view -> score-ranked source views
        pairs = {}
        with open(view_pairs_file) as f:
            num_viewpoint = int(f.readline())
            for _ in range(num_viewpoint):
                ref_view = int(f.readline().rstrip())
                src_views = [int(x) for x in f.readline().rstrip().split()[1::2]]
                pairs[ref_view] = src_views

        metas, id_list = [], []
        for scan in scans:
            for ref_view, src_views in pairs.items():
                for light_idx in light_idxs:
                    if self.split == "val" and ref_view != self.val_view_idx:
                        continue
                    metas.append((scan, light_idx, ref_view, src_views))
                    id_list.append([ref_view] + src_views)
        return metas, id_list

    def _build_test_metas(self, scene_list_file, train_views, test_views, method):
        with open(scene_list_file) as f:
            scans = [line.rstrip() for line in f if line.strip()]
        metas = []
        for scan in scans:
            for target_view in test_views:
                src = sort_nearest_views(self.cam2worlds, train_views, target_view,
                                         method=method)
                metas.append((scan, 3, target_view, src))
        return metas

    def _build_camera_info(self, id_list):
        self.intrinsics, self.world2cams, self.cam2worlds, self.near_fars = {}, {}, {}, {}
        for vid in id_list:
            fname = os.path.join(self.root_dir, f"Cameras/train/{vid:08d}_cam.txt")
            intrinsic, extrinsic, depth_tokens = read_mvsnet_cam_file(fname)
            intrinsic[:2] *= 4 * self.downSample                 # dtu.py:96-97
            extrinsic[:3, 3] *= self.scale_factor
            depth_min = depth_tokens[0] * self.scale_factor
            depth_max = depth_min + depth_tokens[1] * 192 * self.scale_factor
            self.intrinsics[vid] = intrinsic
            self.world2cams[vid] = extrinsic
            self.cam2worlds[vid] = np.linalg.inv(extrinsic)
            self.near_fars[vid] = [depth_min, depth_max]

    # ------------------------------- samples --------------------------------

    def _read_depth(self, filename):
        """GT depth: 800^2 pfm -> x0.5 -> crop to 512x640 -> optional downsample
        (dtu.py:123-128)."""
        import cv2
        depth = np.array(read_pfm(filename)[0], dtype=np.float32)
        depth = cv2.resize(depth, None, fx=0.5, fy=0.5, interpolation=cv2.INTER_NEAREST)
        depth = depth[44:556, 80:720]
        if self.downSample != 1.0:
            depth = cv2.resize(depth, None, fx=self.downSample, fy=self.downSample,
                               interpolation=cv2.INTER_NEAREST)
        return depth

    def __getitem__(self, idx):
        from PIL import Image

        scan, light_idx, target_view, src_views = self.metas[idx]
        if self.permute_train_src and self.split == "train":
            # random top-(n+k) source subset, sorted (dtu.py:164-166)
            ids = np.sort(self.rng.permutation(
                self.n_views + self.n_add_train_views)[: self.n_views])
            view_ids = [src_views[i] for i in ids] + [target_view]
        else:
            view_ids = [src_views[i] for i in range(self.n_views)] + [target_view]

        img_wh = np.round(np.array(self.img_wh) * self.downSample).astype("int")
        imgs, intrinsics, w2cs, near_fars = [], [], [], []
        depth = None
        for vid in view_ids:
            img_filename = os.path.join(
                self.root_dir, f"Rectified/{scan}_train/rect_{vid + 1:03d}_{light_idx}_r5000.png")
            imgs.append(load_image(img_filename, img_wh, resample=Image.BILINEAR))
            intrinsics.append(self.intrinsics[vid])
            w2cs.append(self.world2cams[vid])
            near_fars.append(self.near_fars[vid])
            if self.split in ("test", "val") and vid == target_view:
                depth_filename = os.path.join(self.root_dir,
                                              f"Depths/{scan}/depth_map_{vid:04d}.pfm")
                assert os.path.exists(depth_filename), \
                    "Must provide depth for evaluating purpose."
                depth = self._read_depth(depth_filename) * self.scale_factor

        sample = {
            "images": np.stack(imgs).astype(np.float32),
            "extrinsics": np.stack(w2cs).astype(np.float32),
            "intrinsics": np.stack(intrinsics).astype(np.float32),
            "near_fars": np.stack(near_fars).astype(np.float32),
            "view_ids": np.array(view_ids),
            "scene": scan,
            "img_wh": img_wh,
        }
        if depth is not None:
            sample["depth"] = depth.astype(np.float32)
        return sample
