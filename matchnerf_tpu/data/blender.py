"""NeRF-synthetic (Blender) test loader.

Re-implements datasets/blender.py:10-177: transforms_{train,test}.json,
blender->opencv axis flip, RGBA composited on white, shared intrinsics from
camera_angle_x, fixed near/far [2,6]. eval_mode 'mvsnerf' uses pairs.th view
ids over transforms_train; 'gpnr' uses the scene's own train/test files.
"""
from __future__ import annotations

import json
import os

import numpy as np

from .common import (BLENDER2OPENCV, MVSDatasetBase, load_image,
                     load_pairs_file, sort_nearest_views)
from .dtu import _META_DIR


class BlenderDataset(MVSDatasetBase):
    def __init__(self, root_dir, split, n_views=3, img_wh=None, max_len=-1,
                 scene_list=None, test_views_method="nearest", eval_mode="mvsnerf",
                 meta_dir=None, **kwargs):
        assert split == "test", 'Only support "test" split for blender dataset!'
        assert eval_mode in ("mvsnerf", "gpnr")
        if img_wh is not None:
            assert img_wh[0] % 32 == 0 and img_wh[1] % 32 == 0
        self.root_dir = root_dir
        self.n_views = n_views
        self.img_wh = img_wh
        self.max_len = max_len
        self.eval_mode = eval_mode

        if scene_list is None:
            scene_list = sorted(x for x in os.listdir(root_dir)
                                if os.path.isdir(os.path.join(root_dir, x)))
        pairs = load_pairs_file(os.path.join(meta_dir or _META_DIR, "pairs.th"))

        self.metas = []
        self.intrinsics, self.world2cams, self.cam2worlds = {}, {}, {}
        self.near_fars, self.imgs_paths = {}, {}
        for scene in scene_list:
            self._add_scene(scene, pairs, test_views_method)

    def get_name(self):
        return "blender"

    def num_samples(self):
        return len(self.metas)

    def _camera_info(self, scene, id_list, meta_filepath):
        with open(meta_filepath) as f:
            meta = json.load(f)
        w, h = self.img_wh
        focal = 0.5 * 800.0 / np.tan(0.5 * meta["camera_angle_x"]) * w / 800.0
        intr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
        for vid in id_list:
            key = f"{scene}_{vid}"
            frame_idx = vid if isinstance(vid, int) else int(str(vid).split("_")[-1])
            frame = meta["frames"][frame_idx]
            c2w = np.array(frame["transform_matrix"]) @ BLENDER2OPENCV
            self.intrinsics[key] = intr
            self.cam2worlds[key] = c2w
            self.world2cams[key] = np.linalg.inv(c2w)
            self.near_fars[key] = [2.0, 6.0]
            self.imgs_paths[key] = f"{frame['file_path']}.png"

    def _add_scene(self, scene, pairs, method):
        if self.eval_mode == "mvsnerf":
            train_views = list(pairs[f"{scene}_train"])
            test_views = list(pairs[f"{scene}_val"])
            self._camera_info(scene, train_views + test_views,
                              os.path.join(self.root_dir, scene, "transforms_train.json"))
        else:  # gpnr: the scene's own train/test splits
            def views_of(split_name):
                d = os.path.join(self.root_dir, scene, split_name)
                idxs = sorted({int(x.split(".")[0].split("_")[-1])
                               for x in os.listdir(d) if x.endswith("png")})
                return [f"{split_name}_{i}" for i in idxs]
            train_views = views_of("train")
            test_views = views_of("test")
            self._camera_info(scene, train_views,
                              os.path.join(self.root_dir, scene, "transforms_train.json"))
            self._camera_info(scene, test_views,
                              os.path.join(self.root_dir, scene, "transforms_test.json"))

        for target_view in test_views:
            src = sort_nearest_views(self.cam2worlds, train_views, target_view,
                                     scene=scene, method=method)
            self.metas.append((scene, target_view, src))

    def __getitem__(self, idx):
        scene, target_view, src_views = self.metas[idx]
        view_ids = [src_views[i] for i in range(self.n_views)] + [target_view]
        img_wh = np.array(self.img_wh).astype("int")

        imgs, intrinsics, w2cs, near_fars = [], [], [], []
        for vid in view_ids:
            key = f"{scene}_{vid}"
            imgs.append(load_image(os.path.join(self.root_dir, scene, self.imgs_paths[key]),
                                   img_wh, blend_alpha_white=True))
            intrinsics.append(self.intrinsics[key])
            w2cs.append(self.world2cams[key])
            near_fars.append(self.near_fars[key])

        int_ids = [int(str(v).split("_")[-1]) if not isinstance(v, (int, np.integer)) else int(v)
                   for v in view_ids]
        return {
            "images": np.stack(imgs).astype(np.float32),
            "extrinsics": np.stack(w2cs).astype(np.float32),
            "intrinsics": np.stack(intrinsics).astype(np.float32),
            "near_fars": np.stack(near_fars).astype(np.float32),
            "view_ids": np.array(int_ids),
            "scene": scene,
            "img_wh": img_wh,
        }
