"""Shared host-side data machinery for all dataset formats.

The device pipeline needs fixed-shape numpy batches with the uniform sample
contract established by the reference loaders (datasets/dtu.py:197-208):

    images      (V+1, H, W, 3) float32 in [0,1], target view LAST
    extrinsics  (V+1, 4, 4)    world-to-camera
    intrinsics  (V+1, 3, 3)
    near_fars   (V+1, 2)
    view_ids    (V+1,) int
    scene       str
    img_wh      (2,) int
    [depth]     (H, W) float32    — DTU eval masking
    [c2ws_all]  (N, 4, 4)         — spiral video paths

Note the TPU-native layout change: images are NHWC (channel-last), not the
reference's NCHW.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

IMAGE_EXTENSIONS = (".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG", ".ppm",
                    ".PPM", ".bmp", ".BMP", ".tif", ".TIF", ".tiff", ".TIFF")

BLENDER2OPENCV = np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                           [0, 0, -1, 0], [0, 0, 0, 1]], np.float64)


def list_all_images(root_dir: str) -> List[str]:
    """Sorted image filenames in a directory (misc/utils.py:265-275)."""
    return sorted(f for f in os.listdir(root_dir) if f.endswith(IMAGE_EXTENSIONS))


def load_image(path: str, img_wh, resample=Image.LANCZOS,
               blend_alpha_white: bool = False) -> np.ndarray:
    """Load + resize an image -> [H,W,3] float32 in [0,1].

    blend_alpha_white composites RGBA onto white like the Blender loader
    (datasets/blender.py:38-39)."""
    img = Image.open(path)
    img = img.resize(tuple(int(x) for x in img_wh), resample)
    arr = np.asarray(img, np.float32) / 255.0
    if blend_alpha_white and arr.ndim == 3 and arr.shape[-1] == 4:
        rgb, a = arr[..., :3], arr[..., 3:]
        arr = rgb * a + (1.0 - a)
    elif arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    return arr[..., :3]


def read_pfm(filename: str):
    """Portable-float-map reader (misc/utils.py:278-313)."""
    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dim_match = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode("utf-8"))
        if not dim_match:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), scale


def load_pairs_file(path: str) -> Dict:
    """Load the MVSNeRF `pairs.th` view-split file (torch-serialized dict of
    numpy arrays). Falls back to .npz if given."""
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=True))
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def sort_nearest_views(cam2worlds: Dict, train_views, target_view, scene: Optional[str] = None,
                       method: str = "nearest"):
    """Rank candidate source views by |camera center - target center|_1
    (shared logic of every loader, e.g. datasets/dtu.py:145-156)."""
    def key(v):
        return f"{scene}_{v}" if scene is not None else v

    if method == "nearest":
        pos = np.stack([np.asarray(cam2worlds[key(x)]) for x in train_views])[:, :3, 3]
        tgt = np.asarray(cam2worlds[key(target_view)])[:3, 3]
        dis = np.sum(np.abs(pos - tgt), axis=-1)
        return [train_views[i] for i in np.argsort(dis)]
    if method == "fixed":
        return list(train_views)
    raise ValueError(f"Unknown test_views_method [{method}]")


# --------------------- LLFF poses_bounds.npy processing ---------------------


def average_poses(poses: np.ndarray) -> np.ndarray:
    """[N,3,4] c2w -> average pose [3,4] (datasets/llff.py:16-44)."""
    center = poses[..., 3].mean(0)
    z = poses[..., 2].mean(0)
    z = z / np.linalg.norm(z)
    y_ = poses[..., 1].mean(0)
    x = np.cross(y_, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses: np.ndarray, blender2opencv: np.ndarray = BLENDER2OPENCV) -> np.ndarray:
    """Re-center c2w poses at the average pose (datasets/llff.py:47-68)."""
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = average_poses(poses)
    last_row = np.tile(np.array([0, 0, 0, 1]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    centered = np.linalg.inv(pose_avg_homo) @ poses_homo
    return (centered @ blender2opencv)[:, :3]


def load_llff_poses(meta_filepath: str, center: bool = True, scale_mult: float = 0.75):
    """Read poses_bounds.npy -> (poses [N,3,4] c2w opencv, bounds [N,2],
    hwf [N,3]). Scale so nearest depth ~ 1/scale_mult (llff.py:161-181)."""
    poses_bounds = np.load(meta_filepath)
    raw = poses_bounds[:, :15].copy().reshape(-1, 3, 5)
    hwf = raw[:, :, 4].copy()
    poses = np.concatenate([raw[..., 1:2], -raw[..., :1], raw[..., 2:4]], -1)
    if center:
        poses = center_poses(poses, BLENDER2OPENCV)
    else:
        poses = poses @ BLENDER2OPENCV
    bounds = poses_bounds[:, -2:].copy()
    scale_factor = bounds.min() * scale_mult
    bounds = bounds / scale_factor
    poses[..., 3] /= scale_factor
    return poses, bounds, hwf


def llff_intrinsic(hwf_row: np.ndarray, img_wh) -> np.ndarray:
    raw_h, raw_w, focal = hwf_row
    w, h = img_wh
    return np.array([[focal * w / raw_w, 0, w / 2],
                     [0, focal * h / raw_h, h / 2],
                     [0, 0, 1]], np.float64)


def read_mvsnet_cam_file(filename: str):
    """MVSNet-style cam file -> (intrinsic [3,3], extrinsic [4,4], depth line
    tokens) (datasets/dtu.py:108-121, datasets/tnt.py:127-139)."""
    with open(filename) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsic = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ").reshape(4, 4)
    intrinsic = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ").reshape(3, 3)
    depth_tokens = [float(x) for x in lines[11].split()]
    return intrinsic, extrinsic, depth_tokens


def make_near_fars(near_fars: List, n_views: int, nf_mode: str = "per_view") -> np.ndarray:
    """Combine per-view near/far into the sample's (V+1,2) array.

    per_view: keep as-is (DTU); avg: average across views (LLFF/IBRNet/COLMAP);
    minmax: [0.8*min, 1.2*max] (TnT/COLMAP option)."""
    nf = np.stack([np.asarray(x, np.float64) for x in near_fars])
    if nf_mode == "per_view":
        return nf.astype(np.float32)
    if nf_mode == "avg":
        return np.repeat(nf.mean(axis=0, keepdims=True), n_views, axis=0).astype(np.float32)
    if nf_mode == "minmax":
        row = np.array([nf.min() * 0.8, nf.max() * 1.2])
        return np.repeat(row[None], n_views, axis=0).astype(np.float32)
    raise ValueError(f"Unknown near far mode {nf_mode}")


class MVSDatasetBase:
    """Minimal dataset protocol: __len__, __getitem__, get_name()."""

    max_len: int = -1

    def get_name(self) -> str:
        raise NotImplementedError

    def num_samples(self) -> int:
        raise NotImplementedError

    def __len__(self):
        n = self.num_samples()
        return n if self.max_len <= 0 else min(self.max_len, n)
