"""Image quality metrics: PSNR / SSIM / LPIPS + aggregation.

Re-implements the reference evaluation layer (misc/metrics.py:10-65,
misc/train_helpers.py:8-63) without the skimage/lpips dependencies:

- PSNR: numpy, mask-aware for DTU (pixels where GT depth == 0 are zeroed and
  excluded), else center-crop to 80% (metrics.py:29-41)
- SSIM: exact re-implementation of skimage `structural_similarity` defaults
  (win_size 7 uniform filter, K1/K2 0.01/0.03, sample covariance,
  data_range=2 for float inputs — the skimage float default the reference
  inherits, which the published numbers therefore use)
- LPIPS: VGG16-based perceptual distance in JAX; requires the torch `lpips`
  package's weight files to be importable/exported (zero-egress environments
  without weights get None + a one-time warning)
"""
from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

from .utils import log


def psnr(pred: np.ndarray, gt: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    """-10 log10(mse). mask: boolean array of pixels to EXCLUDE."""
    if mask is not None:
        mse = np.mean((pred[~mask] - gt[~mask]) ** 2)
    else:
        mse = np.mean((pred - gt) ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """2D uniform (box) filter matching scipy.ndimage.uniform_filter numerics
    for the interior (borders are cropped by SSIM anyway)."""
    from scipy.ndimage import uniform_filter
    return uniform_filter(x, size=size, mode="reflect")


def ssim(pred: np.ndarray, gt: np.ndarray, data_range: float = 2.0,
         win_size: int = 7, K1: float = 0.01, K2: float = 0.03) -> float:
    """Mean SSIM over channels, skimage-default-compatible.

    Note data_range defaults to 2.0: skimage infers that for float inputs,
    and the reference calls it without an explicit range (metrics.py:43-45),
    so the published numbers are computed this way.
    """
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]

    n = win_size * win_size
    cov_norm = n / (n - 1.0)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    pad = (win_size - 1) // 2

    vals = []
    for c in range(pred.shape[-1]):
        X, Y = pred[..., c], gt[..., c]
        ux = _uniform_filter(X, win_size)
        uy = _uniform_filter(Y, win_size)
        uxx = _uniform_filter(X * X, win_size)
        uyy = _uniform_filter(Y * Y, win_size)
        uxy = _uniform_filter(X * Y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
        B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


class _LPIPSUnavailable:
    warned = False


def lpips_vgg(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS(VGG). Uses the torch `lpips` package when importable (exactly the
    reference's metric); returns None when unavailable (no weights offline)."""
    try:
        from .lpips_jax import lpips_distance
        return lpips_distance(pred, gt)
    except Exception:
        pass
    try:
        import lpips  # noqa: F401
        import torch
        if not hasattr(lpips_vgg, "_net"):
            lpips_vgg._net = lpips.LPIPS(net="vgg")
        with torch.no_grad():
            p = torch.from_numpy(pred)[None].permute(0, 3, 1, 2).float() * 2 - 1.0
            g = torch.from_numpy(gt)[None].permute(0, 3, 1, 2).float() * 2 - 1.0
            return float(lpips_vgg._net(p, g).item())
    except Exception:
        if not _LPIPSUnavailable.warned:
            log.warn("LPIPS unavailable (no lpips package / VGG weights in this "
                     "environment); reporting NaN for LPIPS.")
            _LPIPSUnavailable.warned = True
        return None


class EvalTools:
    """Per-image metric computer matching the reference preprocessing:
    DTU-style depth masks zero out background; otherwise center-crop to 80%
    (metrics.py:20-33)."""

    support_metrics = ("PSNR", "SSIM", "LPIPS")

    def __init__(self, device=None):
        self.device = device

    def set_inputs(self, pred_img, gt_img, img_mask=None):
        self.full_pred, self.full_gt = pred_img, gt_img
        self.img_mask = img_mask
        if img_mask is not None:
            self.proc_pred = pred_img.copy()
            self.proc_gt = gt_img.copy()
            self.proc_pred[img_mask] = 0.0
            self.proc_gt[img_mask] = 0.0
        else:
            H_crop, W_crop = np.array(pred_img.shape[:2]) // 10
            self.proc_pred = pred_img[H_crop:-H_crop, W_crop:-W_crop]
            self.proc_gt = gt_img[H_crop:-H_crop, W_crop:-W_crop]

    def _compute(self, metric, pred, gt, use_mask):
        if metric == "PSNR":
            return psnr(pred, gt, self.img_mask if use_mask else None)
        if metric == "SSIM":
            return ssim(pred, gt)
        if metric == "LPIPS":
            v = lpips_vgg(pred, gt)
            return float("nan") if v is None else v
        raise ValueError(metric)

    def get_metrics(self, metrics=None, return_full=False) -> "OrderedDict[str, float]":
        out = OrderedDict()
        for metric in metrics or self.support_metrics:
            assert metric in self.support_metrics
            out[metric] = self._compute(metric, self.proc_pred, self.proc_gt,
                                        use_mask=self.img_mask is not None)
            if return_full:
                out[f"{metric}_Full"] = self._compute(metric, self.full_pred,
                                                      self.full_gt, use_mask=False)
        return out


def summarize_metrics(metrics: Dict, out_dir: str, it=None, ep=None) -> Dict:
    """Per-view -> per-scene -> per-dataset aggregation, appended to
    `0results_{dataset}.txt` (misc/train_helpers.py:8-48)."""
    head_info = ""
    if it is not None:
        head_info = f" at Iteration [{it}]"
    if ep is not None:
        head_info = f" at Epoch [{ep}]"

    dataset_metrics: Dict = {}
    for dataname, raw_metrics in metrics.items():
        dataset_metrics[dataname] = {}
        all_msgs = [f"------------ {dataname.upper()} Nearest 3{head_info} ------------"]
        cur_scene = ""
        scene_metrics: Dict = {}
        for view_id, view_metrics in raw_metrics.items():
            if view_id.split("_")[0] != cur_scene:
                if cur_scene != "":
                    scene_info = f"====> scene: {cur_scene},"
                    for k, v in scene_metrics.items():
                        scene_info += f" {k}: {float(np.array(v).mean())},"
                    all_msgs.append(scene_info)
                else:
                    dataset_metrics[dataname] = OrderedDict(
                        {k: [] for k in view_metrics.keys()})
                cur_scene = view_id.split("_")[0]
                scene_metrics = {k: [] for k in view_metrics.keys()}
            view_info = f"==> view: {view_id},"
            for k, v in view_metrics.items():
                view_info += f" {k}: {float(v)},"
                scene_metrics[k].append(v)
                dataset_metrics[dataname][k].append(v)
            all_msgs.append(view_info)
        data_info = f"======> {dataname.upper()}{head_info},"
        for k, v in dataset_metrics[dataname].items():
            data_info += f" {k}: {float(np.array(v).mean())},"
        all_msgs.append(data_info)
        if out_dir is not None:
            with open(os.path.join(out_dir, f"0results_{dataname}.txt"), "a+") as f:
                f.write("\n".join(all_msgs) + "\n")
    return dataset_metrics


def summarize_loss(loss: Dict, loss_weight: Dict) -> Dict:
    """Weight + sum losses with NaN/Inf asserts (train_helpers.py:51-63).
    Works on jax or numpy scalars."""
    loss_all = 0.0
    assert "all" not in loss
    for key in loss:
        assert key in loss_weight, f"unknown loss key {key}"
        if loss_weight[key] is not None:
            v = float(loss[key])
            assert not np.isinf(v), f"loss {key} is Inf"
            assert not np.isnan(v), f"loss {key} is NaN"
            loss_all = loss_all + float(loss_weight[key]) * loss[key]
    loss = dict(loss)
    loss["all"] = loss_all
    return loss
