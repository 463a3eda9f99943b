"""Offline re-scoring of saved prediction/GT image pairs.

Counterpart of misc/score_preds.py:13-103: scans a folder for
`*_pred.png`/`*_gt.png` pairs (written by `test.py` with separate_save),
recomputes PSNR/SSIM/LPIPS decoupled from the render path, and writes
`0scores.json`.

Usage: python -m matchnerf_tpu.score_preds --pred_folder=... [--gt_folder=...]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image

from .metrics import EvalTools


def list_pairs(pred_dir: str, gt_dir: str):
    pairs = []
    for f in sorted(os.listdir(pred_dir)):
        if not f.endswith("_pred.png"):
            continue
        base = f[: -len("_pred.png")]
        gt_path = os.path.join(gt_dir, base + "_gt.png")
        if os.path.exists(gt_path):
            pairs.append((os.path.join(pred_dir, f), gt_path))
    return pairs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_folder", type=str, required=True,
                        help="Path to folder with *_pred.png images")
    parser.add_argument("--gt_folder", type=str, default=None,
                        help="Path to folder with *_gt.png images")
    args = parser.parse_args(argv)

    eval_tools = EvalTools()
    scores_dict = {}
    avg_logger = {}

    for pred_path, gt_path in list_pairs(args.pred_folder,
                                         args.gt_folder or args.pred_folder):
        pred = np.asarray(Image.open(pred_path).convert("RGB"), np.float32) / 255.0
        gt = np.asarray(Image.open(gt_path).convert("RGB"), np.float32) / 255.0
        eval_tools.set_inputs(pred, gt)
        cur_metrics = eval_tools.get_metrics(return_full=False)
        for m, v in cur_metrics.items():
            avg_logger.setdefault(m, []).append(v)

        parts = os.path.basename(pred_path).split("_")
        scene_name = parts[0]
        try:
            view_idx = int(parts[1][4:])
            src_idx = [int(parts[2][3:]), int(parts[3]), int(parts[4])]
        except (IndexError, ValueError):
            view_idx, src_idx = -1, []
        scores_dict.setdefault(scene_name, []).append(
            {"view_idx": view_idx, "src_idx": src_idx,
             "metrics": {k: float(v) for k, v in cur_metrics.items()}})

    with open(os.path.join(args.pred_folder, "0scores.json"), "w") as f:
        json.dump(scores_dict, f)

    print(args.pred_folder)
    for m, vals in avg_logger.items():
        finite = [v for v in vals if np.isfinite(v)]
        print(m, float(np.mean(finite)) if finite else "n/a (no finite values)")


if __name__ == "__main__":
    main()
