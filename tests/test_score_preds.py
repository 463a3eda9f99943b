"""Offline scorer: pred/gt pair discovery, scoring, and 0scores.json output."""
import json
import os

import numpy as np


def test_score_preds_cli(tmp_path):
    from PIL import Image

    from matchnerf_tpu.score_preds import main

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    pred = np.clip(gt.astype(int) + rng.integers(-10, 10, gt.shape), 0, 255).astype(np.uint8)
    name = "scan1_view03_src00_01_02"
    Image.fromarray(pred).save(tmp_path / f"{name}_pred.png")
    Image.fromarray(gt).save(tmp_path / f"{name}_gt.png")
    # a pred without gt must be ignored
    Image.fromarray(pred).save(tmp_path / "orphan_pred.png")

    main([f"--pred_folder={tmp_path}"])

    with open(tmp_path / "0scores.json") as f:
        scores = json.load(f)
    assert "scan1" in scores and len(scores["scan1"]) == 1
    entry = scores["scan1"][0]
    assert entry["view_idx"] == 3
    assert entry["src_idx"] == [0, 1, 2]
    assert entry["metrics"]["PSNR"] > 25
    assert 0.5 < entry["metrics"]["SSIM"] <= 1.0
