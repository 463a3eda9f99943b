"""LPIPS(VGG) numerics: random-weight parity against a torch mirror.

The torch side reproduces the exact forward math of `lpips.LPIPS(net='vgg')`
(the package the reference evaluates with, /root/reference/misc/metrics.py:16):
scaling layer -> VGG16 relu{1_2,2_2,3_3,4_3,5_3} taps -> channel unit
normalization (eps outside the sqrt) -> squared diff -> 1x1 linear head ->
spatial average -> sum over stages. No downloaded weights needed: both sides
run the same random weights, catching transposition/normalization bugs.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from matchnerf_tpu import lpips_jax

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_lpips(weights, a, b):
    """a, b: [H,W,3] in [0,1] numpy. Mirrors lpips.LPIPS.forward exactly."""

    def vgg_feats(x):
        x = torch.from_numpy(np.ascontiguousarray(x)).permute(2, 0, 1)[None]
        x = x * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        feats, ci = [], 0
        for stage, (ch, n) in enumerate(lpips_jax._VGG_PLAN):
            for _ in range(n):
                w = torch.from_numpy(
                    weights[f"conv{ci}_w"].transpose(3, 2, 0, 1).copy())
                bias = torch.from_numpy(weights[f"conv{ci}_b"])
                x = F.relu(F.conv2d(x, w, bias, padding=1))
                ci += 1
            feats.append(x)
            if stage < len(lpips_jax._VGG_PLAN) - 1:
                x = F.max_pool2d(x, 2, 2)
        return feats

    fa, fb = vgg_feats(a), vgg_feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (torch.sqrt((xa ** 2).sum(1, keepdim=True)) + 1e-10)
        nb = xb / (torch.sqrt((xb ** 2).sum(1, keepdim=True)) + 1e-10)
        diff = (na - nb) ** 2
        lin = torch.from_numpy(weights[f"lin{i}"]).view(1, -1, 1, 1)
        total = total + (diff * lin).sum(1).mean()
    return float(total)


def _random_lpips_weights(rng):
    weights = {}
    in_ch, ci = 3, 0
    for ch, n in lpips_jax._VGG_PLAN:
        for _ in range(n):
            weights[f"conv{ci}_w"] = rng.normal(
                0, 0.08, (3, 3, in_ch, ch)).astype(np.float32)   # HWIO
            weights[f"conv{ci}_b"] = rng.normal(0, 0.02, ch).astype(np.float32)
            in_ch, ci = ch, ci + 1
    for i, (ch, _) in enumerate(lpips_jax._VGG_PLAN):
        weights[f"lin{i}"] = np.abs(rng.normal(0, 1, ch)).astype(np.float32)
    return weights


def test_lpips_random_weight_parity(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    weights = _random_lpips_weights(rng)
    cache = tmp_path / "lpips_rand.npz"
    np.savez(cache, **weights)

    monkeypatch.setattr(lpips_jax, "_CACHE", str(cache))
    monkeypatch.setattr(lpips_jax, "_state", {})

    H, W = 40, 48
    a = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.12, a.shape).astype(np.float32), 0, 1)

    got = lpips_jax.lpips_distance(a, b)
    want = _torch_lpips(weights, a, b)
    assert got == pytest.approx(want, rel=2e-5, abs=2e-6)

    # identical images -> exactly zero distance on both sides
    same = lpips_jax.lpips_distance(a, a.copy())
    assert same == pytest.approx(0.0, abs=1e-7)

    # black-vs-image exercises the near-zero-norm eps path
    z = np.zeros_like(a)
    got_z = lpips_jax.lpips_distance(z, b)
    want_z = _torch_lpips(weights, z, b)
    assert got_z == pytest.approx(want_z, rel=2e-5, abs=2e-6)


def test_lpips_scores_through_eval_tools_and_scorer(tmp_path, monkeypatch):
    """End-to-end: with a weights npz present, LPIPS flows through EvalTools
    (the engine's per-view metric path) and the offline scorer instead of the
    NaN gate — the exact plumbing a user with real VGG weights exercises
    (reference misc/metrics.py:47-52, misc/score_preds.py)."""
    import imageio.v2 as imageio

    from matchnerf_tpu.metrics import EvalTools

    rng = np.random.default_rng(7)
    weights = _random_lpips_weights(rng)
    cache = tmp_path / "lpips_rand.npz"
    np.savez(cache, **weights)
    monkeypatch.setattr(lpips_jax, "_CACHE", str(cache))
    monkeypatch.setattr(lpips_jax, "_state", {})

    H, W = 40, 48
    gt = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.1, gt.shape).astype(np.float32), 0, 1)

    tools = EvalTools()
    tools.set_inputs(pred, gt)
    m = tools.get_metrics()
    assert np.isfinite(m["LPIPS"]) and m["LPIPS"] > 0
    want = _torch_lpips(weights, tools.proc_pred, tools.proc_gt)
    assert m["LPIPS"] == pytest.approx(want, rel=2e-5, abs=2e-6)

    # offline scorer picks it up from saved pred/gt pairs
    pdir = tmp_path / "preds"
    pdir.mkdir()
    imageio.imwrite(pdir / "scan1_00_pred.png",
                    (pred * 255).round().astype(np.uint8))
    imageio.imwrite(pdir / "scan1_00_gt.png",
                    (gt * 255).round().astype(np.uint8))
    import json

    from matchnerf_tpu import score_preds
    score_preds.main(["--pred_folder", str(pdir)])
    with open(pdir / "0scores.json") as f:
        scores = json.load(f)
    lp = scores["scan1"][0]["metrics"]["LPIPS"]
    assert np.isfinite(lp) and lp > 0
