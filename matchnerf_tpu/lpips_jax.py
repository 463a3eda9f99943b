"""LPIPS (VGG) perceptual metric in JAX.

Re-implements the `lpips.LPIPS(net='vgg')` metric the reference uses for
evaluation (misc/metrics.py:16,47-52): VGG16 features at the 5 pre-pool ReLU
stages, channel-unit-normalized, squared-difference, 1x1 learned linear
weighting, spatial average, summed over stages.

Weights come from the torch `lpips` package (VGG16 backbone + LPIPS linear
heads) via `import_lpips_weights`, converted once to an .npz cache. In
zero-egress environments without those weights the module raises ImportError
and metrics.py falls back to reporting NaN.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "configs", "lpips_vgg_weights.npz")

# VGG16 conv plan: (out_channels, n_convs) per stage; features tapped after
# the last ReLU of each stage (torchvision VGG16 layer indices 3,8,15,22,29)
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def import_lpips_weights(out_path: str = _CACHE) -> str:
    """Extract VGG16 + LPIPS linear weights from the torch lpips package."""
    import lpips
    import torch

    net = lpips.LPIPS(net="vgg")
    arrays: Dict[str, np.ndarray] = {}
    convs = [m for m in net.net.slice1 + net.net.slice2 + net.net.slice3
             + net.net.slice4 + net.net.slice5
             if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(convs):
        arrays[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        arrays[f"lin{i}"] = lin.model[-1].weight.detach().numpy()[:, :, 0, 0][0]
    np.savez(out_path, **arrays)
    return out_path


def _load_weights() -> Dict[str, np.ndarray]:
    if not os.path.isfile(_CACHE):
        # try to generate from the lpips package
        import_lpips_weights(_CACHE)
    return dict(np.load(_CACHE))


_state: dict = {}


def _vgg_features(w, x):
    import jax
    import jax.numpy as jnp

    feats: List = []
    ci = 0
    h = x
    for stage, (ch, n) in enumerate(_VGG_PLAN):
        for _ in range(n):
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(w[f"conv{ci}_w"]), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(w[f"conv{ci}_b"])
            h = jnp.maximum(h, 0.0)
            ci += 1
        feats.append(h)
        if stage < len(_VGG_PLAN) - 1:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID")
    return feats


def lpips_distance(pred: np.ndarray, gt: np.ndarray) -> float:
    """pred/gt: [H,W,3] float in [0,1] -> scalar LPIPS(VGG) distance."""
    import jax
    import jax.numpy as jnp

    if "w" not in _state:
        _state["w"] = _load_weights()
    w = _state["w"]

    def run(a, b):
        def norm_input(x):
            x = x * 2.0 - 1.0                                  # [-1,1]
            return (x - _SHIFT) / _SCALE                       # lpips scaling layer
        fa = _vgg_features(w, norm_input(a)[None])
        fb = _vgg_features(w, norm_input(b)[None])
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # lpips.normalize_tensor: eps added OUTSIDE the sqrt
            na = xa / (jnp.sqrt((xa ** 2).sum(-1, keepdims=True)) + 1e-10)
            nb = xb / (jnp.sqrt((xb ** 2).sum(-1, keepdims=True)) + 1e-10)
            diff = (na - nb) ** 2
            lin = jnp.asarray(w[f"lin{i}"])                    # [C]
            total = total + (diff * lin).sum(-1).mean()
        return total

    if "fn" not in _state:
        _state["fn"] = jax.jit(run)
    return float(_state["fn"](jnp.asarray(pred, jnp.float32),
                              jnp.asarray(gt, jnp.float32)))
