"""Optical-flow geometry utilities (NHWC, functional JAX).

TPU-native equivalents of the GMFlow flow helpers the MatchNeRF runtime
itself never calls but the encoder family ships with
(/root/reference/models/gmflow/geometry.py:5-96,
 /root/reference/models/gmflow/utils.py:110-128): pixel coordinate grids,
flow-based warping, the UnFlow forward/backward occlusion check, and the
divisible-by-8 input padder. Provided for API completeness so encoder-side
tooling (flow visualization, occlusion masks, free-size inference) ports
over without touching torch.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from .grid_sample import grid_sample_2d


def coords_grid(b: int, h: int, w: int, homogeneous: bool = False) -> jnp.ndarray:
    """[B,H,W,2] (x, y) pixel grid; [B,H,W,3] with a ones row when
    homogeneous (geometry.py:5-21, NHWC instead of torch's [B,2,H,W])."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    stacks = [x, y]
    if homogeneous:
        stacks.append(jnp.ones_like(x))
    grid = jnp.stack(stacks, axis=-1)                        # [H,W,2|3]
    return jnp.broadcast_to(grid[None], (b, h, w, grid.shape[-1]))


def generate_window_grid(h_min, h_max, w_min, w_max, len_h: int, len_w: int):
    """[len_h, len_w, 2] linspace grid of (x, y) coords (geometry.py:24-32)."""
    x, y = jnp.meshgrid(jnp.linspace(w_min, w_max, len_w),
                        jnp.linspace(h_min, h_max, len_h), indexing="xy")
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def normalize_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Pixel coords [..., 2] -> [-1, 1] (geometry.py:35-38)."""
    c = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0], jnp.float32)
    return (coords - c) / c


def bilinear_sample(feature: jnp.ndarray, sample_coords: jnp.ndarray,
                    padding_mode: str = "zeros", return_mask: bool = False):
    """Sample [B,H,W,C] at pixel-scale coords [B,H,W,2]
    (geometry.py:41-62; align_corners=True)."""
    b, h, w, _ = sample_coords.shape
    x_grid = 2.0 * sample_coords[..., 0] / (w - 1) - 1.0
    y_grid = 2.0 * sample_coords[..., 1] / (h - 1) - 1.0
    grid = jnp.stack([x_grid, y_grid], axis=-1)
    out = grid_sample_2d(feature, grid, align_corners=True,
                         padding_mode=padding_mode)
    if return_mask:
        mask = ((x_grid >= -1) & (y_grid >= -1)
                & (x_grid <= 1) & (y_grid <= 1))             # [B,H,W]
        return out, mask
    return out


def flow_warp(feature: jnp.ndarray, flow: jnp.ndarray, mask: bool = False,
              padding_mode: str = "zeros"):
    """Warp [B,H,W,C] by flow [B,H,W,2] (geometry.py:65-72)."""
    b, h, w, _ = feature.shape
    grid = coords_grid(b, h, w) + flow
    return bilinear_sample(feature, grid, padding_mode=padding_mode,
                           return_mask=mask)


def forward_backward_consistency_check(fwd_flow: jnp.ndarray,
                                       bwd_flow: jnp.ndarray,
                                       alpha: float = 0.01,
                                       beta: float = 0.5):
    """UnFlow occlusion masks from flow consistency (geometry.py:75-96).

    fwd_flow/bwd_flow: [B,H,W,2] -> (fwd_occ, bwd_occ) float [B,H,W]."""
    flow_mag = (jnp.linalg.norm(fwd_flow, axis=-1)
                + jnp.linalg.norm(bwd_flow, axis=-1))
    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)
    diff_fwd = jnp.linalg.norm(fwd_flow + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd_flow + warped_fwd, axis=-1)
    threshold = alpha * flow_mag + beta
    return ((diff_fwd > threshold).astype(jnp.float32),
            (diff_bwd > threshold).astype(jnp.float32))


class InputPadder:
    """Pad NHWC images to a padding_factor multiple with edge replication
    (utils.py:110-128; 'sintel' centers the pad, else bottom-pads)."""

    def __init__(self, dims: Sequence[int], mode: str = "sintel",
                 padding_factor: int = 8):
        self.ht, self.wd = dims[-3:-1] if len(dims) >= 3 else dims[-2:]
        pad_ht = ((self.ht // padding_factor + 1) * padding_factor
                  - self.ht) % padding_factor
        pad_wd = ((self.wd // padding_factor + 1) * padding_factor
                  - self.wd) % padding_factor
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs: jnp.ndarray) -> List[jnp.ndarray]:
        l, r, t, b = self._pad
        return [jnp.pad(x, [(0, 0), (t, b), (l, r), (0, 0)], mode="edge")
                for x in inputs]

    def unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        ht, wd = x.shape[-3:-1]
        l, r, t, b = self._pad
        return x[..., t:ht - b, l:wd - r, :]
