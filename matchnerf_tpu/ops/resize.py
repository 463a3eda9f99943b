"""Image/feature-map resizing primitives (NHWC).

Covers the interpolation modes the reference relies on:
- `nn.Upsample(scale_factor=2)` (nearest) and bilinear align_corners=False x2
  in the feature upsampler (models/gmflow/superres.py:14-15)
- `F.interpolate(..., align_corners=True)` for the ibrnet 756x1008 -> 768x1024
  inference resize (models/gmflow/gmflow.py:100-103)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_2d


def upsample_nearest_x2(x):
    """[B,H,W,C] -> [B,2H,2W,C] nearest-neighbor (floor convention, matches torch)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def upsample_bilinear_x2(x):
    """[B,H,W,C] -> [B,2H,2W,C] bilinear, half-pixel centers (align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="linear")


def resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """[B,H,W,C] -> [B,out_h,out_w,C] bilinear with align_corners=True.

    jax.image.resize only offers half-pixel conventions, so express the
    align_corners sampling lattice via grid_sample (which already implements
    the align_corners=True mapping exactly)."""
    B = x.shape[0]
    gy = jnp.linspace(-1.0, 1.0, out_h) if out_h > 1 else jnp.zeros((1,))
    gx = jnp.linspace(-1.0, 1.0, out_w) if out_w > 1 else jnp.zeros((1,))
    GY, GX = jnp.meshgrid(gy, gx, indexing="ij")
    grid = jnp.stack([GX, GY], axis=-1)[None]                      # [1,oh,ow,2]
    grid = jnp.broadcast_to(grid, (B, out_h, out_w, 2))
    return grid_sample_2d(x, grid, align_corners=True, padding_mode="border")
