"""Run-length-deduped ("banded") bilinear sampling from 2x2-packed tables.

The conditional-feature query's bottleneck is gathering a 4C-channel packed
row per (ray, sample, view, scale) — byte-bound on TPU (~60-150 GB/s
achieved, tools/bench_gather.py). Along a ray, consecutive depth samples
project to points on a straight epipolar segment whose integer cells repeat
and advance slowly, so most gathered rows are duplicates of the previous
sample's row.

This op gathers each ray's ≤Kt DISTINCT consecutive cells once ("taps") and
expands taps back to per-sample rows with a one-hot matmul that runs on the
MXU (measured 3-4x faster than the direct gather at DTU shapes). The
expansion is numerically EXACT — each output row equals exactly one gathered
row (single-1 one-hot; 0*x==0, 1*x==x in any float dtype) and the bilinear
combine reuses the packed-path formulas verbatim — PROVIDED each ray's cell
sequence has at most Kt runs. Callers guarantee that with
`banded_bound_from_endpoints`: for points in front of the camera (z>0) the
projected pixel path is monotone in x and y (Mobius function of depth), so
#distinct cells <= |dx|+|dy|+1 from the endpoint cells alone.

Reference semantics being reproduced: 48x `F.grid_sample` border-clamped
align_corners sampling, /root/reference/models/matchnerf.py:239-245.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grid_sample import _unnormalize


def _cells_and_weights(grid, H: int, W: int, align_corners: bool = True):
    """Identical cell/weight math to `packed_rows_and_weights` (parity)."""
    x = jnp.clip(_unnormalize(grid[..., 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(grid[..., 1], H, align_corners), 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    cell = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    return cell, wx, wy


def banded_sample_packed(packed, grid, kt: int, align_corners: bool = True,
                         dequant_scale=None):
    """Bilinear-sample a `pack_2x2` table with run-length tap dedup.

    packed: [B,H,W,4C]; grid: [B,R,S,2] (x,y in [-1,1]); kt: static max runs
    per ray (caller-verified). dequant_scale: optional [B,C] per-channel
    scale applied AFTER interpolation (int8 tables; interpolation is linear
    per channel so post-scaling is exact). Returns [B,R,S,C].
    """
    B, H, W, C4 = packed.shape
    C = C4 // 4
    _, R, S, _ = grid.shape
    cell, wx, wy = _cells_and_weights(grid, H, W, align_corners)     # [B,R,S]

    change = cell[..., 1:] != cell[..., :-1]
    rank = jnp.concatenate(
        [jnp.zeros((B, R, 1), jnp.int32),
         jnp.cumsum(change.astype(jnp.int32), axis=-1)], axis=-1)    # [B,R,S]
    rank = jnp.minimum(rank, kt - 1)   # caller guarantees no clamp in-bounds

    bb = jnp.arange(B)[:, None, None]
    rr = jnp.arange(R)[None, :, None]
    taps = jnp.zeros((B, R, kt), jnp.int32).at[bb, rr, rank].set(
        cell, mode="drop")                                           # [B,R,kt]

    flat = packed.reshape(B, H * W, C4)
    rows = jnp.take_along_axis(flat, taps.reshape(B, R * kt)[..., None],
                               axis=1, mode="promise_in_bounds")
    rows = rows.reshape(B, R, kt, C4)

    if rows.dtype == jnp.int8:
        rows = rows.astype(jnp.bfloat16)
    onehot = (rank[..., None] == jnp.arange(kt)[None, None, None]) \
        .astype(rows.dtype)                                          # [B,R,S,kt]
    rows4 = jnp.einsum("brsk,brkc->brsc", onehot, rows)              # exact

    t00 = rows4[..., 0 * C:1 * C]
    t01 = rows4[..., 1 * C:2 * C]
    t10 = rows4[..., 2 * C:3 * C]
    t11 = rows4[..., 3 * C:4 * C]
    wx = wx[..., None]
    wy = wy[..., None]
    out = ((t00 * (1 - wx) + t01 * wx) * (1 - wy)
           + (t10 * (1 - wx) + t11 * wx) * wy)
    if dequant_scale is not None:
        out = out * dequant_scale[:, None, None, :].astype(out.dtype)
    return out


KT_BUCKETS = (16, 24, 32, 48, 64, 96, 128)


def bucket_kt(bound: int, n_samples: int):
    """Round a per-ray run bound up to a compile bucket; None = use the
    direct gather (bound too large to profit)."""
    for b in KT_BUCKETS:
        if bound <= b and b < n_samples:
            return b
    return None


def banded_bound_from_endpoints(cell_near: np.ndarray, cell_far: np.ndarray,
                                z_ok: np.ndarray, W: int,
                                margin: int = 4):
    """Max distinct-cell bound over rays from endpoint cells (host-side).

    cell_near/cell_far: [.., ] int arrays of y0*W+x0 at the first/last depth
    sample; z_ok: bool, all sample depths strictly in front (monotone
    projection guarantee). Returns (bound, all_safe)."""
    xn, yn = cell_near % W, cell_near // W
    xf, yf = cell_far % W, cell_far // W
    steps = np.abs(xn - xf) + np.abs(yn - yf) + 1
    return int(steps.max(initial=1)) + margin, bool(np.all(z_ok))
