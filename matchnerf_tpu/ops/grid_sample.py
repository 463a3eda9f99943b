"""Bilinear grid sampling (torch `F.grid_sample` semantics) in pure XLA.

The reference's conditional-feature query bilinearly samples feature maps and
source images at projected ray points with `align_corners=True` and
`padding_mode='border'` (models/matchnerf.py:239-245, models/gmflow/utils.py:131-162).
PSNR parity hinges on reproducing those semantics exactly; this implements
them as vectorized gathers that XLA fuses well on TPU.

Layout note: features are NHWC (TPU-native), grids are [..., 2] in (x, y)
normalized [-1, 1] coordinates, matching the torch grid convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """Map [-1,1] -> pixel coordinates."""
    size_f = jnp.float32(size)
    if align_corners:
        return (coord + 1.0) * 0.5 * (size_f - 1.0)
    return ((coord + 1.0) * size_f - 1.0) * 0.5


def grid_sample_2d(feat, grid, align_corners: bool = True, padding_mode: str = "border"):
    """Sample `feat` [B,H,W,C] at `grid` [B,...,2] (x,y in [-1,1]) -> [B,...,C].

    Supported modes: bilinear interpolation with 'border' or 'zeros' padding.
    """
    B, H, W, C = feat.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 2)

    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        valid = None
    elif padding_mode == "zeros":
        # validity per-tap handled below
        valid = None
    else:
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        if padding_mode == "zeros":
            ok = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = feat.reshape(B, H * W, C)
        idx = yc * W + xc                                  # [B,N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B,N,C]
        if padding_mode == "zeros":
            vals = jnp.where(ok[..., None], vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
           + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])
    return out.reshape(out_shape)


def pack_2x2(feat):
    """Pack each pixel's 2x2 forward neighborhood into channels.

    feat [B,H,W,C] -> [B,H,W,4C] where the channel blocks are the bilinear
    taps (y0x0, y0x1, y1x0, y1x1) with edge replication — so a single row
    gather at (y0, x0) yields all four taps of border-clamped bilinear
    interpolation. TPU-native trade: 4x HBM for ~4x fewer gather indices in
    the render hot loop (gathers are per-index bound on TPU).
    """
    right = jnp.concatenate([feat[:, :, 1:], feat[:, :, -1:]], axis=2)
    down = jnp.concatenate([feat[:, 1:], feat[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.concatenate([feat, right, down, down_right], axis=-1)


def packed_rows_and_weights(packed, grid, align_corners: bool = True):
    """Gather the 2x2-packed rows + bilinear weights for each grid point.

    packed: [B,H,W,4C]; grid: [B,...,2]. Returns (rows [B,N,4C],
    wx [B,N,1], wy [B,N,1]) with N = prod(grid.shape[1:-1])."""
    B, H, W, C4 = packed.shape
    g = grid.reshape(B, -1, 2)

    x = jnp.clip(_unnormalize(g[..., 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(g[..., 1], H, align_corners), 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    idx = (y0.astype(jnp.int32) * W + x0.astype(jnp.int32))

    flat = packed.reshape(B, H * W, C4)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1,
                               mode="promise_in_bounds")          # [B,N,4C]
    return rows, wx, wy


def grid_sample_2d_packed(packed, grid, align_corners: bool = True):
    """Bilinear sample from a `pack_2x2` table with ONE gather per point.

    packed: [B,H,W,4C]; grid: [B,...,2] (x,y in [-1,1]); border padding only
    (the semantics the MatchNeRF query uses). Returns [B,...,C].
    """
    B, H, W, C4 = packed.shape
    C = C4 // 4
    out_shape = grid.shape[:-1] + (C,)
    rows, wx, wy = packed_rows_and_weights(packed, grid, align_corners)
    t00 = rows[..., 0 * C:1 * C]
    t01 = rows[..., 1 * C:2 * C]
    t10 = rows[..., 2 * C:3 * C]
    t11 = rows[..., 3 * C:4 * C]
    out = ((t00 * (1 - wx) + t01 * wx) * (1 - wy)
           + (t10 * (1 - wx) + t11 * wx) * wy)
    return out.reshape(out_shape)


def pack_int4_channels(q):
    """Nibble-pack biased int4 channel values into bytes.

    q: [..., C] int32 in [0, 15] (value + 8). Byte k packs channels
    (k, k + C/2): low nibble = channel k, high nibble = channel k + C/2 —
    so unpacking as concat(low_nibbles, high_nibbles) restores the original
    channel order. Returns [..., C/2] uint8."""
    C = q.shape[-1]
    assert C % 2 == 0
    half = C // 2
    return (q[..., :half] | (q[..., half:] << 4)).astype(jnp.uint8)


def unpack_int4_rows(rows, out_dtype=jnp.bfloat16):
    """Unpack `pack_int4_channels` tap rows gathered from a pack_2x2 table.

    rows: [..., 4*Cch] uint8 (4 tap blocks of Cch bytes). Returns
    [..., 4*2*Cch] with each tap block's channels restored to original order
    (value range [-8, 7]; dequant scales apply post-interpolation)."""
    *lead, C4p = rows.shape
    cch = C4p // 4
    r = rows.reshape(*lead, 4, cch).astype(jnp.int32)
    lo = (r & 15) - 8
    hi = (r >> 4) - 8
    un = jnp.concatenate([lo, hi], axis=-1)                        # [...,4,2Cch]
    return un.reshape(*lead, 8 * cch).astype(out_dtype)


def grid_sample_2d_packed_int4(packed, grid, align_corners: bool = True):
    """Bilinear sample from an int4 nibble-packed pack_2x2 table.

    packed: [B,H,W,4*Cch] uint8; grid: [B,...,2]. Returns [B,...,2*Cch]
    f32 in quantized units (multiply by the per-channel dequant scale)."""
    B, H, W, C4p = packed.shape
    C = C4p // 2                                   # logical channels per tap
    out_shape = grid.shape[:-1] + (C,)
    rows, wx, wy = packed_rows_and_weights(packed, grid, align_corners)
    vals = unpack_int4_rows(rows, out_dtype=jnp.float32)           # [B,N,4C]
    t00 = vals[..., 0 * C:1 * C]
    t01 = vals[..., 1 * C:2 * C]
    t10 = vals[..., 2 * C:3 * C]
    t11 = vals[..., 3 * C:4 * C]
    wx = wx.astype(vals.dtype)
    wy = wy.astype(vals.dtype)
    out = ((t00 * (1 - wx) + t01 * wx) * (1 - wy)
           + (t10 * (1 - wx) + t11 * wx) * wy)
    return out.reshape(out_shape)


def in_frustum_mask(grid):
    """Visibility mask: 1.0 where grid strictly inside (-1, 1) on both axes
    (models/matchnerf.py:248-250)."""
    inside = (grid > -1.0) & (grid < 1.0)
    return (inside[..., 0] & inside[..., 1]).astype(jnp.float32)


def sample_features_by_grid(feat, grid, align_corners=True, padding_mode="border",
                            local_radius: int = 0, local_dilation: int = 1):
    """Feature sampling with optional (2R+1)^2 local-neighborhood averaging
    (models/gmflow/utils.py:131-162). feat: [B,H,W,C]; grid: [B,R,S,2]."""
    if local_radius <= 0:
        return grid_sample_2d(feat, grid, align_corners=align_corners, padding_mode=padding_mode)

    B, H, W, C = feat.shape
    c = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0], jnp.float32)
    unnorm = grid.reshape(B, -1, 2) * c + c                         # [B,N,2]
    lh = lw = 2 * local_radius + 1
    wy, wx = jnp.meshgrid(
        jnp.arange(-local_radius, local_radius + 1, dtype=jnp.float32),
        jnp.arange(-local_radius, local_radius + 1, dtype=jnp.float32),
        indexing="ij")
    window = jnp.stack([wx, wy], axis=-1).reshape(-1, 2) * local_dilation  # [(2R+1)^2,2]
    samp = unnorm[:, :, None, :] + window[None, None, :, :]          # [B,N,K,2]
    c2 = jnp.array([(W + lw * local_dilation - 1) / 2.0,
                    (H + lh * local_dilation - 1) / 2.0], jnp.float32)
    norm = (samp - c2) / c2
    vals = grid_sample_2d(feat, norm, align_corners=align_corners, padding_mode=padding_mode)
    vals = vals.mean(axis=2)                                          # avg over window
    return vals.reshape(*grid.shape[:-1], C)
