"""Supercell block-union color gather + bilinear Pallas kernel (TPU).

The source-color term of the conditioning query samples every ray sample's
RGB from each source view at FULL image resolution
(/root/reference/models/matchnerf.py:244-250). The packed-u8 gather path
costs one gather index per (sample, view) — 3M indices per 8192-ray slice,
~7 ms on v5e even with coherent indices. At full resolution per-ray run
dedup is useless (consecutive depth samples land in distinct pixels), but
4x4-pixel SUPERCELLS restore the redundancy the feature kernels exploit:

- table: one row per supercell = its 5x5 pixel window (covers every
  bilinear tap of every sample falling in the supercell, including the +1
  taps that cross into the next supercell), u8 RGB, 80B/row in the
  sublane-aligned layout ch = a*16 + (b*3 + c) (a=window row, b=col,
  c=rgb; slots b*3+c = 15 are zero). 160x128x80 = 1.6MB/view at DTU
  shapes — comfortably inside the fast-gather residency window.
- per-ray supercell runs are ~S/4, and the 8 adjacent rays of a render
  block overlap heavily, so the per-block sorted-unique union is ~100-160
  rows: the gather drops from 8*S point-indices per (block, view) to <=ut
  row-indices (~6x fewer, and ~35% fewer bytes than the packed table).
- NO dilation pass is needed (unlike ops/pallas_block_banded.py): the 5x5
  window already contains all four taps, so the union is one sort+unique.

Kernel (per ray, per view): one-hot union match (ut,S) -> ONE MXU matmul
rows^T @ O = (80,S) window columns -> separable bilinear collapse: 5
broadcast-mults against wx (x taps live 16 sublanes apart — aligned
slices), an expanded wy mask at (16,S), and a constant (3,16) 0/1 matmul
for the final stride-3 channel reduce (sublane slices at stride 3 would
force Mosaic relayouts; a tiny MXU matmul is free).

Exactness: tap selection is integer supercell matching; the bilinear
weights are the same clip-then-floor stencil as ops/grid_sample.py, in the
separable (y-then-x) association. Border-clamped taps carry zero weight and
the table's edge padding replicates the clamped pixel, so edge cases are
exact. u8 values (<=255) are exact in bf16; accumulation is f32.

Forward-only (eval/video); training keeps the packed-table color path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import _unnormalize
from .pallas_block_banded import _sort_rows, _unique_compact

SC = 4                                   # supercell edge, in pixels
WIN = SC + 1                             # window edge (covers +1 taps)
ROW_CH = 16 * WIN                        # padded channels per table row
COLOR_UT_BUCKETS = (48, 64, 96, 128, 160, 192, 256, 320)


def bucket_color_ut(n: int) -> Optional[int]:
    for b in COLOR_UT_BUCKETS:
        if n <= b:
            return b
    return None


def build_supercell_colors(images_u8: jnp.ndarray) -> jnp.ndarray:
    """images_u8: [N,H,W,3] uint8 -> [N,Hs,Ws,ROW_CH] uint8 supercell table.

    Row (sy,sx) holds the WINxWIN pixel window starting at (SC*sy, SC*sx),
    edge-padded past the image border (replicating the border-clamp pixel),
    laid out ch = a*16 + (b*3 + c) with the b*3+c == 15 slot zeroed."""
    N, H, W, _ = images_u8.shape
    Hs, Ws = -(-H // SC), -(-W // SC)
    pad_h = Hs * SC + (WIN - SC) - H
    pad_w = Ws * SC + (WIN - SC) - W
    img = jnp.pad(images_u8, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                  mode="edge")
    rows = []
    for a in range(WIN):
        cols = [img[:, a:a + SC * Hs:SC, b:b + SC * Ws:SC, :]
                for b in range(WIN)]                     # WIN x [N,Hs,Ws,3]
        block = jnp.concatenate(cols, axis=-1)           # [N,Hs,Ws,3*WIN]
        block = jnp.pad(block, ((0, 0), (0, 0), (0, 0), (0, 1)))
        rows.append(block)                               # [N,Hs,Ws,16]
    return jnp.concatenate(rows, axis=-1)                # [N,Hs,Ws,80]


def _supercell_cells_weights(grid, H: int, W: int, align_corners: bool = True):
    """grid: [R,S,2] -> (cell_sc [R,S] i32, ty,tx [R,S] i32 in [0,SC),
    fy,fx [R,S] f32) — the sample's supercell and its in-window tap."""
    Ws = -(-W // SC)
    x = jnp.clip(_unnormalize(grid[..., 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(grid[..., 1], H, align_corners), 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = x0i // SC
    sy = y0i // SC
    return (sy * Ws + sx, y0i - sy * SC, x0i - sx * SC,
            fy.astype(jnp.float32), fx.astype(jnp.float32))


def color_union_size(grids_v, H: int, W: int, block_rays: int = 8):
    """Exact per-pose measurement: max sorted-unique supercell count over
    all ray blocks (no dilation — the window covers the taps). grids_v:
    [R,S,2] or [V,R,S,2] (a view axis batches into one sort; per-(view,
    block) maxima are preserved). One tiny dispatch per pose, like
    block_union_size."""
    cell, _, _, _, _ = _supercell_cells_weights(grids_v, H, W)
    S = cell.shape[-1]
    R = cell.shape[-2]
    NB = R // block_rays
    Hs, Ws = -(-H // SC), -(-W // SC)
    sentinel = Hs * Ws
    s1 = _sort_rows(cell.reshape(-1, block_rays * S))
    change = s1[:, 1:] != s1[:, :-1]
    n = 1 + jnp.sum(change.astype(jnp.int32), axis=-1)
    n_sent = jnp.sum((s1 >= sentinel).astype(jnp.int32), axis=-1)
    return jnp.max(n - jnp.minimum(n_sent, 1))


def _color_kernel(*refs, V: int, S: int, ut: int, block_rays: int,
                  blocks_per_step: int):
    """refs: V rows (BPS,ut,ROW_CH) u8, V unions (BPS,ut,1) i32, V ints
    (BPS,BR,3,S) i32 [cell_sc; ty; tx], V floats (BPS,BR,2,S) f32 [fy; fx],
    out (BPS,BR,16,S) f32 (channel 3v+c = view v color c; rows 3V.. zero)."""
    rows_refs = refs[:V]
    u_refs = refs[V:2 * V]
    i_refs = refs[2 * V:3 * V]
    f_refs = refs[3 * V:4 * V]
    out_ref = refs[4 * V]
    # constant selectors, built once per grid step
    w_iota5 = jax.lax.broadcasted_iota(jnp.int32, (WIN, S), 0)     # (5,S)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (16, S), 0)
    q_div3 = q_iota // 3                                            # q -> a
    sel_c = jax.lax.broadcasted_iota(jnp.int32, (3, 16), 0)
    sel_q = jax.lax.broadcasted_iota(jnp.int32, (3, 16), 1)
    # Sel3[c,q] = 1 iff q = a*3+c for some a < WIN
    sel3 = ((sel_q % 3 == sel_c) & (sel_q < 3 * WIN)).astype(jnp.float32)

    for nb in range(blocks_per_step):
        # Mosaic has no unsigned->float cast; hop uint8 -> int32 -> bf16
        rows = [rows_refs[v][nb].astype(jnp.int32).astype(jnp.bfloat16)
                for v in range(V)]
        unions = [u_refs[v][nb] for v in range(V)]                 # (ut,1)
        for b in range(block_rays):
            per_view = []
            for v in range(V):
                cell = i_refs[v][nb, b, 0:1]                       # (1,S)
                tyv = i_refs[v][nb, b, 1:2]
                txv = i_refs[v][nb, b, 2:3]
                fyv = f_refs[v][nb, b, 0:1]
                fxv = f_refs[v][nb, b, 1:2]
                O = (unions[v] == cell).astype(jnp.bfloat16)       # (ut,S)
                M = jax.lax.dot_general(
                    rows[v], O, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)            # (80,S)
                # y taps: window row a lives 16 sublanes apart (ch layout
                # a*16 + b*3 + c) — aligned slices
                wy = ((w_iota5 == tyv).astype(jnp.float32) * (1.0 - fyv)
                      + (w_iota5 == tyv + 1).astype(jnp.float32) * fyv)
                T = M[0:16] * wy[0:1]
                for aa in range(1, WIN):
                    T = T + M[16 * aa:16 * (aa + 1)] * wy[aa:aa + 1]
                # x taps: expand wx to the q = b*3+c axis (stride-3 sublane
                # slices would relayout; mask + one 0/1 matmul instead)
                wx_e = ((q_div3 == txv).astype(jnp.float32) * (1.0 - fxv)
                        + (q_div3 == txv + 1).astype(jnp.float32) * fxv)
                per_view.append(jnp.dot(sel3, T * wx_e,
                                        preferred_element_type=jnp.float32))
            zeros = jnp.zeros((16 - 3 * V, S), jnp.float32)
            out_ref[nb, b] = jnp.concatenate(per_view + [zeros], axis=0)


def supercell_color_sample(colors_sc, grids, img_h: int, img_w: int,
                           ut: int, block_rays: int = 8,
                           blocks_per_step: int = 2,
                           interpret: Optional[bool] = None,
                           lane_major: bool = False):
    """Sample per-view colors for every ray sample via the supercell kernel.

    colors_sc: [1,V,Hs,Ws,ROW_CH] uint8 (build_supercell_colors);
    grids: [V,1,R,S,2] in [-1,1]; img_h/img_w: the TRUE image size (the
    table rounds up to SC multiples; the clamp/weight math must not);
    ut: per-block union bucket (color_union_size + bucket_color_ut).
    Returns [V,1,R,S,3] f32 in [0,255] (callers apply the /255 dequant,
    mirroring the packed path) — or the kernel's native lane-major
    [R,16,S] (channel 3v+c = view v color c, rows 3V.. zero) when
    lane_major=True, skipping the two XLA transposes; the decoder
    megakernel slices the first 3V sublanes in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _, V, Hs, Ws, _ = colors_sc.shape
    assert Hs == -(-img_h // SC) and Ws == -(-img_w // SC), \
        (Hs, Ws, img_h, img_w)
    _, _, R, S, _ = grids.shape

    pad = (-R) % block_rays
    if pad:
        grids = jnp.pad(grids, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)),
                        mode="edge")
    Rp = R + pad
    NB = Rp // block_rays

    sentinel = Hs * Ws
    flat = colors_sc[0].reshape(V, Hs * Ws, ROW_CH)

    rows_l, u_l, ints_l, flts_l, cell_l = [], [], [], [], []
    for v in range(V):
        cell, ty, tx, fy, fx = _supercell_cells_weights(
            grids[v, 0], img_h, img_w)
        cell_l.append(cell.reshape(NB, block_rays * S))
        ints_l.append(jnp.stack([cell.reshape(NB, block_rays, S),
                                 ty.reshape(NB, block_rays, S),
                                 tx.reshape(NB, block_rays, S)], axis=2))
        flts_l.append(jnp.stack([fy.reshape(NB, block_rays, S),
                                 fx.reshape(NB, block_rays, S)], axis=2))
    # all V views share one batched sort + compaction (same supercell grid)
    u_all = _unique_compact(
        _sort_rows(jnp.concatenate(cell_l, axis=0)), ut, sentinel)
    for v in range(V):
        u = u_all[v * NB:(v + 1) * NB]
        rows = jnp.take_along_axis(
            flat[v], jnp.clip(u, 0, sentinel - 1).reshape(NB * ut)[:, None],
            axis=0, mode="promise_in_bounds").reshape(NB, ut, ROW_CH)
        u_l.append(u[..., None])
        rows_l.append(rows)

    bps = max(1, int(blocks_per_step))
    nb_pad = (-NB) % bps
    if nb_pad:
        rows_l = [jnp.pad(r, ((0, nb_pad), (0, 0), (0, 0))) for r in rows_l]
        u_l = [jnp.pad(u, ((0, nb_pad), (0, 0), (0, 0)), constant_values=-1)
               for u in u_l]
        ints_l = [jnp.pad(c, ((0, nb_pad), (0, 0), (0, 0), (0, 0)))
                  for c in ints_l]
        flts_l = [jnp.pad(w, ((0, nb_pad), (0, 0), (0, 0), (0, 0)))
                  for w in flts_l]
    NBp = NB + nb_pad

    kernel = functools.partial(_color_kernel, V=V, S=S, ut=ut,
                               block_rays=block_rays, blocks_per_step=bps)
    in_specs = (
        [pl.BlockSpec((bps, ut, ROW_CH), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((bps, ut, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((bps, block_rays, 3, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((bps, block_rays, 2, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NBp, block_rays, 16, S), jnp.float32),
        grid=(NBp // bps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bps, block_rays, 16, S),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*rows_l, *u_l, *ints_l, *flts_l)
    out = out.reshape(NBp * block_rays, 16, S)[:R]                 # [R,16,S]
    if lane_major:
        return out
    out = jnp.swapaxes(out, -1, -2)                                # [R,S,16]
    return jnp.moveaxis(
        out[..., :3 * V].reshape(R, S, V, 3), 2, 0)[:, None]       # [V,1,R,S,3]
