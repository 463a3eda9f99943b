"""Block-banded gather + interp + grouped-cosine Pallas megakernel (TPU).

Second-generation eval query kernel (supersedes ops/pallas_banded.py where
poses allow). Two observations about the DTU eval workload drive it:

1. Adjacent rays in a render slice are adjacent image pixels, and their
   epipolar bands overlap ~90%: per-ray dedup (pallas_banded) still gathers
   each hot table row ~5-8 times per 8-ray block. Dedup at BLOCK granularity
   cuts gather indices ~3x and bytes ~10x.
2. The 2x2 tap packing (grid_sample.pack_2x2) quadruples the table so one
   row holds all four bilinear taps. With a block-level DILATED band (the
   run cells plus their +1/+w/+w+1 neighbors) every tap of every sample is
   already in the gathered union, so the table can stay UNPACKED — 4x
   smaller (the scale-1 table drops from 21MB to 5.2MB per view, back into
   the fast-gather residency window; tools/bench_gather.py sweep H) — and
   the four tap matmuls collapse into ONE one-hot matmul whose weights fold
   the full bilinear stencil.

Pipeline (per view, per scale):
  XLA:    per-ray run dedup (<=kt cells) -> per-block sort/unique of the
          8 rays' runs -> dilate {c, c+1, c+w, c+w+1} -> sort/unique to the
          <=ut block union -> ONE coherent gather rows[NB, ut, Cc]
  Pallas: one-hot W[ut,S] built from integer cell matches (the +1 taps are
          sublane rolls of the +0 taps: a dilated union is sorted-unique, so
          pos(c+1) == pos(c)+1 whenever both are present), ONE MXU matmul
          rows^T @ W per (ray, view), dequant, grouped cosine in VMEM.

Exactness: tap selection is integer cell matching; bilinear weights are the
same folded stencil as the direct path. Border-clamped taps carry zero
bilinear weight by construction (clip then floor), so clamp edge cases add
zeros. bf16/int8 tables run the matmul in bf16 (below table quantization
error); f32 tables in f32.

Reference semantics: models/matchnerf.py:209-293 (48x F.grid_sample + the
grouped cosine), re-planned around TPU gather/MXU economics.

Forward-only (eval/video); training uses banded_cosine_scale_trainable.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import _unnormalize

UT_BUCKETS = (64, 96, 128, 160, 192, 256, 320, 384, 512)


def bucket_ut(n: int) -> Optional[int]:
    """Round a measured block-union size up to a compile bucket (None when
    the union is too wide for the kernel to pay off)."""
    for b in UT_BUCKETS:
        if n <= b:
            return b
    return None


def _cells_weights4(grid, H: int, W: int, align_corners: bool = True):
    """grid: [R,S,2] -> (cell [R,S] i32 of the (y0,x0) tap, c10 [R,S] i32 of
    the y-clamped (y1,x0) tap, w4 [R,4,S] f32 folded bilinear weights —
    already in the kernel's (taps, S-lanes) layout so the caller's reshape
    splits leading dims only, no transpose copy)."""
    x = jnp.clip(_unnormalize(grid[..., 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(grid[..., 1], H, align_corners), 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    cell = y0i * W + x0i
    c10 = jnp.minimum(y0i + 1, H - 1) * W + x0i
    w4 = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                    (1 - wx) * wy, wx * wy], axis=1)
    return cell, c10, w4


def _runs_from_cells(cell, kt: int):
    """Per-ray run dedup (same trick as pallas_banded._cells_ranks_weights).
    cell: [R,S] -> taps [R,kt] i32 (tail repeats a real cell; harmless)."""
    change = cell[:, 1:] != cell[:, :-1]
    rank = jnp.concatenate(
        [jnp.zeros((cell.shape[0], 1), jnp.int32),
         jnp.cumsum(change.astype(jnp.int32), axis=-1)], axis=-1)
    rank = jnp.minimum(rank, kt - 1)
    onehot_k = rank[:, :, None] == jnp.arange(kt)[None, None, :]
    return jnp.max(jnp.where(onehot_k, cell[:, :, None], 0), axis=1)


def _sort_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Unstable single-operand row sort. `jnp.sort` defaults to stable=True,
    which XLA:TPU lowers to a key-value co-sort against an iota tiebreaker —
    double the sorted bytes for nothing when the rows are bare integers
    (device trace 2026-08-19: the six [3072,1024] stable union sorts cost
    ~3.4 ms/slice)."""
    return jax.lax.sort(x, dimension=x.ndim - 1, is_stable=False)


def _unique_compact(sorted_vals, cap: int, sentinel: int):
    """sorted_vals: [NB, L] ascending (sentinel-padded). Returns [NB, cap]
    sorted unique values with unused slots = -1.

    Compaction by masked re-sort: duplicates and sentinels are overwritten
    with the sentinel and ONE single-array sort floats the unique values
    (already ascending) into the leading slots — half the bandwidth of a
    key-value co-sort, and searchsorted is unusable (it lowers to serial
    while-loops on TPU; sorts are native)."""
    NB, L = sorted_vals.shape
    is_first = jnp.concatenate(
        [jnp.ones((NB, 1), bool),
         sorted_vals[:, 1:] != sorted_vals[:, :-1]], axis=-1)
    keep = is_first & (sorted_vals < sentinel)
    vals = _sort_rows(jnp.where(keep, sorted_vals, sentinel))[:, :cap]
    return jnp.where(vals < sentinel, vals, -1)                    # [NB,cap]


def block_union_cells(taps_runs, block_rays: int, ut: int, H: int, W: int):
    """taps_runs: [R, L] per-ray cells (raw per-sample cells [R,S] or
    run-compressed taps [R,kt] — same unique set) -> [NB, ut] sorted-unique
    dilated block union (-1 padded), NB = R/block_rays. The dilation {c, c+1,
    c+w, c+w+1} guarantees every bilinear tap of every sample is in the
    union."""
    R, kt = taps_runs.shape
    NB = R // block_rays
    sentinel = H * W
    blk = taps_runs.reshape(NB, block_rays * kt)
    u1 = _unique_compact(_sort_rows(blk), ut, sentinel)
    u1s = jnp.where(u1 < 0, sentinel, u1)
    dil = jnp.concatenate(
        [u1s, jnp.minimum(u1s + 1, sentinel),
         jnp.minimum(u1s + W, sentinel), jnp.minimum(u1s + W + 1, sentinel)],
        axis=-1)                                                   # [NB,4ut]
    return _unique_compact(_sort_rows(dil), ut, sentinel)


def _dilated_union_max(blk, W: int, sentinel: int):
    """blk: [NB, L] per-block cells (sentinel marks padding). Max over
    blocks of |unique(dilate(cells))| with the {c, c+1, c+W, c+W+1}
    dilation — the exact size `block_union_cells` would need."""

    def n_unique(sorted_vals):
        change = sorted_vals[:, 1:] != sorted_vals[:, :-1]
        n = 1 + jnp.sum(change.astype(jnp.int32), axis=-1)
        n_sent = jnp.sum((sorted_vals >= sentinel).astype(jnp.int32), axis=-1)
        return n - jnp.minimum(n_sent, 1)      # sentinel block counts once

    s1 = _sort_rows(blk)
    # dilate the raw sorted cells (no intermediate cap: exact)
    dil = jnp.concatenate(
        [s1, jnp.minimum(s1 + 1, sentinel), jnp.minimum(s1 + W, sentinel),
         jnp.minimum(s1 + W + 1, sentinel)], axis=-1)
    return jnp.max(n_unique(_sort_rows(dil)))


def block_union_size(grids_v, H: int, W: int, kt: int, block_rays: int = 8):
    """Exact per-pose measurement: max dilated block-union size over all ray
    blocks for one view's grids [R,S,2]. Jit once per shape; the renderer
    buckets the result into `ut` (one tiny device dispatch per pose,
    amortized over every slice of the image)."""
    cell, _, _ = _cells_weights4(grids_v, H, W)
    taps = _runs_from_cells(cell, kt)
    R = taps.shape[0]
    NB = R // block_rays
    return _dilated_union_max(taps.reshape(NB, block_rays * kt), W, H * W)


def block_union_size_raw(grids_v, H: int, W: int, block_rays: int = 8):
    """`block_union_size` without the per-ray run compression: unions the
    RAW per-sample cells — exactly the set `block_banded_cosine_scale`
    builds its unions from (run dedup only drops consecutive repeats, so
    the unique set is identical), with no kt dependence and no [R,S,kt]
    one-hot. grids_v: [R,S,2] or [V,R,S,2] (a view axis batches into one
    sort; per-(view, block) maxima are preserved)."""
    cell, _, _ = _cells_weights4(grids_v, H, W)      # [..., R, S]
    S = cell.shape[-1]
    R = cell.shape[-2]
    NB = R // block_rays
    blk = cell.reshape(-1, block_rays * S)           # [(V*)NB, 8S]
    return _dilated_union_max(blk, W, H * W)


def _block_cosine_kernel(*refs, V: int, S: int, ut: int, Cc: int,
                         chunk_c: int, n_groups: int, pairs,
                         block_rays: int, compute_dtype,
                         blocks_per_step: int = 1):
    """refs: V rows refs (BPS,ut,Cc), V union refs (BPS,ut,1) i32, V cell
    refs (BPS,BR,2,S) i32, V weight refs (BPS,BR,4,S) f32, scale_ref
    (V,Cc,1) f32, out_ref (BPS,BR,G,S) f32. BPS 8-ray blocks (each with its
    own union) are processed per grid step to amortize grid overhead."""
    rows_refs = refs[:V]
    u_refs = refs[V:2 * V]
    cell_refs = refs[2 * V:3 * V]
    w_refs = refs[3 * V:4 * V]
    scale_ref, out_ref = refs[4 * V], refs[4 * V + 1]
    Cg = chunk_c // n_groups
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 1)
    sel = (c_iota // Cg == g_iota).astype(jnp.float32)             # (G,chunk)

    for nb in range(blocks_per_step):
        rows = [rows_refs[v][nb].astype(compute_dtype) for v in range(V)]
        unions = [u_refs[v][nb] for v in range(V)]                 # (ut,1) i32

        for b in range(block_rays):
            interp = []
            for v in range(V):
                c00 = cell_refs[v][nb, b, 0:1]                     # (1,S) i32
                c10 = cell_refs[v][nb, b, 1:2]
                wv = w_refs[v][nb, b]                              # (4,S) f32
                u = unions[v]                                      # (ut,1)
                o00 = (u == c00).astype(jnp.float32)               # (ut,S)
                o10 = (u == c10).astype(jnp.float32)
                # sorted-unique union: pos(c+1) == pos(c)+1 when both
                # present, so the x+1 taps are sublane rolls (clamped taps
                # carry zero bilinear weight, so stray rolls add zeros)
                o01 = pltpu.roll(o00, 1, 0)
                o11 = pltpu.roll(o10, 1, 0)
                Wmat = (o00 * wv[0:1] + o01 * wv[1:2]
                        + o10 * wv[2:3] + o11 * wv[3:4])           # (ut,S)
                acc = jax.lax.dot_general(
                    rows[v], Wmat.astype(compute_dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)            # (Cc,S)
                interp.append(acc * scale_ref[v])

            acc_pairs = None
            for (i, j) in pairs:
                ca, cb = j - 1, i
                fa = interp[i][ca * chunk_c:(ca + 1) * chunk_c]    # (chunk,S)
                fb = interp[j][cb * chunk_c:(cb + 1) * chunk_c]
                dots = jnp.dot(sel, fa * fb,
                               preferred_element_type=jnp.float32)
                na2 = jnp.dot(sel, fa * fa,
                              preferred_element_type=jnp.float32)
                nb2 = jnp.dot(sel, fb * fb,
                              preferred_element_type=jnp.float32)
                na = jnp.maximum(jnp.sqrt(na2), 1e-8)              # (G,S)
                nbn = jnp.maximum(jnp.sqrt(nb2), 1e-8)
                cosg = dots / (na * nbn)
                acc_pairs = cosg if acc_pairs is None else acc_pairs + cosg
            out_ref[nb, b] = acc_pairs / len(pairs)                # (G,S)


def _block_cosine_bwd_kernel(*refs, V: int, S: int, ut: int, Cc: int,
                             chunk_c: int, n_groups: int, pairs,
                             block_rays: int):
    """Backward of the block-banded cosine query w.r.t. the gathered union
    rows. refs: V rows (1,ut,Cc) f32, V unions (1,ut,1) i32, V cells
    (1,BR,2,S) i32, V weights (1,BR,4,S) f32, g (1,BR,G,S) f32 cotangent,
    then V outputs d_rows (1,ut,Cc) f32.

    Recomputes the one-hot stencils and interpolations (cheaper than saving
    [R,S,Cc] residuals), applies the shared analytic grouped-cosine backward
    (ops/pallas_banded._grouped_cosine_bwd), and pushes each ray's d_interp
    back through its stencil matmul, accumulating per-union-row gradients
    across the block's rays."""
    from .pallas_banded import _grouped_cosine_bwd

    rows_refs = refs[:V]
    u_refs = refs[V:2 * V]
    cell_refs = refs[2 * V:3 * V]
    w_refs = refs[3 * V:4 * V]
    g_ref = refs[4 * V]
    out_refs = refs[4 * V + 1:]
    Cg = chunk_c // n_groups
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 1)
    sel = (c_iota // Cg == g_iota).astype(jnp.float32)             # (G,chunk)
    selT = sel.T

    rows = [rows_refs[v][0] for v in range(V)]                     # (ut,Cc) f32
    unions = [u_refs[v][0] for v in range(V)]
    d_acc = [jnp.zeros((ut, Cc), jnp.float32) for _ in range(V)]

    for b in range(block_rays):
        interp, Ws = [], []
        for v in range(V):
            c00 = cell_refs[v][0, b, 0:1]                          # (1,S)
            c10 = cell_refs[v][0, b, 1:2]
            wv = w_refs[v][0, b]                                   # (4,S)
            u = unions[v]
            o00 = (u == c00).astype(jnp.float32)
            o10 = (u == c10).astype(jnp.float32)
            o01 = pltpu.roll(o00, 1, 0)
            o11 = pltpu.roll(o10, 1, 0)
            Wmat = (o00 * wv[0:1] + o01 * wv[1:2]
                    + o10 * wv[2:3] + o11 * wv[3:4])               # (ut,S)
            Ws.append(Wmat)
            interp.append(jax.lax.dot_general(
                rows[v], Wmat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))               # (Cc,S)

        d_interp = _grouped_cosine_bwd(interp, g_ref[0, b], sel, selT,
                                       pairs, chunk_c, Cc, S, V)
        for v in range(V):
            # d_rows[u,c] += sum_s W[u,s] d_interp[c,s]
            d_acc[v] = d_acc[v] + jax.lax.dot_general(
                Ws[v], d_interp[v], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)                # (ut,Cc)

    for v in range(V):
        out_refs[v][0] = d_acc[v]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def block_banded_cosine_scale_trainable(vfeats, grids, kt, ut, n_groups,
                                        pairs, block_rays=8):
    """Differentiable block-banded cosine query for f32 training tables
    (requires patch-aligned rays: 8 consecutive pixels per block —
    nerf.train_ray_patches). The custom backward recomputes the shared
    dilated-union gather + stencil in VMEM, runs the analytic grouped-cosine
    backward, and scatter-adds only the <=ut union rows PER 8-RAY BLOCK into
    the table gradient (~2.4x fewer gathered AND scattered rows than the
    per-ray banded VJP)."""
    return block_banded_cosine_scale(vfeats, grids, kt=kt, ut=ut,
                                     n_groups=n_groups, pairs=pairs,
                                     block_rays=block_rays)


def _block_trainable_fwd(vfeats, grids, kt, ut, n_groups, pairs, block_rays):
    out = block_banded_cosine_scale(vfeats, grids, kt=kt, ut=ut,
                                    n_groups=n_groups, pairs=pairs,
                                    block_rays=block_rays)
    return out, (vfeats, grids)


def _block_trainable_bwd(kt, ut, n_groups, pairs, block_rays, res, g):
    vfeats, grids = res
    _, V, H, W, Cc = vfeats.shape
    chunk_c = Cc // (V - 1)
    _, _, R, S, _ = grids.shape
    pad = (-R) % block_rays
    if pad:
        grids = jnp.pad(grids, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)),
                        mode="edge")
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Rp = R + pad
    NB = Rp // block_rays

    cells_l, w4_l, u_l, rows_l = [], [], [], []
    flat = vfeats[0].reshape(V, H * W, Cc).astype(jnp.float32)
    cell_l = []
    for v in range(V):
        cell, c10, w4 = _cells_weights4(grids[v, 0], H, W)
        cell_l.append(cell)
        cells_l.append(jnp.stack([cell.reshape(NB, block_rays, S),
                                  c10.reshape(NB, block_rays, S)], axis=2))
        w4_l.append(w4.reshape(NB, block_rays, 4, S))
    # raw-cell union, batched across views (same set as run-compressed
    # taps; see fwd path)
    u_all = block_union_cells(jnp.concatenate(cell_l, axis=0),
                              block_rays, ut, H, W)                # [V*NB,ut]
    for v in range(V):
        u = u_all[v * NB:(v + 1) * NB]
        rows = jnp.take_along_axis(
            flat[v], jnp.clip(u, 0, H * W - 1).reshape(NB * ut)[:, None],
            axis=0, mode="promise_in_bounds").reshape(NB, ut, Cc)
        u_l.append(u)
        rows_l.append(rows)

    gT = jnp.moveaxis(g[0].reshape(NB, block_rays, S, n_groups), -1, -2)

    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(
        _block_cosine_bwd_kernel, V=V, S=S, ut=ut, Cc=Cc, chunk_c=chunk_c,
        n_groups=n_groups, pairs=tuple(pairs), block_rays=block_rays)
    in_specs = (
        [pl.BlockSpec((1, ut, Cc), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((1, ut, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((1, block_rays, 2, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((1, block_rays, 4, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((1, block_rays, n_groups, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)]
    )
    d_rows = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((NB, ut, Cc), jnp.float32)
                        for _ in range(V)),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec((1, ut, Cc), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(V)),
        interpret=interpret,
    )(*rows_l, *[u[..., None] for u in u_l], *cells_l, *w4_l, gT)

    d_flat = []
    for v in range(V):
        # mode="drop": the poison tail of each union scatters nowhere
        # (-1 would WRAP under jnp indexing; remap to an OOB positive)
        idx = u_l[v].reshape(NB * ut)
        idx = jnp.where(idx < 0, H * W, idx)
        dv = jnp.zeros((H * W, Cc), jnp.float32).at[idx].add(
            d_rows[v].reshape(NB * ut, Cc), mode="drop")
        d_flat.append(dv)
    d_vfeats = jnp.stack(d_flat).reshape(1, V, H, W, Cc).astype(vfeats.dtype)
    return d_vfeats, jnp.zeros_like(grids)


block_banded_cosine_scale_trainable.defvjp(_block_trainable_fwd,
                                           _block_trainable_bwd)


def block_banded_cosine_scale(vfeats, grids, kt: int, ut: int, n_groups: int,
                              pairs: List[Tuple[int, int]],
                              dequant_scales=None, block_rays: int = 8,
                              blocks_per_step: int = 2,
                              interpret: Optional[bool] = None,
                              lane_major: bool = False):
    """Full per-scale block-banded cosine query.

    vfeats: [1,V,h,w,Cc] UNPACKED per-view tables (int8/bf16/f32; channel
    order = pair-chunk concat, as prepare_sampling_tables builds before 2x2
    packing); grids: [V,1,R,S,2]; kt: per-ray run bucket (banded_kt_host);
    ut: per-block dilated-union bucket (block_union_size + bucket_ut);
    dequant_scales: [1,V,Cc] or None. Returns [1,R,S,G] f32 — or the
    kernel's native lane-major [R,G,S] when lane_major=True (skips the XLA
    transpose; the decoder megakernel consumes this layout directly).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _, V, H, W, Cc = vfeats.shape
    chunk_c = Cc // (V - 1)
    _, _, R, S, _ = grids.shape
    compute_dtype = jnp.float32 if vfeats.dtype == jnp.float32 \
        else jnp.bfloat16

    pad = (-R) % block_rays
    if pad:
        grids = jnp.pad(grids, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)),
                        mode="edge")
    Rp = R + pad
    NB = Rp // block_rays

    cells_l, c10_l, w4_l, u_l, rows_l = [], [], [], [], []
    flat = vfeats[0].reshape(V, H * W, Cc)
    cell_l = []
    for v in range(V):
        cell, c10, w4 = _cells_weights4(grids[v, 0], H, W)
        cell_l.append(cell)
        cells_l.append(jnp.stack([cell.reshape(NB, block_rays, S),
                                  c10.reshape(NB, block_rays, S)], axis=2))
        w4_l.append(w4.reshape(NB, block_rays, 4, S))
    # Union straight from the raw per-sample cells: identical set to the
    # run-compressed taps (run dedup only removes consecutive repeats)
    # but skips the [R,S,kt] one-hot max (~2.6ms/slice on device). All V
    # views share ONE batched union call (same H/W/sentinel per scale):
    # 4 sorts per scale instead of 12, each a single-array sort.
    u_all = block_union_cells(jnp.concatenate(cell_l, axis=0),
                              block_rays, ut, H, W)                # [V*NB,ut]
    for v in range(V):
        u = u_all[v * NB:(v + 1) * NB]                             # [NB,ut]
        rows = jnp.take_along_axis(
            flat[v], jnp.clip(u, 0, H * W - 1).reshape(NB * ut)[:, None],
            axis=0, mode="promise_in_bounds").reshape(NB, ut, Cc)
        u_l.append(u[..., None])                                   # [NB,ut,1]
        rows_l.append(rows)

    if dequant_scales is None:
        scales = jnp.ones((V, Cc), jnp.float32)
    else:
        scales = dequant_scales.reshape(V, Cc).astype(jnp.float32)

    # pad NB to a multiple of blocks_per_step (grid-overhead amortization)
    bps = max(1, int(blocks_per_step))
    nb_pad = (-NB) % bps
    if nb_pad:
        rows_l = [jnp.pad(r, ((0, nb_pad), (0, 0), (0, 0))) for r in rows_l]
        u_l = [jnp.pad(u, ((0, nb_pad), (0, 0), (0, 0)),
                       constant_values=-1) for u in u_l]
        cells_l = [jnp.pad(c, ((0, nb_pad), (0, 0), (0, 0), (0, 0)))
                   for c in cells_l]
        w4_l = [jnp.pad(w, ((0, nb_pad), (0, 0), (0, 0), (0, 0)))
                for w in w4_l]
    NBp = NB + nb_pad

    kernel = functools.partial(
        _block_cosine_kernel, V=V, S=S, ut=ut, Cc=Cc, chunk_c=chunk_c,
        n_groups=n_groups, pairs=tuple(pairs), block_rays=block_rays,
        compute_dtype=compute_dtype, blocks_per_step=bps)

    in_specs = (
        [pl.BlockSpec((bps, ut, Cc), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((bps, ut, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((bps, block_rays, 2, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((bps, block_rays, 4, S), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM) for _ in range(V)]
        + [pl.BlockSpec((V, Cc, 1), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NBp, block_rays, n_groups, S),
                                       jnp.float32),
        grid=(NBp // bps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bps, block_rays, n_groups, S),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*rows_l, *u_l, *cells_l, *w4_l, scales[:, :, None])
    out = out.reshape(NBp * block_rays, n_groups, S)[:R]
    if lane_major:
        return out                                                 # [R,G,S]
    return jnp.swapaxes(out, -1, -2)[None]                         # [1,R,S,G]
